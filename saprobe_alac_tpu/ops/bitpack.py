"""Host-side packet batching: byte packets -> (B, W) big-endian word array.

Packets are padded to a common word width with zeros (the TPU analogue of the
reference BitBuffer's 4-byte zero pad, bitbuffer.go:28-32) plus guard words so
clamped out-of-range reads always see zeros.
"""

from __future__ import annotations

import numpy as np

#: Extra zero words past the longest packet so any clamped read lands on zeros.
GUARD_WORDS = 2


def pack_packets(packets: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pack packets into (words, size_bits).

    words: (B, W) uint32, big-endian bit order within each word (bit 31 of
    word 0 is the first bit of the packet).  size_bits: (B,) int32.
    """
    batch = len(packets)
    max_len = max((len(p) for p in packets), default=0)
    width_bytes = ((max_len + 3) // 4 + GUARD_WORDS) * 4
    buf = np.zeros((batch, width_bytes), dtype=np.uint8)
    sizes = np.zeros(batch, dtype=np.int32)
    for i, p in enumerate(packets):
        buf[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
        sizes[i] = len(p) * 8
    words = buf.view(">u4").astype(np.uint32).view(np.int32)
    return words, sizes
