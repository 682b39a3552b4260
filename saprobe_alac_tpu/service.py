"""Corpus decode service: many files, batched across the device.

The single-file facade batches packets within one stream; this service goes
one level up for mass-transcode / dataset-ingest workloads: it demuxes many
files, groups their packets by PacketConfig (the device program is compiled
per config), decodes config-groups as large cross-file device batches, and
reassembles per-file PCM.  Packets from different files share batches freely
because every packet is self-contained (SURVEY §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import BinaryIO, Sequence

import numpy as np

from .config import PacketConfig
from .decode import demux_stream
from .decoder import BatchDecoder
from .formats import PCMFormat


@dataclass
class DecodedFile:
    """One corpus entry's decode result."""

    source: str
    format: PCMFormat
    pcm: bytes  # interleaved LE signed PCM

    def samples(self) -> np.ndarray:
        from .utils.pcmconv import pcm_bytes_to_array

        return pcm_bytes_to_array(self.format, self.pcm)


def _open_stream(src) -> tuple[str, BinaryIO]:
    if hasattr(src, "read"):
        return getattr(src, "name", "<stream>"), src
    return str(src), open(src, "rb")


def decode_corpus(
    sources: Sequence,
    backend: str = "jax",
    batch_size: int = 256,
) -> list[DecodedFile]:
    """Decode a corpus of M4A/CAF files with cross-file device batching.

    ``sources``: paths or binary file objects.  Files whose cookies match
    share compiled programs and batches; results keep input order.
    """
    # Demux everything first (host-side, <1% of time).
    entries = []  # (idx, name, config, packets)
    for idx, src in enumerate(sources):
        name, reader = _open_stream(src)
        try:
            config, samples = demux_stream(reader)
            packets = []
            for info in samples:
                reader.seek(info.offset)
                data = reader.read(info.size)
                if len(data) < info.size:
                    raise EOFError(f"{name}: short packet read")
                packets.append(data)
            entries.append((idx, name, config, packets))
        finally:
            if not hasattr(src, "read"):
                reader.close()

    # Group by config; decode each group as cross-file batches.
    results: dict[int, DecodedFile] = {}
    groups: dict[PacketConfig, list[int]] = {}
    for pos, (idx, name, config, packets) in enumerate(entries):
        groups.setdefault(config, []).append(pos)

    for config, members in groups.items():
        dec = BatchDecoder(config, backend=backend)
        flat: list[bytes] = []
        spans = []  # (entry pos, start, count)
        for pos in members:
            _, _, _, packets = entries[pos]
            spans.append((pos, len(flat), len(packets)))
            flat.extend(packets)

        decoded: list[bytes] = []
        for start in range(0, len(flat), batch_size):
            decoded.extend(dec.decode_packets(flat[start : start + batch_size]))

        fmt = PCMFormat(
            sample_rate=config.sample_rate,
            bit_depth=config.bit_depth,
            channels=config.num_channels,
        )
        for pos, start, count in spans:
            idx, name, _, _ = entries[pos]
            results[idx] = DecodedFile(
                source=name, format=fmt, pcm=b"".join(decoded[start : start + count])
            )

    return [results[i] for i in sorted(results)]
