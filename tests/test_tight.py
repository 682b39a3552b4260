"""Tight (concatenated) staging must be bit-identical to padded staging.

The tight path uploads exactly the compressed payload plus per-packet word
offsets and rebuilds the padded (B, W) layout on device with a masked gather
(ops/batch.py _decode_batch_tight); rows must read zeros past their own
packet exactly like the padded path's guard words (reference zero-pad
semantics: bitbuffer.go:28-32).
"""

import numpy as np
import pytest

from conftest import make_config, music_pcm
from saprobe_alac_tpu.codec.matrixing import pack_pcm
from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets
from saprobe_alac_tpu.ops.batch import JaxBatchDecoder


def _encode(cfg, n_packets, seed=3, partial_last=False):
    n = cfg.frame_length * n_packets
    if partial_last:
        n -= cfg.frame_length // 3
    pcm = music_pcm(n, cfg.num_channels, cfg.bit_depth, seed=seed)
    return encode_packets(cfg, EncoderSpec(), pcm), pcm


@pytest.mark.parametrize(
    "depth,channels",
    [(16, 2), (24, 2), (16, 1), (20, 2), (32, 3)],
)
def test_tight_matches_padded(depth, channels):
    cfg = make_config(depth=depth, channels=channels, frame_length=256)
    packets, pcm = _encode(cfg, 9)
    padded = JaxBatchDecoder(cfg)
    tight = JaxBatchDecoder(cfg, tight=True)
    assert tight.decode_packets(packets) == padded.decode_packets(packets)


def test_tight_ragged_sizes_and_partial_frame():
    """Wildly ragged packet sizes (the padding the tight path removes) and a
    short final frame."""
    cfg = make_config(depth=16, channels=2, frame_length=256)
    rng = np.random.default_rng(5)
    # Mix music (small packets) and noise (escape -> near-raw, big packets).
    n = cfg.frame_length * 12 - 100
    pcm = music_pcm(n, 2, 16, seed=8)
    noisy = rng.integers(-32768, 32768, pcm.shape).astype(np.int64)
    mask = rng.random(12) < 0.5
    for i, m in enumerate(mask):
        if m:
            s, e = i * cfg.frame_length, min((i + 1) * cfg.frame_length, n)
            pcm[s:e] = noisy[s:e]
    packets = encode_packets(cfg, EncoderSpec(), pcm)
    sizes = {len(p) for p in packets}
    assert len(sizes) > 3  # genuinely ragged
    tight = JaxBatchDecoder(cfg, tight=True)
    got = b"".join(tight.decode_packets(packets))
    assert got == pack_pcm(pcm, 16)


def test_tight_single_packet():
    cfg = make_config(depth=16, channels=2, frame_length=256)
    packets, pcm = _encode(cfg, 1)
    tight = JaxBatchDecoder(cfg, tight=True)
    assert b"".join(tight.decode_packets(packets)) == pack_pcm(pcm, 16)
