"""Differential test for the element kernel's in-kernel parse.

The fused Pallas element kernel (walk_kernel._element_kernel) parses the
3-bit tag, element headers and predictor coefficients on its resident bit
window; the XLA fallback path keeps the gathered `_parse_elem`.  Both must
produce identical WalkResult metadata — not just identical PCM — so field
mismatches that happen not to change a particular decode (roles, cursors,
shift bases) cannot hide.

Parity: decoder.go:210-265 (SCE), :348-460 (CPE), :538-574 (DSE/FIL).
"""

import numpy as np
import pytest

from conftest import make_config, music_pcm

from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets


def _walk_both(cfg, pkts):
    import jax.numpy as jnp

    from saprobe_alac_tpu.ops.bitpack import pack_packets
    from saprobe_alac_tpu.ops.walk import _walk_batch

    words_np, sizes_np = pack_packets(pkts)
    words = jnp.asarray(words_np)
    sizes = jnp.asarray(sizes_np)
    out = {}
    for impl in ("xla", "pallas_interpret"):
        out[impl] = _walk_batch(
            words, sizes, cfg.frame_length, cfg.num_channels, cfg.bit_depth,
            cfg.pb, cfg.mb, cfg.kb, impl,
        )
    return out["xla"], out["pallas_interpret"], words


def _assert_walkresults_equal(a, b, words=None, cfg=None):
    for name in a._fields:
        if name == "res":
            continue
        va, vb = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        assert va.shape == vb.shape, name
        if not np.array_equal(va, vb):
            idx = np.argwhere(va != vb)[:5]
            raise AssertionError(f"{name} differs at {idx.tolist()}")

    # res: the dense kernel decodes escape lanes IN-kernel (raw walk rows);
    # the XLA parse defers them to epilogue.extract_escape.  Align by
    # running the gather-based extraction on the XLA result — this makes
    # the comparison a direct differential of the in-kernel raw reader
    # against the XLA bit gather.  Escape rows at t >= ns are compared
    # loosely (kernel emits 0 for idle lanes; the gather reads whatever
    # bits follow the region — both are dead rows masked by the ns trim).
    from saprobe_alac_tpu.ops.epilogue import extract_escape

    F, C = cfg.frame_length, cfg.num_channels
    res_a = np.asarray(
        extract_escape(words, a.res, a.esc, a.esc_base, a.esc_cb, a.role, F, C)
    )
    res_b = np.asarray(b.res)
    valid = np.arange(F)[:, None, None] < np.asarray(a.ns)[None, None, :]
    escm = (np.asarray(a.esc)[:, :C].T == 1)[None]  # (1, C, B)
    live = valid | ~escm
    if not np.array_equal(res_a * live, res_b * live):
        idx = np.argwhere((res_a != res_b) & live)[:5]
        raise AssertionError(f"res differs at {idx.tolist()}")


@pytest.mark.parametrize(
    "depth,channels",
    [(16, 1), (16, 2), (24, 2), (20, 3), (32, 2), (16, 6)],
)
def test_parse_metadata_matches_xla(depth, channels):
    cfg = make_config(depth=depth, channels=channels, frame_length=256)
    pcm = music_pcm(256 * 2 + 57, channels, depth, seed=depth + channels)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)  # includes partial final
    a, b, words = _walk_both(cfg, pkts)
    _assert_walkresults_equal(a, b, words, cfg)


def test_parse_metadata_escape_and_noise():
    # Near-white noise drives escape codewords and (at low depths) whole
    # escape elements; both parses must agree on every metadata field.
    cfg = make_config(depth=16, channels=2, frame_length=256)
    pcm = music_pcm(256 * 3, 2, 16, seed=3, tonality=0.02)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    a, b, words = _walk_both(cfg, pkts)
    _assert_walkresults_equal(a, b, words, cfg)


def test_parse_metadata_corrupt_packets():
    # Truncated/corrupted packets must produce identical error codes and
    # identical (garbage-tolerant) metadata on both parse paths.
    cfg = make_config(depth=16, channels=2, frame_length=256)
    pcm = music_pcm(256 * 4, 2, 16, seed=5)
    pkts = [bytearray(p) for p in encode_packets(cfg, EncoderSpec(), pcm)]
    rng = np.random.default_rng(7)
    pkts[0] = pkts[0][: max(2, len(pkts[0]) // 4)]  # truncation
    for i in range(0, min(len(pkts[1]), 40), 3):  # header/coef bit flips
        pkts[1][i] ^= 1 << int(rng.integers(0, 8))
    pkts[2] = bytearray(b"\xff" * len(pkts[2]))  # all-ones garbage
    a, b, words = _walk_both(cfg, [bytes(p) for p in pkts])
    _assert_walkresults_equal(a, b, words, cfg)
