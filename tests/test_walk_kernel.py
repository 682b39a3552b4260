"""Differential tests for the Pallas dense-emission entropy kernel.

Runs the kernel in interpreter mode on CPU (SAPROBE_WALK_IMPL=pallas_interpret)
against the scalar oracle, covering the regimes that stress its schedule:
zero-runs (dense zero draining), escapes (worst-case window budget), partial
frames, multichannel layouts, and corrupt-packet error lanes.  Real-hardware
bit-exactness is additionally gated by bench.py's correctness check.

Parity: golomb.go:112-253, bitbuffer.go:28-32.
"""

import numpy as np
import pytest

from conftest import make_config, music_pcm

from saprobe_alac_tpu.codec import decode_packet as oracle
from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets


@pytest.fixture(scope="module")
def dense_interpret(monkeypatch_module=None):
    """Force the dense kernel (interpreter mode) for this module."""
    import saprobe_alac_tpu.ops.walk as walk

    old = walk._IMPL
    walk._IMPL = "pallas_interpret"
    yield
    walk._IMPL = old


def _roundtrip(cfg, pcm, corrupt=None):
    from saprobe_alac_tpu.ops.batch import JaxBatchDecoder

    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    if corrupt is not None:
        pkts = list(pkts)
        pkts[corrupt] = pkts[corrupt][: max(2, len(pkts[corrupt]) // 3)]
    dec = JaxBatchDecoder(cfg)
    got = dec.decode_packets(pkts)
    want = [oracle(cfg, p)[0] for p in pkts]
    assert got == want


def test_dense_music(dense_interpret):
    _roundtrip(make_config(frame_length=128), music_pcm(128 * 8 - 5, 2, 16, seed=3))


def test_dense_zero_runs(dense_interpret):
    pcm = np.zeros((128 * 4, 2), np.int64)
    pcm[37, 0] = 9
    pcm[300, 1] = -5
    _roundtrip(make_config(frame_length=128), pcm)


def test_dense_noise_escape(dense_interpret):
    rng = np.random.default_rng(1)
    pcm = rng.integers(-30000, 30000, (128 * 3, 2)).astype(np.int64)
    _roundtrip(make_config(frame_length=128), pcm)


@pytest.mark.parametrize(
    "depth,channels",
    [(24, 2), (16, 1), (16, 6)],
    ids=["24bit", "mono", "5.1"],
)
def test_dense_config_matrix(dense_interpret, depth, channels):
    F = 64 if channels > 2 else 128
    cfg = make_config(depth=depth, channels=channels, frame_length=F)
    _roundtrip(cfg, music_pcm(F * 2, channels, depth, seed=depth + channels))


def test_dense_partial_final_packet(dense_interpret):
    _roundtrip(make_config(frame_length=128), music_pcm(128 * 2 + 31, 2, 16, seed=7))


def test_dense_quiet_mixed_runs(dense_interpret):
    pcm = (music_pcm(128 * 4, 2, 16, seed=8) * 0.002).astype(np.int64)
    _roundtrip(make_config(frame_length=128), pcm)


def _roundtrip_spec(cfg, pcm, spec):
    from saprobe_alac_tpu.ops.batch import JaxBatchDecoder

    pkts = encode_packets(cfg, spec, pcm)
    got = JaxBatchDecoder(cfg).decode_packets(pkts)
    want = [oracle(cfg, p)[0] for p in pkts]
    assert got == want


@pytest.mark.parametrize(
    "depth,channels",
    [(16, 1), (16, 2), (24, 2), (32, 2), (20, 1), (16, 6), (24, 1), (32, 1)],
    ids=["sce16", "cpe16", "cpe24", "cpe32", "sce20", "5.1", "sce24", "sce32"],
)
def test_dense_forced_escape(dense_interpret, depth, channels):
    """In-kernel raw escape walk (decoder.go:326-345/507-535): forced
    escape elements across depths/layouts, incl. the CPE 32-bit case
    (stride 2*cb = 64 bits/row, the raw window-budget worst case) and the
    interleaved U/V pass-2 rewind."""
    F = 64 if channels > 2 else 128
    cfg = make_config(depth=depth, channels=channels, frame_length=F)
    _roundtrip_spec(
        cfg,
        music_pcm(F * 3, channels, depth, seed=50 + depth + channels),
        EncoderSpec(escape=True),
    )


@pytest.mark.parametrize(
    "depth,channels,bsf",
    [(24, 2, 1), (32, 2, 2), (24, 1, 1), (32, 1, 1)],
    ids=["cpe24bs1", "cpe32bs2", "sce24bs1", "sce32bs1"],
)
def test_dense_shift_raw_reader(dense_interpret, depth, channels, bsf):
    """Shift-buffer extraction through the Pallas raw reader (unsigned
    fixed-stride reads; decoder.go:314-321, 492-502) instead of the XLA
    vread gather — incl. a partial final frame."""
    cfg = make_config(depth=depth, channels=channels, frame_length=128)
    _roundtrip_spec(
        cfg,
        music_pcm(128 * 2 + 41, channels, depth, seed=70 + depth + bsf),
        EncoderSpec(bytes_shifted=bsf),
    )


def test_dense_escape_long_frame_rewind(dense_interpret):
    """F=1024 CPE escape: the raw region (1024*2*17 = 34816 bits) spans
    multiple 8192-bit superblocks, so the pass-2 rewind to esc_base + cb
    lands BELOW the resident superblock pair — exercising the backward
    need_l1 arm (an F=128 region fits inside one pair and never does)."""
    cfg = make_config(frame_length=1024)
    _roundtrip_spec(
        cfg, music_pcm(1024 * 2, 2, 16, seed=59), EncoderSpec(escape=True)
    )


def test_dense_escape_partial_frame(dense_interpret):
    cfg = make_config(frame_length=128)
    _roundtrip_spec(
        cfg, music_pcm(128 * 2 + 19, 2, 16, seed=57), EncoderSpec(escape=True)
    )


def test_dense_mixed_escape_compressed_batch(dense_interpret):
    """Escape and compressed lanes coexisting in one slot: raw lanes ride
    the same group loop rows as the Golomb lanes."""
    from saprobe_alac_tpu.ops.batch import JaxBatchDecoder

    cfg = make_config(frame_length=128)
    pcm = music_pcm(128 * 2, 2, 16, seed=58)
    pk_esc = encode_packets(cfg, EncoderSpec(escape=True), pcm)
    pk_cmp = encode_packets(cfg, EncoderSpec(), pcm)
    pkts = [p for pair in zip(pk_esc, pk_cmp) for p in pair]
    got = JaxBatchDecoder(cfg).decode_packets(pkts)
    want = [oracle(cfg, p)[0] for p in pkts]
    assert got == want


def test_dense_corrupt_packet_errors(dense_interpret):
    from saprobe_alac_tpu.errors import DecodeError

    cfg = make_config(frame_length=128)
    with pytest.raises((DecodeError, EOFError, IndexError)):
        _roundtrip(cfg, music_pcm(128 * 4, 2, 16, seed=9), corrupt=2)


def test_impl_flip_retraces_same_shape():
    """Regression (advisor round 2): flipping walk._IMPL must retrace even for
    a batch shape already compiled under another impl — the selection is a
    static jit argument, so the differential gate cannot pass vacuously off a
    cached executable that never routed through the kernel."""
    import jax

    import saprobe_alac_tpu.ops.walk as walk
    import saprobe_alac_tpu.ops.walk_kernel as wk
    from saprobe_alac_tpu.ops.batch import JaxBatchDecoder

    cfg = make_config(frame_length=128)
    pcm = music_pcm(128 * 2, 2, 16, seed=11)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)

    jax.clear_caches()
    old = walk._IMPL
    fired = []
    orig = wk.dense_element_pallas

    def spy(*a, **k):
        fired.append(1)
        return orig(*a, **k)

    try:
        walk._IMPL = "xla"
        want = JaxBatchDecoder(cfg).decode_packets(pkts)  # caches the shape
        wk.dense_element_pallas = spy
        walk._IMPL = "pallas_interpret"
        got = JaxBatchDecoder(cfg).decode_packets(pkts)  # same shape: must retrace
    finally:
        walk._IMPL = old
        wk.dense_element_pallas = orig
    assert fired, "kernel was not invoked after flipping _IMPL (stale jit cache)"
    assert got == want
