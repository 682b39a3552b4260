"""Differential tests for the dense-consumption Pallas entropy-ENCODE kernel
(ops/encode_kernel.py) in interpreter mode, against the XLA lockstep encoder
(ops/encode_device._entropy_encode) bit for bit, plus integration through
encode_packets_device.

The kernel's dense input schedule, zero-run interleave, escape suffixes and
uint32-wrap mean updates mirror golomb.go:112-253 in reverse; hardware
bit-exactness at production shapes (F=4096, LB=1024) is pinned by the bench
encode row and hack/hw scripts — these tests pin the semantics on CPU.
"""
import numpy as np
import jax.numpy as jnp

from saprobe_alac_tpu.ops.encode_device import _entropy_encode, _zero_run_table
from saprobe_alac_tpu.ops.encode_kernel import dense_encode_pallas


def _compare(res_np, ns_np, pb, cb, mb, kb, F, LB=128):
    B = res_np.shape[0]
    res = jnp.asarray(res_np, jnp.int32)
    ns = jnp.asarray(ns_np, jnp.int32)
    zrun = _zero_run_table(res, ns)
    W = (F * (9 + max(kb, cb) + 26) + 256) // 32 + 8

    wx, lenx = _entropy_encode(
        jnp.zeros((B, W), jnp.int32), jnp.zeros(B, jnp.int32), res, zrun,
        jnp.ones(B, bool), jnp.full(B, pb, jnp.int32),
        jnp.full(B, cb, jnp.int32), ns, mb, kb,
    )
    wx, lenx = np.asarray(wx), np.asarray(lenx)

    n = jnp.where(res >= 0, 2 * res, -2 * res - 1)
    zr1 = jnp.concatenate(
        [jnp.minimum(zrun[:, 1:], 65535), jnp.zeros((B, 1), jnp.int32)],
        axis=1,
    )
    wk, bk, ovf = dense_encode_pallas(
        n.T, zr1.T, jnp.ones(B, bool), jnp.full(B, pb, jnp.int32),
        jnp.full(B, cb, jnp.int32), ns, jnp.full(B, mb, jnp.int32),
        kb=kb, F=F, W_out=W, LB=LB, interpret=True,
    )
    wk, bk, ovf = np.asarray(wk), np.asarray(bk), np.asarray(ovf)

    assert not ovf.any(), np.where(ovf)[0]
    assert (bk == lenx).all(), (bk[bk != lenx][:4], lenx[bk != lenx][:4])
    for b in range(B):
        nw = (int(lenx[b]) + 31) // 32
        tb = int(lenx[b]) & 31
        got, want = wk[b, :nw].copy(), wx[b, :nw].copy()
        if tb and nw:
            m = np.int32(-1) << (32 - tb)
            got[-1] &= m
            want[-1] &= m
        assert (got == want).all(), (b, np.where(got != want)[0][:3])


def test_kernel_matches_xla_mixed_regimes():
    """One batch, four content regimes in different lane ranges: small
    residuals (adaptive-k path), dense zero runs (golomb.go:223-246),
    all-zero (65535-run + zmode), and large values (escape prefix +
    cb-wide suffix) — plus partial frames."""
    rng = np.random.default_rng(42)
    F, B = 64, 128
    res = np.zeros((B, F), int)
    res[:32] = rng.integers(-50, 50, (32, F))
    runs = rng.integers(-30, 30, (32, F))
    res[32:64] = np.where(rng.random((32, F)) < 0.7, 0, runs)
    # lanes 64..95 stay all-zero
    res[96:] = rng.integers(-(2**15), 2**15, (32, F))
    ns = np.full(B, F)
    ns[10] = 17
    ns[40] = 3
    ns[70] = 0
    _compare(res, ns, 40, 17, 10, 14, F)


def test_kernel_matches_xla_tunings():
    """Alternate entropy tunings: large pb/mb, kb at the ladder limit edge,
    and the kb=1 corner (k==1 emits a 0-width suffix for r==0)."""
    rng = np.random.default_rng(1)
    F, B = 32, 128
    res = rng.integers(-500, 500, (B, F))
    _compare(res, np.full(B, F), 10, 25, 40, 10, F)
    res2 = rng.integers(-3, 3, (B, F))
    _compare(res2, np.full(B, F), 40, 17, 10, 1, F)


def test_device_encode_kernel_integration():
    """encode_packets_device with the interpret kernel: bit-identical to the
    host encoder with pinned coefficients, and lossless end to end."""
    from conftest import make_config
    from saprobe_alac_tpu.codec import decode_packet as oracle
    from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets
    from saprobe_alac_tpu.encoder.encode import ChannelSpec
    from saprobe_alac_tpu.ops import encode_device as ed

    old = ed._IMPL
    ed._IMPL = "pallas_interpret"
    try:
        cfg = make_config(depth=16, channels=2, frame_length=64)
        rng = np.random.default_rng(5)
        pcm = rng.integers(-3000, 3000, (64 * 2, 2)).astype(np.int64)
        pcms = [pcm[:64], pcm[64:]]
        spec = EncoderSpec(
            channel=ChannelSpec(order=4, den_shift=9, coefs=[120, -60, 30, -10])
        )
        want = encode_packets(cfg, spec, pcm)
        got = ed.encode_packets_device(cfg, spec, pcms)
        assert list(got) == list(want)
        for i, p in enumerate(got):
            pcm_out, _ns = oracle(cfg, p)
            assert pcm_out == pcm[i * 64 : (i + 1) * 64].astype("<i2").tobytes()
    finally:
        ed._IMPL = old
