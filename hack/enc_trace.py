"""Stage-level timing of the device encode path on hardware.

Times each component of encode_walk at the bench row's shape (B=1024
stereo F=4096 16-bit CPE, order 6, fit, auto-escape) so optimization is
trace-directed, mirroring hack/walk_probe.py for the decode side:

  full      encode_walk end to end (the bench's enc_fn)
  lpc       _lpc_forward_batch, one channel (L=1024 lanes)
  fit       fit_coefs-equivalent Levinson-Durbin, one channel
  entropy   _entropy_body (Pallas kernel path), one channel
  escape    the verbatim-variant _emit_many (B, 2F) 16-bit fields
  blit      the element blit _emit_many (B, W) width-32

Usage: python hack/enc_trace.py [B] [F]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from saprobe_alac_tpu.config import PacketConfig
from saprobe_alac_tpu.ops.encode_device import (
    _emit_many,
    _entropy_body,
    _lpc_forward_batch,
    encode_walk,
)

I32 = jnp.int32


_csum = jax.jit(
    lambda t: sum(jnp.sum(x.astype(jnp.int32)) for x in jax.tree.leaves(t))
)


def _force(out):
    """Force execution through the tunnel: reduce on-device, fetch scalar
    (block_until_ready alone does not sync on the axon backend — same
    pattern as bench.py's ecsum)."""
    return np.asarray(_csum(out))


def timeit(name, fn, *args, iters=4):
    _force(fn(*args))  # warm/compile
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn(*args)
    _force(last)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:10s} {dt*1e3:9.1f} ms")
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    cfg = PacketConfig(
        frame_length=F, bit_depth=16, num_channels=2, pb=40, mb=10, kb=14,
        max_run=255, max_frame_bytes=0, avg_bit_rate=0, sample_rate=44100,
    )
    rng = np.random.default_rng(7)
    # Correlated-ish content: smoothed noise so residuals are plausible.
    raw = rng.integers(-(1 << 14), 1 << 14, size=(B, 2, F + 8), dtype=np.int32)
    pcm = (np.cumsum(raw, axis=2)[:, :, 8:] >> 4).astype(np.int32)
    pcm = np.clip(pcm, -(1 << 15), (1 << 15) - 1)
    planes = jnp.asarray(pcm)
    ns = jnp.full(B, F, I32)

    coefs_arr = np.zeros((1, 32), np.int32)
    coefs_arr[0, :6] = [160, 80, 40, 20, 10, 5]
    elem_specs = ((6, 9, (4,), 0, True),)

    def enc_fn(p, n_):
        return encode_walk(
            p, n_, jnp.full(B, 1, I32), jnp.asarray(coefs_arr),
            F, 2, 16, cfg.pb, cfg.mb, cfg.kb,
            elem_specs, 1, 0, False, False, True, enc_impl="pallas",
        )

    t_full = timeit("full", enc_fn, planes, ns, iters=2)

    ch = planes[:, 0]
    order = jnp.full(B, 6, I32)
    den = jnp.full(B, 9, I32)
    cb = jnp.full(B, 17, I32)
    coefs = jnp.broadcast_to(jnp.asarray(coefs_arr[0])[None], (B, 32)).astype(I32)

    lpc = jax.jit(lambda x, c: _lpc_forward_batch(x, order, den, cb, ns, c, F))
    t_lpc = timeit("lpc(1ch)", lpc, ch, coefs)

    def fit(d):
        idxF = jnp.arange(F, dtype=I32)[None, :]
        valid = idxF < ns[:, None]
        x = jnp.where(valid, d, 0).astype(jnp.float32) * (1.0 / 32768.0)
        mean = jnp.sum(x, 1, keepdims=True) / jnp.maximum(ns[:, None], 1).astype(jnp.float32)
        x = jnp.where(valid, x - mean, 0.0)
        R = [jnp.sum(x * x, 1) + 1e-30]
        for k in range(1, 7):
            R.append(jnp.sum(x[:, k:] * x[:, : F - k], 1))
        return jnp.stack(R, 1)

    t_fit = timeit("fit(1ch)", jax.jit(fit), ch)

    res = np.asarray(lpc(ch, coefs))
    resj = jnp.asarray(res)
    Wch = ((F * (9 + 17 + 26) + 256) // 32) + 4
    ent = jax.jit(
        lambda r: _entropy_body(
            r, ns, jnp.full(B, 40, I32), 17, cfg.mb, cfg.kb, F, Wch, "pallas"
        )
    )
    t_ent = timeit("entropy", ent, resj)

    We = ((F * 2 * 16 + 256) // 32) + 4
    raw2 = jnp.asarray(
        np.stack([pcm[:, 0], pcm[:, 1]], axis=2).reshape(B, 2 * F)
    )
    esc = jax.jit(
        lambda r: _emit_many(jnp.zeros((B, We), I32), jnp.zeros(B, I32) + 64, r, 16)[0]
    )
    t_esc = timeit("escape", esc, raw2)

    Wp = We + 64
    buf = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, size=(B, We), dtype=np.int32))
    base = jnp.asarray(rng.integers(0, 1024, size=B, dtype=np.int32))
    blit = jax.jit(
        lambda b, p: _emit_many(jnp.zeros((B, Wp), I32), p, b, 32)[0]
    )
    t_blit = timeit("blit", blit, buf, base)

    acc = 2 * (t_lpc + t_fit + t_ent) + t_esc + 3 * t_blit
    print(f"{'sum~':10s} {acc*1e3:9.1f} ms  (2x lpc/fit/ent + esc + 3 blits)")
    print(f"{'unacct':10s} {(t_full-acc)*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
