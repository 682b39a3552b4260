#!/usr/bin/env python
"""Micro-benchmark: per-lane contiguous word-window fetch strategies on TPU.

Compares, for (B, W) int32 packet words and per-lane word base wb:
  gather   — jnp.take_along_axis(words, wb[:,None]+arange(NW), axis=1)
  masksum  — NW masked reduces over one (B, W) pass (rel = iota - wb;
             out[k] = sum(where(rel == k, words, 0), axis=1))
  dot      — one-hot (B, W) selector matmul trick, f32 exactness caveat —
             skipped (int32 words exceed f32 mantissa).

Run (one tunnel client at a time):
    python hack/fetch_probe.py [--batch 2048] [--words 704] [--nw 14]
"""
import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CACHE = Path(__file__).resolve().parent.parent / ".bench_cache"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--words", type=int, default=704)
    ap.add_argument("--nw", type=int, default=14)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", str(CACHE / "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    B, W, NW = args.batch, args.words, args.nw
    rng = np.random.default_rng(5)
    words = jnp.asarray(rng.integers(-(2**31), 2**31, (B, W), dtype=np.int64).astype(np.int32))
    wb = jnp.asarray(rng.integers(0, W - NW, (B,), dtype=np.int64).astype(np.int32))

    @jax.jit
    def f_gather(words, wb):
        idx = wb[:, None] + jnp.arange(NW, dtype=jnp.int32)[None, :]
        return jnp.take_along_axis(words, idx, axis=1)

    @jax.jit
    def f_masksum(words, wb):
        rel = jnp.arange(W, dtype=jnp.int32)[None, :] - wb[:, None]  # (B, W)
        cols = [
            jnp.sum(jnp.where(rel == k, words, 0), axis=1) for k in range(NW)
        ]
        return jnp.stack(cols, axis=1)

    @jax.jit
    def f_masksum_t(wt, wb):
        # major-axis variant over the transposed (W, B) layout the walk
        # kernel already keeps resident: sequential accumulation, no lane
        # reduce.
        rel = jnp.arange(W, dtype=jnp.int32)[:, None] - wb[None, :]  # (W, B)
        cols = [
            jnp.sum(jnp.where(rel == k, wt, 0), axis=0) for k in range(NW)
        ]
        return jnp.stack(cols, axis=1)

    ref = np.asarray(f_gather(words, wb))
    REP = 50

    def chain(f):
        # REP dependent calls inside ONE jit: per-dispatch tunnel overhead
        # amortizes away and the chain defeats CSE (wb varies per step).
        @jax.jit
        def g(words, wb):
            def step(i, acc):
                out = f(words, (wb + i) % (W - NW))
                return acc + out[:, 0]
            return jax.lax.fori_loop(0, REP, step, jnp.zeros(B, jnp.int32))
        return g

    words_t = jnp.asarray(np.asarray(words).T.copy())
    cases = [
        ("gather", f_gather, words),
        ("masksum", f_masksum, words),
        ("masksum_t", f_masksum_t, words_t),
    ]
    for name, f, data in cases:
        out = f(data, wb)
        jax.block_until_ready(out)
        assert np.array_equal(np.asarray(out), ref), name
        g = chain(f)
        for it in range(args.iters):
            g(data.at[0, 0].add(it), wb)
        acc = None
        t0 = time.time()
        for it in range(args.iters):
            acc = g(data.at[0, 0].add(it), wb)
        np.asarray(acc[0])
        ms = (time.time() - t0) / args.iters / REP * 1e3
        print(f"{name:9s} {ms:8.3f} ms/call  ({B}x{W} -> {NW} words/lane, x{REP} chained)",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
