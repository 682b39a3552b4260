#!/usr/bin/env python
"""Hardware A/B probe for the dense-emission walk kernel.

Times dense_entropy_pallas on the real TPU over synthetic pure-entropy
streams (ag_encode output, no element framing) with pieces of the kernel
compiled out via the `probe` hook, attributing the per-row cost:

    base     — the shipped kernel
    nofetch  — fixed window words instead of the 4 select trees (WRONG
               output; timing only)
    nozrun   — zero-run secondary decode removed (wrong on zero runs)
    norefill — window refresh disabled (wrong once past the first window)
    nostore / nodma — staging store / HBM flush removed

Run (one tunnel client at a time):
    python hack/walk_probe.py [--batch 2048] [--frame 4096]
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
    ap.add_argument("--frame", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--lb", type=int, default=0, help="force lane-block size")
    ap.add_argument("--probes", default="base,nofetch,nozrun,norefill,nostore,nodma,base2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", str(CACHE / "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    assert jax.default_backend() == "tpu", jax.default_backend()

    from saprobe_alac_tpu.codec.golomb import AGParams
    from saprobe_alac_tpu.encoder.encode import ag_encode
    from saprobe_alac_tpu.ops.bitpack import pack_packets
    from saprobe_alac_tpu.ops.walk_kernel import dense_entropy_pallas

    F, B = args.frame, args.batch
    rng = np.random.default_rng(11)

    # Music-like residual magnitudes (two-sided geometric, mean |r| ~ 300
    # matches the bench fixture's ~25-30 bits/row entropy rate).
    streams = []
    all_res = []
    n_unique = 32
    for i in range(n_unique):
        mag = rng.geometric(1 / 300.0, size=F)
        res = [int(m) if s else -int(m) for m, s in zip(mag, rng.integers(0, 2, F))]
        all_res.append(res)
        ag = AGParams.standard(mb=10, pb=40, kb=14, fw=F, sw=F, max_run=255)
        w = ag_encode(ag, res, 17)
        assert w is not None
        w.byte_align()
        streams.append(w.getvalue())

    pkts = [streams[i % n_unique] for i in range(B)]
    words_np, sizes_np = pack_packets(pkts)
    words_t = jnp.asarray(words_np.T)
    zeros = jnp.zeros(B, jnp.int32)
    bitpos = zeros
    act = jnp.ones(B, jnp.int32)
    pb_local = zeros + 40
    max_size = zeros + 17
    ns = zeros + F
    size_bits = jnp.asarray(sizes_np)
    mb = zeros + 10

    LB = args.lb or (1024 if B % 1024 == 0 else 512)
    jax.block_until_ready([words_t, size_bits])

    results = {}
    for probe in args.probes.split(","):
        p = "" if probe in ("base", "base2") else probe
        t0 = time.time()
        rows, bp, err = dense_entropy_pallas(
            words_t, bitpos, act, pb_local, max_size, ns, size_bits, mb,
            kb=14, F=F, LB=LB, probe=p,
        )
        jax.block_until_ready(rows)
        compile_s = time.time() - t0
        # Pre-warm every varied-buffer dispatch: each distinct python `it`
        # compiles its own .add through jit, and through the tunnel those
        # compiles take tens of seconds — they must not land in the timed
        # loop (single-variant runs have no earlier variant to warm them).
        for it in range(args.iters):
            rows, bp, err = dense_entropy_pallas(
                words_t.at[-1].add(it), bitpos, act, pb_local, max_size, ns,
                size_bits, mb, kb=14, F=F, LB=LB, probe=p,
            )
        np.asarray(bp[0])
        t0 = time.time()
        for it in range(args.iters):
            # Fresh input buffer each iteration (the tunnel's
            # block_until_ready can report ready early for repeated
            # identical dispatches); one forced scalar D2H at the end —
            # in-order device execution makes total = sum of kernels + RTT.
            # (vary only the trailing guard row: fresh buffer, same decode)
            rows, bp, err = dense_entropy_pallas(
                words_t.at[-1].add(it), bitpos, act, pb_local, max_size, ns,
                size_bits, mb, kb=14, F=F, LB=LB, probe=p,
            )
        np.asarray(bp[0])
        ms = (time.time() - t0) / args.iters * 1e3
        results[probe] = ms
        extra = ""
        if probe == "base" or probe.startswith("emit"):  # emitN is bit-exact
            nerr = int(np.asarray((err != 0).sum()))
            rows_np = np.asarray(rows)
            ok = all(
                rows_np[:F, i].tolist() == all_res[i % n_unique] for i in range(0, B, 97)
            )
            extra = f", err lanes {nerr}, rows {'OK' if ok else 'MISMATCH'}"
        print(f"{probe:9s} {ms:8.2f} ms/batch  (compile {compile_s:.1f}s{extra})",
              flush=True)

    base = results.get("base")
    if base:
        for k, v in results.items():
            if k != "base":
                print(f"  {k:9s} saves {base - v:7.2f} ms ({(base-v)/base*100:4.1f}%)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
