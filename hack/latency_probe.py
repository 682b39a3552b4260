#!/usr/bin/env python
"""Interactive-latency diagnosis: where does a warm small-batch decode go?

The facade's unit of work is one prefetch batch (default 32 packets); the
reference decodes a packet in ~microseconds, so the TPU path's per-call
overhead is the whole interactive story.  This times each stage of a warm
B-packet decode_packets call separately:

    pack    — host packing (numpy)
    upload  — words+sizes to device (2 transfers)
    execute — the jitted _decode_batch call (dispatch + device compute)
    download— packed/err/ns back to host (3 transfers)
    bytes   — host-side per-packet slicing

Run (one tunnel client at a time):
    python hack/latency_probe.py [--batch 32] [--iters 10]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", str(CACHE / "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import make_fixture
    from saprobe_alac_tpu.ops import lpc as _lpc_mod
    from saprobe_alac_tpu.ops import walk as _walk_mod
    from saprobe_alac_tpu.ops.batch import JaxBatchDecoder, _decode_batch

    cfg, packets, _ = make_fixture()
    batch = [packets[i % len(packets)] for i in range(args.batch)]
    dec = JaxBatchDecoder(cfg)

    # Warm every shape involved.
    dec.decode_packets(batch)
    dec.decode_packets(batch)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        dec.decode_packets(batch)
    total = (time.perf_counter() - t0) / args.iters
    print(f"warm decode_packets(B={args.batch}): {total*1e3:.1f} ms", flush=True)

    # Stage-by-stage.
    stages = {"pack": 0.0, "upload": 0.0, "execute": 0.0, "download": 0.0, "bytes": 0.0}
    for _ in range(args.iters):
        t = time.perf_counter()
        words, sizes, swapped = dec._stage(batch)
        stages["pack"] += time.perf_counter() - t

        t = time.perf_counter()
        jw = jnp.asarray(words)
        js = jnp.asarray(sizes)
        jax.block_until_ready([jw, js])
        stages["upload"] += time.perf_counter() - t

        t = time.perf_counter()
        handle = _decode_batch(
            jw, js, cfg.frame_length, cfg.num_channels, cfg.bit_depth,
            cfg.pb, cfg.mb, cfg.kb, _walk_mod._IMPL, _lpc_mod._IMPL,
            pre_swapped=swapped,
        )
        jax.block_until_ready(handle)
        stages["execute"] += time.perf_counter() - t

        t = time.perf_counter()
        packed = np.asarray(handle[0])
        err = np.asarray(handle[1])
        ns = np.asarray(handle[2])
        stages["download"] += time.perf_counter() - t

        t = time.perf_counter()
        out = [dec._to_bytes(packed[i], int(ns[i])) for i in range(len(batch))]
        assert len(out) == len(batch) and not err[: len(batch)].any()
        stages["bytes"] += time.perf_counter() - t

    for k, v in stages.items():
        print(f"  {k:9s} {v/args.iters*1e3:8.2f} ms", flush=True)
    ssum = sum(stages.values()) / args.iters
    print(f"  {'sum':9s} {ssum*1e3:8.2f} ms (vs whole call {total*1e3:.1f})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
