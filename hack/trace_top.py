#!/usr/bin/env python
"""Per-op device-time attribution from a jax.profiler trace.

Runs the fused decode batch under jax.profiler.trace and digests the
perfetto trace.json.gz into a top-N table of device op durations — the
exact breakdown (pallas kernels, transposes, merges, conds) that the
phase-level harness (hack/profile.py) can't see.

Run (one tunnel client at a time):
    python hack/trace_top.py [--batch 2048] [--top 25]
"""
import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CACHE = Path(__file__).resolve().parent.parent / ".bench_cache"


def digest(trace_dir: str, top: int, iters: int) -> None:
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    ) + glob.glob(os.path.join(trace_dir, "**", "trace.json.gz"), recursive=True)
    if not files:
        print(f"no trace.json.gz under {trace_dir}", flush=True)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)

    # Keep only device-track complete events; aggregate duration by name.
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        dur[ev["name"]] += ev.get("dur", 0)
        cnt[ev["name"]] += 1
    total = sum(dur.values())
    print(f"device total: {total/1e3/iters:.2f} ms/iter over {iters} iters "
          f"({len(dur)} distinct ops)", flush=True)
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {d/1e3/iters:9.3f} ms  x{cnt[name]//iters:<4d} {name[:110]}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--fixture", default="std", choices=["std", "noise", "hires"])
    ap.add_argument("--dir", default="/tmp/jax-trace-decode")
    ap.add_argument("--parse-only", action="store_true",
                    help="just digest an existing trace dir")
    args = ap.parse_args()

    if args.parse_only:
        digest(args.dir, args.top, args.iters)
        return 0

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", str(CACHE / "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import bench
    from saprobe_alac_tpu.ops import lpc as _lpc_mod
    from saprobe_alac_tpu.ops import walk as _walk_mod
    from saprobe_alac_tpu.ops.batch import JaxBatchDecoder, _decode_batch

    make = {"std": bench.make_fixture, "noise": bench.make_noise_fixture,
            "hires": bench.make_hires_fixture}[args.fixture]
    cfg, packets, _ = make()
    batch = [packets[i % len(packets)] for i in range(args.batch)]
    dec = JaxBatchDecoder(cfg)
    words, sizes, swapped = dec._stage(batch)
    jw, js = jnp.asarray(words), jnp.asarray(sizes)

    def run():
        return _decode_batch(
            jw, js, cfg.frame_length, cfg.num_channels, cfg.bit_depth,
            cfg.pb, cfg.mb, cfg.kb, _walk_mod._IMPL, _lpc_mod._IMPL,
            pre_swapped=swapped,
        )

    jax.block_until_ready(run())  # warm/compile outside the trace
    with jax.profiler.trace(args.dir):
        for _ in range(args.iters):
            out = run()
        jax.block_until_ready(out)
    print(f"trace written to {args.dir}", flush=True)
    digest(args.dir, args.top, args.iters)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
