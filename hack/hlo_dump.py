#!/usr/bin/env python
"""Dump the optimized HLO text of the bench-shaped fused decode batch.

Compiles (persistent-cache-fast) the same _decode_batch the bench and
hack/trace_top.py run, and writes compiled.as_text() to a file so trace op
names (cond.N / fusion.N / copy.N) can be attributed to source ops.

Run (one tunnel client at a time):
    python hack/hlo_dump.py [--batch 2048] [--out /tmp/decode_batch.hlo]
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CACHE = Path(__file__).resolve().parent.parent / ".bench_cache"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--fixture", default="std", choices=["std", "noise", "hires"])
    ap.add_argument("--out", default="/tmp/decode_batch.hlo")
    args = ap.parse_args()

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

    lowered = _decode_batch.lower(
        jw, js, cfg.frame_length, cfg.num_channels, cfg.bit_depth,
        cfg.pb, cfg.mb, cfg.kb, _walk_mod._IMPL, _lpc_mod._IMPL,
        pre_swapped=swapped,
    )
    compiled = lowered.compile()
    text = compiled.as_text()
    Path(args.out).write_text(text)
    print(f"{len(text)} chars -> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
