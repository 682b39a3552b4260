#!/usr/bin/env python
"""Decode an arbitrary .m4a and report per-backend timing.

Analogue of the reference's BENCH_FILE runner (tests/benchmark_test.go:155-259):
    python hack/bench_file.py file.m4a [--backends native,scalar,jax] [--iters 3]
"""
import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--backends", default="native,jax")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from saprobe_alac_tpu import new_decoder

    data = open(args.file, "rb").read()
    ref = None
    for backend in args.backends.split(","):
        times = []
        for it in range(args.iters):
            dec = new_decoder(io.BytesIO(data), backend=backend, batch_size=args.batch)
            t0 = time.perf_counter()
            pcm = dec.read()
            times.append(time.perf_counter() - t0)
        dur = dec.duration()
        fmt = dec.format()
        if ref is None:
            ref = pcm
            print(f"{fmt.sample_rate} Hz {fmt.bit_depth}-bit {fmt.channels}ch, "
                  f"{dur:.1f}s, {len(pcm)} PCM bytes")
        else:
            print(f"  [{backend}] bit-exact vs first backend: {pcm == ref}")
        best = min(times)
        print(f"  [{backend}] best {best*1e3:.1f} ms -> {dur/best:.0f}x realtime")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
