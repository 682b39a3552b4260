#!/usr/bin/env python
"""Diagnose the e2e transfer pipeline: where do the milliseconds go?

BENCH_r03 showed e2e 46x vs a probed link ceiling of 169x (overlap
efficiency 0.275).  Two candidate explanations:
  (a) the ceiling is optimistic: best-of-3 RTT-corrected probes vs the
      sustained rate the pipeline actually gets from the tunnel;
  (b) the pipeline serializes: upload(i+1) waits for download(i) on the
      one Python thread, and neither overlaps device compute.

This probe measures, with the REAL bench buffers (B=2048 staged words in,
packed PCM out):
  1. sustained H2D-only rate (upload the words buffer N times)
  2. sustained D2H-only rate (download the packed result N times)
  3. serial pipeline per-batch time (upload + dispatch + download, one thread)
  4. threaded pipeline per-batch time (uploads on a worker thread)
  5. duplex check: concurrent upload+download wall vs serial sum

Run only when the tunnel is otherwise idle (one client at a time):
    python hack/link_probe.py [--batch 2048] [--iters 6]
"""
import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CACHE = Path(__file__).resolve().parent.parent / ".bench_cache"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", str(CACHE / "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    print(f"device: {jax.devices()[0]}", flush=True)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import bench

    cfg, packets, pcm = bench.make_fixture()
    from saprobe_alac_tpu.ops.batch import JaxBatchDecoder

    dec = JaxBatchDecoder(cfg)
    batch = [packets[i % len(packets)] for i in range(args.batch)]
    audio_s = args.batch * 4096 / 44100.0

    # Warm compile + grab the real staged/download shapes.
    h = dec.decode_async(batch)
    out = np.asarray(h[0])
    words, sizes, _ = dec._stage(batch)
    in_mb = (words.nbytes + sizes.nbytes) / 1e6
    out_mb = out.nbytes / 1e6
    print(f"staged in: {in_mb:.1f} MB; packed out: {out_mb:.1f} MB", flush=True)

    # 1. sustained H2D: distinct buffers (tunnel acks repeated identical
    # uploads early — vary content).
    ups = [np.roll(words, v, axis=0) for v in range(3)]
    jnp.asarray(ups[0]).block_until_ready()
    t0 = time.perf_counter()
    for i in range(args.iters):
        jnp.asarray(ups[i % 3]).block_until_ready()
    h2d_s = (time.perf_counter() - t0) / args.iters
    print(f"1. H2D sustained: {h2d_s*1e3:8.1f} ms/batch = {in_mb/h2d_s:6.1f} MB/s", flush=True)

    # 2. sustained D2H: the tunnel acks repeated identical downloads early
    # (a cached `np.asarray(d)` loop reports ~0 ms), so build DISTINCT
    # device-resident buffers via an on-device roll (no upload cost) and
    # download each once.
    import jax

    d = h[0]
    mk = jax.jit(lambda x, k: jnp.roll(x, k, axis=0))
    downs = [mk(d, k + 1) for k in range(args.iters)]
    jax.block_until_ready(downs)
    np.asarray(mk(d, 97))  # warm one download
    t0 = time.perf_counter()
    for dd in downs:
        np.asarray(dd)
    d2h_s = (time.perf_counter() - t0) / args.iters
    print(f"2. D2H sustained: {d2h_s*1e3:8.1f} ms/batch = {out_mb/d2h_s:6.1f} MB/s", flush=True)

    # 3. serial pipeline (what bench.py's sustained() does today).
    def serial(iters, depth=3):
        inflight = []
        t0 = time.perf_counter()
        for _ in range(iters):
            inflight.append(dec.decode_async(batch))
            if len(inflight) >= depth:
                np.asarray(inflight.pop(0)[0])
        while inflight:
            np.asarray(inflight.pop(0)[0])
        return (time.perf_counter() - t0) / iters

    serial(2)  # warm
    s = serial(args.iters)
    print(f"3. serial pipeline: {s*1e3:8.1f} ms/batch -> {audio_s/s:5.0f}x", flush=True)

    # 4. threaded: dispatch (pack+upload) on a worker; consume in order.
    def threaded(iters, depth=3):
        with ThreadPoolExecutor(1) as ex:
            inflight = []
            t0 = time.perf_counter()
            for _ in range(iters):
                inflight.append(ex.submit(dec.decode_async, batch))
                if len(inflight) >= depth:
                    np.asarray(inflight.pop(0).result()[0])
            while inflight:
                np.asarray(inflight.pop(0).result()[0])
            return (time.perf_counter() - t0) / iters

    threaded(2)
    t = threaded(args.iters)
    print(f"4. threaded pipeline: {t*1e3:8.1f} ms/batch -> {audio_s/t:5.0f}x", flush=True)

    # 5. duplex: N uploads concurrent with N downloads — every buffer
    # distinct (fresh roll offsets) so the tunnel cannot ack from cache.
    dup_n = 3
    dup_ups = [np.roll(words, 7 + v, axis=0) for v in range(dup_n)]
    dup_downs = [mk(d, 200 + k) for k in range(dup_n)]
    jax.block_until_ready(dup_downs)

    def up_all():
        for u in dup_ups:
            jnp.asarray(u).block_until_ready()

    def down_all():
        for dd in dup_downs:
            np.asarray(dd)

    with ThreadPoolExecutor(2) as ex:
        t0 = time.perf_counter()
        f1 = ex.submit(up_all)
        f2 = ex.submit(down_all)
        f1.result()
        f2.result()
        dup = (time.perf_counter() - t0) / dup_n
    print(f"5. duplex up+down: {dup*1e3:8.1f} ms/pair concurrent vs "
          f"{(h2d_s+d2h_s)*1e3:.1f} ms serial sum "
          f"(factor {(h2d_s+d2h_s)/dup:.2f})", flush=True)

    # 6. concurrent-upload scaling: does a second upload stream add
    # bandwidth, or is the link per-connection limited?
    par_ups = [np.roll(words, 31 + v, axis=0) for v in range(4)]

    def up_two(pair):
        for u in pair:
            jnp.asarray(u).block_until_ready()

    with ThreadPoolExecutor(2) as ex:
        t0 = time.perf_counter()
        fs = [ex.submit(up_two, par_ups[:2]), ex.submit(up_two, par_ups[2:])]
        for f in fs:
            f.result()
        par4 = (time.perf_counter() - t0) / 4
    print(f"6. 2-stream H2D: {par4*1e3:8.1f} ms/batch = {in_mb/par4:6.1f} MB/s "
          f"(vs 1-stream {in_mb/h2d_s:.1f})", flush=True)

    # 7. concurrent-download scaling: two halves of one result pulled on two
    # threads (what a split-download consumer would do).
    half = jax.jit(lambda x, k: (jnp.roll(x, k, axis=0)[: x.shape[0] // 2],
                                 jnp.roll(x, k, axis=0)[x.shape[0] // 2 :]))
    pairs = [half(d, 300 + k) for k in range(2)]
    jax.block_until_ready(pairs)
    with ThreadPoolExecutor(2) as ex:
        t0 = time.perf_counter()
        for top, bot in pairs:
            f1 = ex.submit(np.asarray, top)
            f2 = ex.submit(np.asarray, bot)
            f1.result()
            f2.result()
        par_d = (time.perf_counter() - t0) / 2
    print(f"7. 2-stream D2H: {par_d*1e3:8.1f} ms/batch = {out_mb/par_d:6.1f} MB/s "
          f"(vs 1-stream {out_mb/d2h_s:.1f})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
