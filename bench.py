#!/usr/bin/env python
"""Benchmark: aggregate ALAC decode throughput per TPU chip.

Headline config (BASELINE.json config 1/5): 44.1 kHz / 16-bit stereo,
frame length 4096, music-like content, full entropy->predict->unmix pipeline
on device, host byte packing included.

Prints ONE JSON line:
  {"metric": "decode_x_realtime_44k16_stereo", "value": N, "unit": "x_realtime",
   "vs_baseline": N}

vs_baseline divides by 2630x — the reference's strongest comparable number
(44.1k/16 300s synthetic, single core Apple-silicon; docs/QA.md:124 /
BASELINE.md).  The repo target is >= 500x per chip.

Correctness is asserted (bit-exact vs the encoded source) before timing.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

CACHE = Path(__file__).parent / ".bench_cache"
SECONDS = 4.0
RATE = 44100
FRAME = 4096
BATCH = int(os.environ.get("BENCH_BATCH", "512"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))


def make_fixture():
    """Music-like stereo PCM + encoded packets (cached; encoding is host-side)."""
    from saprobe_alac_tpu.config import PacketConfig
    from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets

    cfg = PacketConfig(
        frame_length=FRAME,
        bit_depth=16,
        num_channels=2,
        pb=40,
        mb=10,
        kb=14,
        max_run=255,
        max_frame_bytes=0,
        avg_bit_rate=0,
        sample_rate=RATE,
    )
    CACHE.mkdir(exist_ok=True)
    fx = CACHE / f"fixture_{int(SECONDS)}s.npz"
    if fx.exists():
        data = np.load(fx, allow_pickle=True)
        return cfg, [bytes(p) for p in data["packets"]], data["pcm"]

    n = int(RATE * SECONDS)
    n = (n // FRAME) * FRAME  # full frames only for clean tiling
    rng = np.random.default_rng(42)
    t = np.arange(n)
    sig = np.zeros((n, 2))
    for c in range(2):
        sig[:, c] = (
            0.35 * np.sin(2 * np.pi * t / (97.3 + 11 * c))
            + 0.2 * np.sin(2 * np.pi * t / (23.7 + 3 * c))
            + 0.1 * np.sin(2 * np.pi * t / (389.0 + 29 * c))
            + 0.02 * rng.standard_normal(n)
        )
    pcm = np.clip(sig * 0.8 * 32767, -32768, 32767).astype(np.int64)
    packets = encode_packets(cfg, EncoderSpec(), pcm)
    np.savez(fx, packets=np.array(packets, dtype=object), pcm=pcm)
    return cfg, packets, pcm


def main() -> int:
    import jax

    from saprobe_alac_tpu.codec.matrixing import pack_pcm
    from saprobe_alac_tpu.ops.batch import JaxBatchDecoder
    from saprobe_alac_tpu.ops.walk import ERR_NONE

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    cfg, packets, pcm = make_fixture()
    n_fixture = len(packets)
    print(f"fixture: {n_fixture} packets, {pcm.shape[0]/RATE:.1f}s audio", file=sys.stderr)

    # Tile fixture packets to the benchmark batch (independent streams).
    batch = [packets[i % n_fixture] for i in range(BATCH)]
    samples_per_batch = BATCH * FRAME

    dec = JaxBatchDecoder(cfg)

    # Correctness gate: decoded PCM must be bit-exact vs the encoder input.
    t0 = time.time()
    got = dec.decode_packets(batch[: min(BATCH, 16)])
    print(f"compile+first batch: {time.time()-t0:.1f}s", file=sys.stderr)
    for i, g in enumerate(got):
        src = pcm[(i % n_fixture) * FRAME : (i % n_fixture + 1) * FRAME]
        want = pack_pcm(src, cfg.bit_depth)
        assert g == want, f"bit-exactness failure on packet {i}"
    print("bit-exactness: OK", file=sys.stderr)

    # Warm up the full batch shape.
    np.asarray(dec.decode_async(batch)[0])

    # Sustained pipelined throughput: keep DEPTH batches in flight so host
    # packing, H2D, compute and D2H overlap (dispatch is async).
    DEPTH = 3
    t_start = time.perf_counter()
    inflight = []
    done_batches = 0
    times = []
    for it in range(ITERS):
        t0 = time.perf_counter()
        inflight.append(dec.decode_async(batch))
        if len(inflight) >= DEPTH:
            packed, err, ns = inflight.pop(0)
            np.asarray(packed)  # consume (D2H)
            done_batches += 1
        times.append(time.perf_counter() - t0)
    while inflight:
        packed, err, ns = inflight.pop(0)
        np.asarray(packed)
        done_batches += 1
    total = time.perf_counter() - t_start
    per_batch = total / ITERS

    audio_seconds = samples_per_batch / RATE
    x_realtime = audio_seconds / per_batch
    print(
        f"{ITERS} batches x {BATCH} pkts ({audio_seconds:.1f}s audio each) "
        f"in {total:.2f}s -> {per_batch*1e3:.1f} ms/batch",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "decode_x_realtime_44k16_stereo",
                "value": round(x_realtime, 1),
                "unit": "x_realtime",
                "vs_baseline": round(x_realtime / 2630.0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
