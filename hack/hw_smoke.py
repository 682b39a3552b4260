#!/usr/bin/env python
"""Fast hardware smoke: ONE fused decode batch through the forced Pallas
path on the real chip, bit-exactness asserted.

Purpose: after kernel changes, validate Mosaic lowering + correctness in a
single short tunnel session (~one _decode_batch compile) before committing
to the long full sweep (hack/sweep_tpu.py) or bench.py.  Exits non-zero on
any failure; prints the device-compute time for a quick sanity read.

    python hack/hw_smoke.py [--batch 256] [--depth 16] [--channels 2]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ["SAPROBE_WALK_IMPL"] = "pallas"
os.environ["SAPROBE_LPC_IMPL"] = "pallas"
# Share bench's persistent compile cache so reruns are fast.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".bench_cache", "xla"),
)


def watchdog(timeout_s: float = 240.0) -> bool:
    """Probe device init in a subprocess (a wedged tunnel can hang the GIL)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('up')"],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
        return "up" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--channels", type=int, default=2)
    ap.add_argument("--init-timeout", type=float, default=240.0)
    args = ap.parse_args()

    if not watchdog(args.init_timeout):
        print("SMOKE: accelerator unreachable")
        return 3

    import numpy as np

    # Initialize the backend BEFORE importing conftest: conftest force-pins
    # the platform to CPU (config API) for pytest, which would silently turn
    # this hardware smoke into a CPU run (Pallas then refuses to compile).
    import jax

    print(f"device: {jax.devices()[0]}", flush=True)
    if jax.default_backend() != "tpu":
        print(f"SMOKE: backend is {jax.default_backend()!r}, not tpu")
        return 3

    from conftest import make_config, music_pcm
    from saprobe_alac_tpu.codec import decode_packet as oracle
    from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets
    from saprobe_alac_tpu.ops.batch import JaxBatchDecoder

    F = 4096
    cfg = make_config(depth=args.depth, channels=args.channels, frame_length=F)
    pcm = music_pcm(3 * F - 37, args.channels, args.depth, seed=21)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    batch = [pkts[i % len(pkts)] for i in range(args.batch)]
    want = [oracle(cfg, p)[0] for p in pkts]

    dec = JaxBatchDecoder(cfg)
    t0 = time.time()
    got = dec.decode_packets(batch)
    print(f"compile+first batch: {time.time()-t0:.1f}s", flush=True)
    for i, g in enumerate(got):
        if g != want[i % len(pkts)]:
            print(f"SMOKE FAIL: packet {i} mismatch")
            return 1
    print("bit-exactness: OK (forced Pallas path)")

    # Pre-staged device-compute timing, RTT-robust (vary input per iter).
    import jax.numpy as jnp

    words, sizes, _ = dec._stage(batch)
    jw = [jnp.asarray(words) for _ in range(4)]
    js = jnp.asarray(sizes)
    csum = jax.jit(lambda p: jnp.sum(p.astype(jnp.int32)))
    from saprobe_alac_tpu.ops import lpc as _l
    from saprobe_alac_tpu.ops import walk as _w
    from saprobe_alac_tpu.ops.batch import _decode_batch

    def run(w):
        return csum(
            _decode_batch(
                w, js, cfg.frame_length, cfg.num_channels, cfg.bit_depth,
                cfg.pb, cfg.mb, cfg.kb, _w._IMPL, _l._IMPL,
            )[0]
        )

    np.asarray(run(jw[0]))  # warm
    t0 = time.time()
    outs = [run(w) for w in jw]
    _ = [np.asarray(o) for o in outs]
    dt = (time.time() - t0) / len(jw)
    audio_s = args.batch * F / cfg.sample_rate
    print(f"device compute ~{dt*1e3:.1f} ms/batch ({audio_s/dt:.0f}x realtime, "
          f"B={args.batch}, incl. residual dispatch overhead)")
    print("SMOKE PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
