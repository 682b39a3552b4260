#!/usr/bin/env python
"""shard_map x Mosaic composition on the real chip (VERDICT r3 missing #5).

The sandbox TPU is a single chip, so multi-device sharding runs on the
virtual CPU mesh (tests/test_sharded.py) where the kernels execute in
interpreter mode.  This script pins the other half of the composition: a
mesh(1) ShardedBatchDecoder decode THROUGH THE COMPILED PALLAS KERNELS on
real hardware, bit-exact against the oracle.  Together the two halves cover
shard_map(XLA-CPU), shard_map(Pallas-interpret), and shard_map(Mosaic-TPU).

    python hack/hw_sharded_smoke.py [--batch 64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ["SAPROBE_WALK_IMPL"] = "pallas"
os.environ["SAPROBE_LPC_IMPL"] = "pallas"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".bench_cache", "xla"),
)

from hw_smoke import watchdog  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--init-timeout", type=float, default=240.0)
    args = ap.parse_args()

    if not watchdog(args.init_timeout):
        print("SHARDED SMOKE: accelerator unreachable")
        return 3

    import jax

    print(f"device: {jax.devices()[0]}", flush=True)
    if jax.default_backend() != "tpu":
        print(f"SHARDED SMOKE: backend is {jax.default_backend()!r}, not tpu")
        return 3

    from conftest import make_config, music_pcm
    from saprobe_alac_tpu.codec import decode_packet as oracle
    from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets
    from saprobe_alac_tpu.parallel import ShardedBatchDecoder, make_packet_mesh

    F = 4096
    cfg = make_config(depth=16, channels=2, frame_length=F)
    pcm = music_pcm(3 * F - 37, 2, 16, seed=23)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    batch = [pkts[i % len(pkts)] for i in range(args.batch)]
    want = [oracle(cfg, p)[0] for p in pkts]

    mesh = make_packet_mesh(jax.devices())  # mesh(1) on the single chip
    print(f"mesh: {mesh.devices.shape} on {mesh.devices.flat[0]}", flush=True)
    dec = ShardedBatchDecoder(cfg, mesh=mesh)
    t0 = time.time()
    got = dec.decode_packets(batch)
    print(f"compile+first sharded batch: {time.time()-t0:.1f}s", flush=True)
    for i, g in enumerate(got):
        if g != want[i % len(pkts)]:
            print(f"SHARDED SMOKE FAIL: packet {i} mismatch")
            return 1
    print("bit-exactness: OK (shard_map -> Mosaic kernels on TPU)")
    print("SHARDED SMOKE PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
