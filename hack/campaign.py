#!/usr/bin/env python
"""File-level conformance campaign: random whole files through the facade.

The reference's natural-file mass campaign (8,409 real files, QA.md:246-249)
has no corpus analogue here, so this generates randomized M4A/CAF files
(format matrix x content classes x encoder specs) and runs each through the
full streaming facade with every backend, plus seek spot-checks.

    python hack/campaign.py [--files 100] [--seed 0] [--cpu]
"""
import argparse
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--jax-every", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from torture import random_pcm  # noqa: E402  (sibling hack module)

    from saprobe_alac_tpu import native, new_decoder
    from saprobe_alac_tpu.caf import build_caf
    from saprobe_alac_tpu.codec.matrixing import pack_pcm
    from saprobe_alac_tpu.config import PacketConfig
    from saprobe_alac_tpu.encoder import EncoderSpec, build_m4a, encode_packets
    from saprobe_alac_tpu.encoder.encode import ChannelSpec
    from saprobe_alac_tpu.formats import bytes_per_sample

    rng = np.random.default_rng(args.seed)
    fails = 0

    for it in range(args.files):
        depth = int(rng.choice([16, 20, 24, 32]))
        ch = int(rng.integers(1, 9))
        frame = int(rng.choice([256, 1024, 4096]))
        rate = int(rng.choice([8000, 22050, 44100, 96000, 192000]))
        cfg = PacketConfig(frame_length=frame, bit_depth=depth, num_channels=ch,
                           pb=40, mb=10, kb=14, max_run=255, max_frame_bytes=0,
                           avg_bit_rate=0, sample_rate=rate)
        spec = EncoderSpec(
            channel=ChannelSpec(order=int(rng.choice([1, 4, 8, 31])), fit=True),
            bytes_shifted=int(rng.choice([0, 1])),
            mix_res=int(rng.integers(-4, 5)),
        )
        n = int(rng.integers(frame, frame * 6))
        pcm = random_pcm(rng, n, ch, depth)
        pkts = encode_packets(cfg, spec, pcm)
        spp = [min(frame, n - i * frame) for i in range(len(pkts))]
        container = rng.choice(["m4a", "caf"])
        blob = build_caf(cfg, pkts, spp) if container == "caf" else build_m4a(cfg, pkts, spp)

        shifted = pcm << 4 if depth == 20 else pcm
        want = pack_pcm(shifted, depth)

        backends = ["scalar"]
        if native.available():
            backends.append("native")
        # Every jax-th file runs the device path, including the production
        # frame length; 4096 compiles once per (depth, ch) and is sampled at
        # half the rate of the short frames to bound campaign wall-clock.
        if args.jax_every and it % args.jax_every == 0:
            if frame <= 1024 or it % (2 * args.jax_every) == 0:
                backends.append("jax")

        for backend in backends:
            dec = new_decoder(io.BytesIO(blob), backend=backend, batch_size=16)
            got = dec.read()
            if got != want:
                print(f"[{it}] {backend} {container} d{depth} c{ch} f{frame}: FULL-READ MISMATCH")
                fails += 1
                continue
            # Seek spot-check.
            pos = dec.seek(dec.duration() * 0.5)
            off = round(pos * rate) * ch * bytes_per_sample(depth)
            if dec.read() != want[off:]:
                print(f"[{it}] {backend} {container}: SEEK MISMATCH")
                fails += 1

        if (it + 1) % 25 == 0:
            print(f"{it+1}/{args.files} files, {fails} failures", flush=True)

    print(f"{'PASS' if fails == 0 else 'FAIL'}: {fails} failures across {args.files} files")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
