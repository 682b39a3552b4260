#!/usr/bin/env python
"""Full-matrix differential sweep ON REAL TPU through the Pallas kernel path.

The CPU sweep (hack/sweep_jax.py) validates the XLA fallback; this one pins
the production path: Mosaic-compiled walk/LPC kernels (SAPROBE_*_IMPL=pallas,
forced so a non-TPU run fails loudly instead of silently testing XLA), every
bit depth x channel count, the spec variants (escape / shift / orders /
mix), partial frames, silence, noise, and every lane-block size the
dispatcher can pick (LB 128/256/512/1024 + padded ragged batches).

Mirrors the role of the reference's hardware conformance matrix
(/root/reference/tests/conformance_test.go:568-628: depths x rates x
channels x encoders on the real execution path).  Sample rate is a metadata
passthrough here (kernels never see it), so the axis that matters on TPU is
shape: (depth, channels, lane block, frame occupancy).

Writes a machine-readable artifact to QA_SWEEP_TPU.json after every config
(partial runs still leave evidence) and prints one line per config.

Run (one tunnel client at a time — never concurrently with bench.py):
    python hack/sweep_tpu.py [--quick]
"""
import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

os.environ["SAPROBE_WALK_IMPL"] = "pallas"
os.environ["SAPROBE_LPC_IMPL"] = "pallas"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ART = Path(__file__).resolve().parent.parent / "QA_SWEEP_TPU.json"
CACHE = Path(__file__).resolve().parent.parent / ".bench_cache"

#: Frame length for the sweep: small enough that the scalar oracle is fast,
#: large enough that music-like streams cross several 1024-bit window
#: refreshes and L1 superblock refills per packet (~15 bits/row x 256 rows
#: = ~3.8k bits > 3 windows).
F = 256
#: Default batch: exercises the full-vreg LB=1024 lane-block path.
B_MAIN = 1024


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="one config per section")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", str(CACHE / "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    backend = jax.default_backend()
    device = str(jax.devices()[0])
    if backend != "tpu":
        print(f"FATAL: backend is {backend!r}, not tpu — this sweep only "
              "means anything on hardware", flush=True)
        return 2

    from conftest import make_config, music_pcm

    from saprobe_alac_tpu.codec import decode_packet as oracle
    from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets
    from saprobe_alac_tpu.encoder.encode import ChannelSpec
    from saprobe_alac_tpu.ops.batch import JaxBatchDecoder

    rev = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=ART.parent,
    ).stdout.strip()

    results = []
    done = set()
    if ART.exists():
        try:
            prior = json.loads(ART.read_text())
            if prior.get("git") and prior.get("frame_length") == F:
                for r in prior.get("results", []):
                    if r.get("ok"):
                        # Tag carried-over greens with the rev they ran at
                        # (a changed kernel invalidates nothing silently —
                        # the artifact names each result's revision).
                        results.append(dict(r, git=r.get("git", prior["git"])))
                        done.add((r["name"], r["depth"], r["ch"], r["B"],
                                  r.get("F", F)))
                print(f"resuming: {len(done)} configs already green "
                      f"(from rev {prior['git']})", flush=True)
        except Exception as e:
            print(f"ignoring unreadable prior artifact: {e}", flush=True)
    decs = {}
    t0 = time.time()

    def flush_artifact():
        fails = [r for r in results if not r["ok"]]
        ART.write_text(json.dumps({
            "backend": backend,
            "device": device,
            "impl": {"walk": "pallas", "lpc": "pallas"},
            "git": rev,
            "frame_length": F,
            "configs": len(results),
            "failures": len(fails),
            "elapsed_s": round(time.time() - t0, 1),
            "results": results,
        }, indent=1) + "\n")

    def dsefil_packets(cfg, spec, pcm, mid_dse=False):
        """Per-packet encode with FIL+DSE skip elements injected before the
        channel elements (and, with mid_dse, a DSE between element slots) —
        the layouts weak in the hardware sweep: the Mosaic element kernel's
        skip-slot arms (decoder.go:538-574 semantics) at production F."""
        from saprobe_alac_tpu.codec.element import CHANNEL_LAYOUT_OFFSETS
        from saprobe_alac_tpu.encoder.bitwriter import BitWriter
        from saprobe_alac_tpu.encoder.encode import (
            _append, _element_layout, _encode_cpe, _encode_sce)

        Fc = cfg.frame_length
        offsets = CHANNEL_LAYOUT_OFFSETS[cfg.num_channels - 1]
        pkts = []
        for i in range(0, pcm.shape[0], Fc):
            block = pcm[i : i + Fc]
            ns = block.shape[0]
            partial = ns != Fc
            w = BitWriter()
            # FIL, count=3 payload bytes — ends bit-unaligned (7+24 bits).
            w.write(6, 3)
            w.write(3, 4)
            for b in (0x11, 0x22, 0x33):
                w.write(b, 8)
            # DSE with byte-align flag + 2 data bytes.
            w.write(4, 3)
            w.write(0, 4)
            w.write(1, 1)
            w.write(2, 8)
            w.byte_align()
            w.write(0xDE, 8)
            w.write(0xAD, 8)
            chan_idx = 0
            for ei, width in enumerate(_element_layout(cfg.num_channels)):
                if width == 1:
                    elem = _encode_sce(cfg, spec, spec.channel, 0,
                                       block[:, offsets[chan_idx]], partial, ns)
                    chan_idx += 1
                else:
                    elem = _encode_cpe(cfg, spec, spec.channel,
                                       block[:, offsets[chan_idx]],
                                       block[:, offsets[chan_idx] + 1],
                                       partial, ns)
                    chan_idx += 2
                _append(w, elem)
                if mid_dse and ei == 0:
                    # Unaligned mid-stream DSE between element slots.
                    w.write(4, 3)
                    w.write(2, 4)
                    w.write(0, 1)
                    w.write(1, 8)
                    w.write(0x5A, 8)
            w.write(7, 3)
            w.byte_align()
            pkts.append(w.getvalue())
        return pkts

    def run(name, depth, ch, spec, B=B_MAIN, pcm=None, seed=None, frame=None,
            pkts_fn=None):
        Fc = F if frame is None else frame
        if (name, depth, ch, B, Fc) in done:
            return
        cfg = make_config(depth=depth, channels=ch, frame_length=Fc)
        if pcm is None:
            pcm = music_pcm(3 * Fc, ch, depth,
                            seed=depth * 10 + ch if seed is None else seed)
        key = (depth, ch, Fc)
        if key not in decs:
            decs[key] = JaxBatchDecoder(cfg)
        pkts = pkts_fn(cfg, spec, pcm) if pkts_fn else encode_packets(cfg, spec, pcm)
        want = [oracle(cfg, p)[0] for p in pkts]
        batch = [pkts[i % len(pkts)] for i in range(B)]
        tc = time.time()
        got = decs[key].decode_packets(batch)
        ok = all(g == want[i % len(want)] for i, g in enumerate(got))
        results.append({"name": name, "depth": depth, "ch": ch, "B": B,
                        "F": Fc, "ok": bool(ok),
                        "s": round(time.time() - tc, 1), "git": rev})
        print(f"{'ok  ' if ok else 'FAIL'} {name:10s} d{depth:<2d} c{ch} "
              f"B={B:<4d} F={Fc:<4d} {time.time()-tc:6.1f}s", flush=True)
        flush_artifact()

    # ---- main matrix: every depth x channel count through LB=1024 ----
    # Breadth-first: the common shapes (mono/stereo at every depth) pin the
    # broadest coverage early — each (depth, ch) is a fresh ~5-min XLA
    # compile through the sandbox tunnel, and the sweep is resumable, so
    # order = value density.
    matrix = [(d, ch) for ch in (2, 1) for d in (16, 24, 20, 32)] + [
        (d, ch) for ch in (3, 4, 5, 6, 7, 8) for d in (16, 24, 20, 32)
    ]
    for depth, ch in matrix:
        run("std", depth, ch, EncoderSpec())
        if args.quick:
            break

    # ---- spec variants (element/predictor/shift paths) ----
    specs = [
        (EncoderSpec(mix_res=0), "mix0"),
        (EncoderSpec(escape=True), "esc"),
        (EncoderSpec(bytes_shifted=1), "bs1"),
        (EncoderSpec(bytes_shifted=2), "bs2"),
        (EncoderSpec(channel=ChannelSpec(order=0)), "o0"),
        (EncoderSpec(channel=ChannelSpec(order=31)), "o31"),
        (EncoderSpec(channel=ChannelSpec(order=12, mode=1)), "o12m1"),
        (EncoderSpec(channel=ChannelSpec(order=30)), "o30"),
        (EncoderSpec(mix_res=-3, mix_bits=2), "mixneg"),
    ]
    for spec, name in specs:
        # 20-bit variant rows reuse the (20, 2, F) executable the std matrix
        # already compiled — near-free coverage.  Shift variants stay off
        # 20-bit: the format's 20-bit writer has no shift re-insert
        # (matrix.go:66-105 vs :107-163), so bs>0 at depth 20 is not a
        # lossless configuration any encoder emits.
        depths = (16, 24, 32) if name.startswith("bs") else (16, 24, 32, 20)
        for depth in depths:
            run(name, depth, 2, spec)
            if args.quick:
                break
        if args.quick:
            break

    # ---- in-kernel raw walk arms at sizes F=256 cannot reach ----
    # F=1024 CPE escape: the raw region spans >4 superblocks, so the V-phase
    # rewind lands below the resident L1 pair (backward need_l1 arm) — at
    # F=256 the whole region fits in one pair and the arm never fires.
    run("esc_rewind", 16, 2, EncoderSpec(escape=True), frame=1024,
        pcm=music_pcm(2 * 1024, 2, 16, seed=59))
    # F=1024 shifted: the raw shift reader's mid-stream L1 refill.
    run("bs1_long", 24, 2, EncoderSpec(bytes_shifted=1), frame=1024,
        pcm=music_pcm(2 * 1024, 2, 24, seed=60))

    # ---- content regimes ----
    run("partial", 16, 2, EncoderSpec(), pcm=music_pcm(3 * F - 37, 2, 16, seed=5))
    run("silence", 16, 2, EncoderSpec(), pcm=np.zeros((3 * F, 2), dtype=np.int64))
    run("noise", 16, 2, EncoderSpec(),
        pcm=music_pcm(3 * F, 2, 16, seed=6, tonality=0.0))

    # ---- lane-block sweep: every LB the dispatcher can pick, plus ragged
    # batches that exercise lane padding (B=300 -> LB=128, pad to 384;
    # B=520 -> LB=128, pad to 640) ----
    for B in (128, 256, 512, 300, 520):
        run("lb", 16, 2, EncoderSpec(), B=B)
        if args.quick:
            break

    # ---- production frame length F=4096 (the bench/BASELINE shape) ----
    # Kernel geometry (W_pad, L1 superblock stream trip counts, group loop
    # lengths) is F-dependent; the F=256 matrix above never pins the Mosaic
    # kernels at the frame length every BASELINE config and the bench run
    # actually use.  Mirrors /root/reference/tests/conformance_test.go:568-628
    # (every config runs on the real path at production parameters).
    F4 = 4096
    f4_rows = [
        ("std", 16, 2, EncoderSpec(), {}),
        ("bs1", 24, 2, EncoderSpec(bytes_shifted=1), {}),
        ("noise", 16, 2, EncoderSpec(),
         {"pcm": music_pcm(2 * F4, 2, 16, seed=61, tonality=0.0)}),
        ("esc", 16, 2, EncoderSpec(escape=True), {}),
        ("std", 16, 1, EncoderSpec(), {}),
        ("std", 24, 8, EncoderSpec(), {"pcm": music_pcm(2 * F4, 8, 24, seed=63)}),
        ("bs2", 32, 2, EncoderSpec(bytes_shifted=2), {}),
        ("partial", 16, 2, EncoderSpec(),
         {"pcm": music_pcm(2 * F4 - 123, 2, 16, seed=62)}),
        ("lb512", 16, 2, EncoderSpec(), {"B": 512}),
        ("std", 20, 2, EncoderSpec(), {}),
        ("esc", 20, 2, EncoderSpec(escape=True), {}),
        # --- round-5 additions: skip-element, multislot and predictor/mix
        # semantics at production frame length (the F=256 matrix covered
        # these variants but no F=4096 row carried a DSE or FIL before) ---
        ("dsefil", 16, 2, EncoderSpec(), {"pkts_fn": dsefil_packets}),
        ("dsefil", 24, 2, EncoderSpec(bytes_shifted=1),
         {"pkts_fn": dsefil_packets}),  # skip slots + the shift-region reader
        ("dse_mid", 16, 3, EncoderSpec(),
         {"pkts_fn": lambda c, s, p: dsefil_packets(c, s, p, mid_dse=True)}),
        ("std", 16, 3, EncoderSpec(), {}),   # SCE+CPE multislot, no skips
        ("mix0", 16, 2, EncoderSpec(mix_res=0), {}),
        ("mixneg", 16, 2, EncoderSpec(mix_res=-3, mix_bits=2), {}),
        ("o31", 16, 2, EncoderSpec(channel=ChannelSpec(order=31)), {}),
        ("o0", 16, 2, EncoderSpec(channel=ChannelSpec(order=0)), {}),
    ]
    for name, depth, ch, spec, kw in f4_rows:
        run(name, depth, ch, spec, frame=F4, **kw)
        if args.quick:
            break

    fails = sum(not r["ok"] for r in results)
    print(f"{'PASS' if fails == 0 else 'FAIL'}: {fails}/{len(results)} failures "
          f"in {time.time()-t0:.0f}s on {device}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
