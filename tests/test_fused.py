"""Fused single-slot layout: walk rows consumed in place by the LPC kernel.

For C <= 2 batches in whole lane blocks (B % 128 == 0 — every production
bucket) the element kernel's raw rows buffer is handed straight to the LPC
FIR kernel (ops/walk.fused_rows_layout): no dispatch cond, no (F, C, B)
merge select, no residual relayout.  These tests pin that path specifically
— the broader suites mostly use small odd batch sizes, which take the slot
loop + merge path.

Parity: decoder.go:210-265/348-460 (one SCE or CPE per packet is the layout
every known encoder emits for mono/stereo); multi-element layouts fall back
to the exact host decode via ERR_SLOTS (decode path behavior unchanged).
"""

import numpy as np
import pytest

from conftest import make_config, music_pcm

from saprobe_alac_tpu.codec import decode_packet as oracle
from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets
from saprobe_alac_tpu.encoder.bitwriter import BitWriter
from saprobe_alac_tpu.encoder.encode import (
    ChannelSpec,
    _append,
    _encode_cpe,
    _encode_sce,
)
from saprobe_alac_tpu.ops.batch import JaxBatchDecoder

F = 256
B = 128  # one whole lane block -> fused path


@pytest.fixture(autouse=True)
def interpret_kernels():
    """Force both Pallas kernels (interpreter mode) for every test here."""
    import saprobe_alac_tpu.ops.lpc as lpc_mod
    import saprobe_alac_tpu.ops.walk as walk_mod

    old = walk_mod._IMPL, lpc_mod._IMPL
    walk_mod._IMPL = "pallas_interpret"
    lpc_mod._IMPL = "pallas_interpret"
    yield
    walk_mod._IMPL, lpc_mod._IMPL = old


def fused_decoder(depth, channels):
    import saprobe_alac_tpu.ops.lpc as lpc_mod
    import saprobe_alac_tpu.ops.walk as walk_mod
    from saprobe_alac_tpu.ops.walk import fused_rows_layout

    assert fused_rows_layout(walk_mod._IMPL, lpc_mod._IMPL, channels, B)
    return JaxBatchDecoder(make_config(depth=depth, channels=channels, frame_length=F))


def roundtrip(depth, channels, spec, pcm=None, seed=None):
    cfg = make_config(depth=depth, channels=channels, frame_length=F)
    if pcm is None:
        pcm = music_pcm(3 * F, channels, depth, seed=seed or (depth * 7 + channels))
    pkts = encode_packets(cfg, spec, pcm)
    want = [oracle(cfg, p)[0] for p in pkts]
    batch = [pkts[i % len(pkts)] for i in range(B)]
    got = fused_decoder(depth, channels).decode_packets(batch)
    assert all(g == want[i % len(want)] for i, g in enumerate(got))


@pytest.mark.parametrize("depth", [16, 20, 24, 32])
@pytest.mark.parametrize("channels", [1, 2])
def test_fused_std(depth, channels):
    roundtrip(depth, channels, EncoderSpec())


@pytest.mark.parametrize(
    "name,spec",
    [
        ("mode1", EncoderSpec(channel=ChannelSpec(order=12, mode=1))),
        ("o31", EncoderSpec(channel=ChannelSpec(order=31))),
        ("o0", EncoderSpec(channel=ChannelSpec(order=0))),
        ("esc", EncoderSpec(escape=True)),
        ("bs1", EncoderSpec(bytes_shifted=1)),
        ("mix0", EncoderSpec(mix_res=0)),
        ("o31mode1", EncoderSpec(channel=ChannelSpec(order=31, mode=1))),
    ],
)
def test_fused_variants(name, spec):
    depth = 24 if name == "bs1" else 16
    roundtrip(depth, 2, spec)


def test_fused_partial_final():
    roundtrip(16, 2, EncoderSpec(), pcm=music_pcm(3 * F - 37, 2, 16, seed=5))


def test_fused_noise():
    roundtrip(16, 2, EncoderSpec(), pcm=music_pcm(3 * F, 2, 16, seed=6, tonality=0.0))


def test_fused_multislot_lane_falls_back():
    """A FIL-prefixed stereo packet needs two element slots; on the fused
    single-slot layout it gets ERR_SLOTS and the exact host fallback decodes
    it — output stays bit-exact."""
    cfg = make_config(depth=16, channels=2, frame_length=F)
    pcm = music_pcm(F, 2, 16, seed=9)
    spec = EncoderSpec()
    w = BitWriter()
    w.write(6, 3)
    w.write(0, 4)  # FIL, count=0
    elem = _encode_cpe(cfg, spec, spec.channel, pcm[:, 0], pcm[:, 1], False, F)
    _append(w, elem)
    w.write(7, 3)
    w.byte_align()
    pkt = w.getvalue()
    want = oracle(cfg, pkt)[0]
    got = fused_decoder(16, 2).decode_packets([pkt] * B)
    assert all(g == want for g in got)


def test_fused_underpopulated_sce_lane():
    """One SCE then END inside a stereo config, mixed into a normal batch:
    channel 0 decoded, channel 1 zero (review finding 2 semantics)."""
    cfg = make_config(depth=16, channels=2, frame_length=F)
    pcm = music_pcm(F, 2, 16, seed=9)
    spec = EncoderSpec()
    w = BitWriter()
    elem = _encode_sce(cfg, spec, spec.channel, 0, pcm[:, 0], False, F)
    _append(w, elem)
    w.write(7, 3)
    w.byte_align()
    pkt_sce = w.getvalue()
    pkts = encode_packets(cfg, spec, music_pcm(2 * F, 2, 16, seed=10))
    batch = [pkts[i % len(pkts)] for i in range(B - 1)] + [pkt_sce]
    want = [oracle(cfg, p)[0] for p in batch]
    got = fused_decoder(16, 2).decode_packets(batch)
    assert got == want


def test_wide_order_retries_at_32_taps():
    """FIR orders 9..30 flip the per-packet `wide` flag and finish_async
    re-dispatches through the 32-tap executable — output bit-exact, steady
    state stays on the 9-tap executable (no on-device taps cond)."""
    import numpy as np

    cfg = make_config(depth=16, channels=2, frame_length=F)
    spec = EncoderSpec(channel=ChannelSpec(order=12))
    pcm = music_pcm(2 * F, 2, 16, seed=21)
    pkts = encode_packets(cfg, spec, pcm)
    want = [oracle(cfg, p)[0] for p in pkts]
    dec = fused_decoder(16, 2)
    batch = [pkts[i % len(pkts)] for i in range(B)]
    handle = dec.decode_async(batch)
    wide = np.asarray(handle[3])
    assert wide[: len(batch)].all(), "order-12 lanes must flag wide"
    got = dec.finish_async(handle, batch)
    assert all(g == want[i % len(want)] for i, g in enumerate(got))

    # Steady state: order <= 8 batches never flag.
    pkts8 = encode_packets(cfg, EncoderSpec(channel=ChannelSpec(order=8)),
                           music_pcm(F, 2, 16, seed=22))
    h8 = dec.decode_async([pkts8[0]] * B)
    assert not np.asarray(h8[3]).any()
    want8 = oracle(cfg, pkts8[0])[0]
    assert all(g == want8 for g in dec.finish_async(h8, [pkts8[0]] * B))


def test_fused_corrupt_lane_falls_back():
    """Truncated packet in a fused batch: per-lane error -> oracle error
    semantics preserved (the good lanes stay on-device)."""
    cfg = make_config(depth=16, channels=2, frame_length=F)
    pkts = encode_packets(cfg, EncoderSpec(), music_pcm(2 * F, 2, 16, seed=11))
    bad = pkts[0][: len(pkts[0]) // 3]
    batch = [pkts[i % len(pkts)] for i in range(B - 1)] + [bad]
    dec = fused_decoder(16, 2)
    with pytest.raises(Exception):
        dec.decode_packets(batch)
    # Errors on the batch surface only when the bad lane is asked for; the
    # good lanes decode fine in a batch without it.
    good = dec.decode_packets([pkts[i % len(pkts)] for i in range(B)])
    want = [oracle(cfg, p)[0] for p in pkts]
    assert all(g == want[i % len(want)] for i, g in enumerate(good))
