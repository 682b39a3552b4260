"""Fallback-order regression tests (auto -> native -> scalar).

Packets the device path declines — degenerate entropy tuning (kb == 0) or
degenerate widths (chan_bits > 32) — must land on the threaded C++ core when
it is built, not on the ~0.3x-realtime Python oracle (a stream of such
packets would otherwise collapse throughput by three orders of magnitude).
Parity role: the reference decodes every legal packet at full speed in one
implementation (decoder.go); here the host core is the speed backstop.
"""

import pytest

import saprobe_alac_tpu.ops.batch as batch_mod
from saprobe_alac_tpu import native
from saprobe_alac_tpu.codec import decode_packet as oracle
from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets
from saprobe_alac_tpu.ops.batch import JaxBatchDecoder

from conftest import make_config, music_pcm

FRAME = 160

needs_native = pytest.mark.skipif(not native.available(), reason="no native core")


def _no_oracle(monkeypatch):
    """Make any oracle call inside the batch module an immediate failure."""

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("scalar oracle used although native core is available")

    monkeypatch.setattr(batch_mod, "scalar_decode_packet", boom)


@needs_native
def test_degenerate_kb_batch_uses_native(monkeypatch):
    """kb == 0 routes the whole batch to the native core, bit-exactly."""
    cfg = make_config(depth=16, channels=2, frame_length=FRAME, kb=0, pb=0, mb=1)
    pcm = music_pcm(FRAME * 4, 2, 16, seed=21)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    want = [oracle(cfg, p)[0] for p in pkts]

    dec = JaxBatchDecoder(cfg)
    assert dec._scalar_only
    _no_oracle(monkeypatch)
    assert dec.decode_packets(pkts) == want


@needs_native
def test_device_declined_width_falls_back_to_native(monkeypatch):
    """32-bit CPE without byte shift (chan_bits = 33) declines on-device
    (walk.py ERR_WIDTH) and must decode through the native core."""
    cfg = make_config(depth=32, channels=2, frame_length=FRAME)
    pcm = music_pcm(FRAME * 3, 2, 32, seed=22)
    pkts = encode_packets(cfg, EncoderSpec(bytes_shifted=0), pcm)
    want = [oracle(cfg, p)[0] for p in pkts]

    dec = JaxBatchDecoder(cfg)
    _no_oracle(monkeypatch)
    got = dec.decode_packets(pkts)
    assert got == want


def test_host_decode_matches_oracle_without_native(monkeypatch):
    """With the native core unavailable, _host_decode is the oracle."""
    cfg = make_config(depth=16, channels=2, frame_length=FRAME)
    pcm = music_pcm(FRAME * 2, 2, 16, seed=23)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    monkeypatch.setattr(native, "available", lambda: False)
    assert batch_mod._host_decode(cfg, pkts) == [oracle(cfg, p)[0] for p in pkts]


@needs_native
def test_malformed_packet_still_raises_typed_error():
    """Native-first fallback preserves the oracle's exception surface."""
    from saprobe_alac_tpu.errors import DecodeError

    cfg = make_config(depth=16, channels=2, frame_length=FRAME, kb=0, pb=0, mb=1)
    dec = JaxBatchDecoder(cfg)
    with pytest.raises(DecodeError):
        dec.decode_packets([b"\x40\x00\x00"])  # leading CCE tag (0b010...)
