"""Regression tests for the round-1 code-review findings."""

import io
import struct

import numpy as np
import pytest

from saprobe_alac_tpu import BitstreamOverrun, NoTrackError, native, new_decoder
from saprobe_alac_tpu.codec import decode_packet as oracle
from saprobe_alac_tpu.encoder import EncoderSpec, encode_packet, encode_packets
from saprobe_alac_tpu.encoder.bitwriter import BitWriter
from saprobe_alac_tpu.encoder.encode import _append, _encode_sce
from saprobe_alac_tpu.ops.batch import JaxBatchDecoder

from conftest import expected_pcm_bytes, make_config, music_pcm


def test_truncated_escape_errors_everywhere():
    """A 3-byte packet declaring a full escape frame must raise, not return
    silent zeros or heap garbage (review findings 1 and 6)."""
    cfg = make_config(depth=16, channels=2, frame_length=4096)
    bad = bytes([0x00, 0x00, 0x02])
    with pytest.raises(BitstreamOverrun):
        oracle(cfg, bad)
    if native.available():
        with pytest.raises(BitstreamOverrun):
            native.decode_packet(cfg, bad)
    # Device path: flags the lane, fallback re-raises the oracle error.
    with pytest.raises(BitstreamOverrun):
        JaxBatchDecoder(cfg).decode_packets([bad])


def test_underpopulated_packet_matches_oracle():
    """One SCE then END inside a 2-channel config: the decoded channel must
    survive the remap and the missing channel stay zero (review finding 2)."""
    cfg = make_config(depth=16, channels=2, frame_length=128)
    pcm_mono = music_pcm(128, 1, 16, seed=3)[:, 0]
    w = BitWriter()
    spec = EncoderSpec()
    elem = _encode_sce(cfg, spec, spec.channel, 0, pcm_mono, False, 128)
    _append(w, elem)
    w.write(7, 3)
    w.byte_align()
    pkt = w.getvalue()

    want = oracle(cfg, pkt)[0]
    arr = np.frombuffer(want, dtype="<i2").reshape(-1, 2)
    assert np.array_equal(arr[:, 0], pcm_mono)  # channel 0 decoded
    assert (arr[:, 1] == 0).all()  # channel 1 zero

    got = JaxBatchDecoder(cfg).decode_packets([pkt])[0]
    assert got == want
    if native.available():
        assert native.decode_packet(cfg, pkt) == want


def test_caf_negative_chunk_size_rejected():
    """Malformed CAF chunk sizes must error, not loop forever (finding 3)."""
    bad = b"caff" + struct.pack(">HH", 1, 0) + b"desc" + struct.pack(">q", -12) + b"\x00" * 8
    with pytest.raises(NoTrackError):
        new_decoder(io.BytesIO(bad))


def test_stsd_zero_entry_size_terminates():
    """stsd with entry_size=0 and a huge entry_count must not spin (finding 7)."""
    cfg = make_config(frame_length=256)
    pcm = music_pcm(256, 2, 16, seed=4)
    from saprobe_alac_tpu.encoder import build_m4a

    m4a = bytearray(build_m4a(cfg, encode_packets(cfg, EncoderSpec(), pcm)))
    i = m4a.find(b"stsd")
    m4a[i + 8 : i + 12] = struct.pack(">I", 0xFFFFFFFF)  # entryCount
    m4a[i + 12 : i + 16] = struct.pack(">I", 0)  # first entry size 0
    with pytest.raises(NoTrackError):
        new_decoder(io.BytesIO(bytes(m4a)))  # returns promptly


def test_mix_overflow_falls_back_lossless():
    """Aggressive mix_res that overflows chan_bits must stay lossless via
    the mix_res=0 fallback in both encoders (finding 4)."""
    cfg = make_config(depth=24, channels=2, frame_length=256)
    pcm = music_pcm(256, 2, 24, seed=5)
    spec = EncoderSpec(mix_res=64, mix_bits=1)
    pkt = encode_packet(cfg, spec, pcm)
    assert oracle(cfg, pkt)[0] == expected_pcm_bytes(pcm, 24)
    if native.available():
        pkt_n = native.encode_packet(cfg, spec, pcm)
        assert oracle(cfg, pkt_n)[0] == expected_pcm_bytes(pcm, 24)


def test_16bit_shifted_stream_ignores_shift_bits():
    """bytesShifted>0 at 16-bit depth: writers ignore the shift buffer
    (matrix.go WriteStereo16 takes none) — all decoders must agree
    (finding 5).  Hand-crafted stream: the encoder never emits this."""
    cfg = make_config(depth=16, channels=1, frame_length=8)
    vals = [3, -5, 7, -2, 1, 0, 4, -8]  # 8-bit range (chan_bits = 16-8 = 8)
    w = BitWriter()
    w.write(0, 3)  # SCE
    w.write(0, 4)  # instance
    w.write(0, 12)
    w.write((0 << 3) | (1 << 1) | 0, 4)  # bytesShifted=1, compressed
    w.write(0, 8)  # mixBits
    w.write(0, 8)  # mixRes
    w.write(0, 8)  # mode=0, den=0
    w.write((4 << 5) | 0, 8)  # pbFactor=4, order=0
    for _ in range(8):  # shift region: 8 x 8-bit values
        w.write(0xAB, 8)
    # order-0: residuals are the samples; entropy-code them
    from saprobe_alac_tpu.codec.golomb import AGParams
    from saprobe_alac_tpu.encoder.encode import ag_encode

    ag = AGParams.standard(mb=cfg.mb, pb=cfg.pb, kb=cfg.kb, fw=8, sw=8, max_run=cfg.max_run)
    body = ag_encode(ag, vals, 8)
    _append(w, body)
    w.write(7, 3)
    w.byte_align()
    pkt = w.getvalue()

    want = oracle(cfg, pkt)[0]
    got_vals = np.frombuffer(want, dtype="<i2")
    # Shift bits (0xAB) are ignored at 16-bit depth: plain sext8 values.
    assert got_vals.tolist() == vals
    assert JaxBatchDecoder(cfg).decode_packets([pkt])[0] == want
    if native.available():
        assert native.decode_packet(cfg, pkt) == want


def test_float_wav_rejected():
    """IEEE-float WAVs must be rejected, not reinterpreted (finding 8)."""
    from saprobe_alac_tpu.utils.wav import read_wav

    hdr = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt " + struct.pack(
        "<IHHIIHH", 16, 3, 2, 44100, 44100 * 8, 8, 32
    ) + b"data" + struct.pack("<I", 0)
    with pytest.raises(ValueError):
        read_wav(io.BytesIO(hdr))


def _stereo_packet_with_prefix(cfg, pcm, prefix_writer):
    """A valid CPE packet with arbitrary elements written before it."""
    from saprobe_alac_tpu.encoder.encode import _encode_cpe

    w = BitWriter()
    _append(w, prefix_writer)
    spec = EncoderSpec()
    elem = _encode_cpe(cfg, spec, spec.channel, pcm[:, 0], pcm[:, 1], False, pcm.shape[0])
    _append(w, elem)
    w.write(7, 3)
    w.byte_align()
    return w.getvalue()


def test_fil_and_dse_elements_before_audio():
    """FIL and DSE elements interleave before the channel elements; every
    decoder must skip them identically (decoder.go:538-574)."""
    cfg = make_config(depth=16, channels=2, frame_length=64)
    pcm = music_pcm(64, 2, 16, seed=6)

    pre = BitWriter()
    # FIL with count=3 payload bytes
    pre.write(6, 3)
    pre.write(3, 4)
    for b in (0x11, 0x22, 0x33):
        pre.write(b, 8)
    # FIL with escape count (15 -> +8 bits)
    pre.write(6, 3)
    pre.write(15, 4)
    pre.write(2, 8)  # total = 15 + 2 - 1 = 16 bytes
    for i in range(16):
        pre.write(i, 8)
    # DSE, no align, 2 bytes
    pre.write(4, 3)
    pre.write(0, 4)
    pre.write(0, 1)
    pre.write(2, 8)
    pre.write(0xAA, 8)
    pre.write(0xBB, 8)
    # DSE with byte-align flag
    pre.write(4, 3)
    pre.write(1, 4)
    pre.write(1, 1)
    pre.write(1, 8)
    pre.byte_align()  # align point the decoder must reproduce
    pre.write(0xCC, 8)

    pkt = _stereo_packet_with_prefix(cfg, pcm, pre)
    want = oracle(cfg, pkt)[0]
    assert want == expected_pcm_bytes(pcm, 16)
    assert JaxBatchDecoder(cfg).decode_packets([pkt])[0] == want
    if native.available():
        assert native.decode_packet(cfg, pkt) == want


def test_slot_budget_overflow_falls_back():
    """More fill elements than the device walk's slot budget: the lane flags
    ERR_SLOTS and the oracle decodes it (still bit-exact)."""
    cfg = make_config(depth=16, channels=2, frame_length=64)
    pcm = music_pcm(64, 2, 16, seed=7)
    pre = BitWriter()
    for _ in range(8):  # > C + EXTRA_SLOTS element budget
        pre.write(6, 3)  # FIL count=0
        pre.write(0, 4)
    pkt = _stereo_packet_with_prefix(cfg, pcm, pre)
    want = oracle(cfg, pkt)[0]
    assert want == expected_pcm_bytes(pcm, 16)
    assert JaxBatchDecoder(cfg).decode_packets([pkt])[0] == want


def test_int32_min_residual_escapes():
    """chan_bits=32 cannot carry an INT32_MIN residual (the decoder's
    unsigned mapping wraps it to 0); the encoder must emit the verbatim
    element instead.  Found by hack/torture.py."""
    cfg = make_config(depth=32, channels=1, frame_length=64)
    pcm = np.full((64, 1), (1 << 31) - 1, dtype=np.int64)
    pcm[0, 0] = 0  # forces huge first-order deltas through the predictor
    from saprobe_alac_tpu.encoder.encode import ChannelSpec

    for spec in (EncoderSpec(channel=ChannelSpec(order=4, den_shift=3, mode=1, fit=True)),
                 EncoderSpec(channel=ChannelSpec(order=31))):
        for backend in ("python", "auto"):
            pkts = encode_packets(cfg, spec, pcm, backend=backend)
            got = b"".join(oracle(cfg, p)[0] for p in pkts)
            assert got == expected_pcm_bytes(pcm, 32), (spec, backend)
