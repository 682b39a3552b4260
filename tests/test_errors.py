"""Error-path and corruption tests.

Mirrors the reference error suite (tests/error_test.go): deterministic
corruption of freshly encoded streams plus direct API error checks, asserting
the public sentinel hierarchy.
"""

import io
import struct

import pytest

from saprobe_alac_tpu import (
    BitstreamOverrun,
    ConfigError,
    DecodeError,
    InvalidCookie,
    InvalidHeader,
    NoTrackError,
    PacketDecoder,
    UnsupportedBitDepth,
    UnsupportedElement,
    UnsupportedVersion,
    new_decoder,
    parse_magic_cookie,
)
from saprobe_alac_tpu.codec.element import decode_packet
from saprobe_alac_tpu.encoder import EncoderSpec, encode_packet, encode_packets
from saprobe_alac_tpu.encoder.mux import build_m4a

from conftest import make_config, music_pcm


# --- Cookie / config errors (error_test.go:81-142) ---


def test_short_cookie():
    with pytest.raises(InvalidCookie):
        parse_magic_cookie(b"\x00" * 10)
    with pytest.raises(ConfigError):
        parse_magic_cookie(b"")


def test_bad_version_cookie():
    cookie = bytearray(make_config().to_cookie())
    cookie[4] = 1  # compatibleVersion
    with pytest.raises(UnsupportedVersion):
        parse_magic_cookie(bytes(cookie))


def test_invalid_bit_depth():
    cfg = make_config()
    bad = cfg.__class__(**{**cfg.__dict__, "bit_depth": 17})
    with pytest.raises(UnsupportedBitDepth):
        PacketDecoder(bad)


def test_wrapped_cookie_parses():
    cfg = make_config(depth=24, channels=2)
    raw = cfg.to_cookie()
    frma = struct.pack(">I4s4s", 12, b"frma", b"alac")
    alac = struct.pack(">I4sI", 12 + len(raw), b"alac", 0)
    parsed = parse_magic_cookie(frma + alac + raw)
    assert parsed == cfg


# --- Container corruption (error_test.go:174-366) ---


def _stream():
    cfg = make_config(frame_length=512)
    pcm = music_pcm(1024, 2, 16, seed=5)
    packets = encode_packets(cfg, EncoderSpec(), pcm)
    return cfg, build_m4a(cfg, packets)


def test_truncated_before_moov():
    _, m4a = _stream()
    with pytest.raises(NoTrackError):
        new_decoder(io.BytesIO(m4a[:16]))


def test_truncated_within_moov():
    _, m4a = _stream()
    moov = m4a.find(b"moov")
    with pytest.raises((NoTrackError, Exception)):
        new_decoder(io.BytesIO(m4a[: moov + 40]))


def test_garbage_stsd():
    _, m4a = _stream()
    idx = m4a.find(b"stsd")
    corrupted = m4a[: idx + 4] + b"\xff" * 16 + m4a[idx + 20 :]
    with pytest.raises(NoTrackError):
        new_decoder(io.BytesIO(corrupted))


def test_zeroed_stsz_count():
    _, m4a = _stream()
    idx = m4a.find(b"stsz")
    # sampleSize (4) then sampleCount (4) after version/flags.
    out = bytearray(m4a)
    out[idx + 8 : idx + 12] = b"\x00" * 4  # sampleSize already 0; zero count
    out[idx + 12 : idx + 16] = b"\x00" * 4
    dec = new_decoder(io.BytesIO(bytes(out)))
    assert dec.read() == b""  # zero packets -> empty stream, no crash


def test_corrupt_mdat_is_tolerated_or_errors():
    """ALAC has no checksums: corrupt mdat may decode to garbage or raise
    DecodeError — both acceptable (error_test.go:388-391)."""
    _, m4a = _stream()
    idx = m4a.find(b"mdat")
    out = bytearray(m4a)
    for i in range(idx + 12, min(idx + 120, len(out))):
        out[i] ^= 0x5A
    dec = new_decoder(io.BytesIO(bytes(out)))
    try:
        dec.read()
    except DecodeError:
        pass


def test_truncated_mdat():
    cfg, m4a = _stream()
    dec = new_decoder(io.BytesIO(m4a[: len(m4a) - 40]))
    with pytest.raises((DecodeError, EOFError)):
        dec.read()


# --- Packet-level decode errors ---


def test_unsupported_element():
    cfg = make_config()
    # tag 2 (CCE) as the first element.
    with pytest.raises(UnsupportedElement):
        decode_packet(cfg, bytes([0b010_00000]) + b"\x00" * 16)


def test_nonzero_unused_header_bits():
    cfg = make_config()
    # SCE tag (000) + instance 0 + nonzero unused bits.
    with pytest.raises(InvalidHeader):
        decode_packet(cfg, bytes([0b000_0000_1, 0xFF]) + b"\x00" * 16)


def test_empty_packet_overruns():
    cfg = make_config()
    with pytest.raises(BitstreamOverrun):
        decode_packet(cfg, b"")


def test_truncated_packet_overruns():
    cfg = make_config(frame_length=4096)
    pcm = music_pcm(4096, 2, 16, seed=11)
    pkt = encode_packet(cfg, EncoderSpec(), pcm)
    with pytest.raises(DecodeError):
        decode_packet(cfg, pkt[: len(pkt) // 4])
