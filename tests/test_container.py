"""Container-level tests: mux -> demux -> streaming Decoder facade.

Covers the reference's high-level API semantics (decode.go): Read draining,
O(1) packet-aligned Seek with clamping, Duration/Position arithmetic, plus
wrapped-cookie handling and 64-bit co64 offsets.
"""

import io
import struct

import pytest

from saprobe_alac_tpu import new_decoder, parse_magic_cookie
from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets
from saprobe_alac_tpu.encoder.mux import build_m4a
from saprobe_alac_tpu.mp4 import find_alac_track

from conftest import expected_pcm_bytes, make_config, music_pcm


def build_stream(depth=16, channels=2, rate=44100, seconds=0.25, frame=1024, seed=3, spec=None):
    cfg = make_config(depth=depth, channels=channels, frame_length=frame, sample_rate=rate)
    n = int(rate * seconds)
    pcm = music_pcm(n, channels, depth, seed=seed)
    packets = encode_packets(cfg, spec or EncoderSpec(), pcm)
    spp = [min(frame, n - i * frame) for i in range(len(packets))]
    m4a = build_m4a(cfg, packets, spp)
    return cfg, pcm, m4a


def test_full_decode_bit_exact():
    cfg, pcm, m4a = build_stream()
    dec = new_decoder(io.BytesIO(m4a))
    fmt = dec.format()
    assert (fmt.sample_rate, fmt.bit_depth, fmt.channels) == (44100, 16, 2)
    assert dec.read() == expected_pcm_bytes(pcm, 16)
    assert dec.read() == b""  # EOF


def test_read_small_chunks():
    cfg, pcm, m4a = build_stream(seconds=0.1)
    dec = new_decoder(io.BytesIO(m4a))
    want = expected_pcm_bytes(pcm, 16)
    out = b""
    while True:
        chunk = dec.read(777)
        if not chunk:
            break
        out += chunk
    assert out == want


def test_wrapped_cookie():
    cfg = make_config(frame_length=512)
    pcm = music_pcm(512, 2, 16, seed=9)
    packets = encode_packets(cfg, EncoderSpec(), pcm)
    m4a = build_m4a(cfg, packets, wrap_cookie=True)
    dec = new_decoder(io.BytesIO(m4a))
    assert dec.read() == expected_pcm_bytes(pcm, 16)


@pytest.mark.parametrize("fraction", (0.0, 0.25, 0.5, 0.75))
def test_seek_positions(fraction):
    """Seek verification at 4 positions, mirroring conformance_test.go:343-421."""
    cfg, pcm, m4a = build_stream(seconds=0.5)
    want = expected_pcm_bytes(pcm, 16)
    dec = new_decoder(io.BytesIO(m4a))
    duration = dec.duration()

    pos = dec.seek(duration * fraction)
    frame_off = round(pos * cfg.sample_rate)
    # Position is always packet-aligned.
    assert frame_off % cfg.frame_length == 0
    assert dec.position() == pytest.approx(pos)
    bps_frame = 2 * cfg.num_channels
    assert dec.read() == want[frame_off * bps_frame :]


def test_seek_clamping():
    cfg, pcm, m4a = build_stream(seconds=0.1)
    dec = new_decoder(io.BytesIO(m4a))
    assert dec.seek(-5.0) == 0.0
    assert dec.read() == expected_pcm_bytes(pcm, 16)
    pos = dec.seek(1e9)
    assert pos == pytest.approx(dec.duration())
    assert dec.read() == b""


def test_duration_position():
    cfg, pcm, m4a = build_stream(seconds=0.5, frame=1024)
    dec = new_decoder(io.BytesIO(m4a))
    n_packets = -(-pcm.shape[0] // 1024)
    assert dec.duration() == pytest.approx(n_packets * 1024 / 44100)
    assert dec.position() == 0.0
    dec.read(1024 * 2 * 2)  # exactly one packet of bytes
    assert dec.position() == pytest.approx(1024 / 44100)


def test_co64_offsets():
    """64-bit chunk offsets: rewrite stco as co64."""
    cfg, pcm, m4a = build_stream(seconds=0.1)
    idx = m4a.find(b"stco")
    assert idx > 0
    # stco payload: ver/flags(4) + count(4) + count*4 offsets.
    size = struct.unpack(">I", m4a[idx - 4 : idx])[0]
    count = struct.unpack(">I", m4a[idx + 8 : idx + 12])[0]
    offsets = struct.unpack(f">{count}I", m4a[idx + 12 : idx + 12 + 4 * count])
    delta = 4 * count  # co64 grows by 4 bytes per offset
    new_box = (
        struct.pack(">I", size + delta)
        + b"co64"
        + m4a[idx + 4 : idx + 12]
        + b"".join(struct.pack(">Q", o + delta) for o in offsets)
    )
    # Patch every ancestor box size (moov/trak/mdia/minf/stbl) on the path.
    out = bytearray(m4a[: idx - 4] + new_box + m4a[idx - 4 + size :])
    for four in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = out.find(four)
        old = struct.unpack(">I", out[j - 4 : j])[0]
        out[j - 4 : j] = struct.pack(">I", old + delta)
    dec = new_decoder(io.BytesIO(bytes(out)))
    assert dec.read() == expected_pcm_bytes(pcm, 16)


def test_find_alac_track_sample_table():
    cfg, pcm, m4a = build_stream(seconds=0.1, frame=512)
    cookie, samples = find_alac_track(io.BytesIO(m4a))
    parsed = parse_magic_cookie(cookie)
    assert parsed.frame_length == 512
    assert parsed.sample_rate == 44100
    n_expected = -(-pcm.shape[0] // 512)
    assert len(samples) == n_expected
    # Offsets/sizes must address the actual packet bytes in mdat.
    total = sum(s.size for s in samples)
    assert all(s.offset + s.size <= len(m4a) for s in samples)


def test_multitrack_skips_non_alac():
    """A file whose first trak is not ALAC: demuxer must keep scanning."""
    cfg, pcm, m4a = build_stream(seconds=0.05, frame=512)
    # Build a dummy non-ALAC trak (no stsd 'alac' entry) and splice it before
    # the real one inside moov.
    moov_idx = m4a.find(b"moov")
    trak_idx = m4a.find(b"trak", moov_idx)
    dummy_stbl = struct.pack(">I", 8) + b"stbl"
    dummy_minf = struct.pack(">I", 8 + len(dummy_stbl)) + b"minf" + dummy_stbl
    dummy_mdia = struct.pack(">I", 8 + len(dummy_minf)) + b"mdia" + dummy_minf
    dummy_trak = struct.pack(">I", 8 + len(dummy_mdia)) + b"trak" + dummy_mdia
    out = bytearray(m4a[:trak_idx - 4] + dummy_trak + m4a[trak_idx - 4 :])
    j = out.find(b"moov")
    old = struct.unpack(">I", out[j - 4 : j])[0]
    out[j - 4 : j] = struct.pack(">I", old + len(dummy_trak))
    # stco offsets in the real trak are now stale by len(dummy_trak); patch.
    k = bytes(out).find(b"stco")
    count = struct.unpack(">I", out[k + 8 : k + 12])[0]
    for c in range(count):
        off_pos = k + 12 + 4 * c
        old_off = struct.unpack(">I", out[off_pos : off_pos + 4])[0]
        out[off_pos : off_pos + 4] = struct.pack(">I", old_off + len(dummy_trak))
    dec = new_decoder(io.BytesIO(bytes(out)))
    assert dec.read() == expected_pcm_bytes(pcm, 16)


def test_seek_exact_sample_accurate():
    """seek_exact positions on the precise sample (beyond reference parity)."""
    cfg, pcm, m4a = build_stream(seconds=0.3, frame=1024)
    want = expected_pcm_bytes(pcm, 16)
    dec = new_decoder(io.BytesIO(m4a))
    t = 2500.5 / 44100  # mid-packet, fractional sample time
    pos = dec.seek_exact(t)
    sample = round(pos * 44100)
    assert sample == 2500
    assert dec.read() == want[sample * 4 :]
    # Past-end clamp.
    assert dec.seek_exact(99.0) == pytest.approx(dec.duration())
    assert dec.read() == b""
