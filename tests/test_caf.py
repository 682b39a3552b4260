"""CAF container support (a capability the reference explicitly lacks)."""

import io

import pytest

from saprobe_alac_tpu import NoTrackError, new_decoder, parse_magic_cookie
from saprobe_alac_tpu.caf import build_caf, find_alac_track_caf, sniff_container
from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets

from conftest import expected_pcm_bytes, make_config, music_pcm


def build(depth=16, channels=2, frame=512, n=1500, seed=61):
    cfg = make_config(depth=depth, channels=channels, frame_length=frame)
    pcm = music_pcm(n, channels, depth, seed=seed)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    spp = [min(frame, n - i * frame) for i in range(len(pkts))]
    return cfg, pcm, build_caf(cfg, pkts, spp)


def test_sniff():
    cfg, pcm, caf = build()
    assert sniff_container(io.BytesIO(caf)) == "caf"
    from saprobe_alac_tpu.encoder import build_m4a

    m4a = build_m4a(cfg, encode_packets(cfg, EncoderSpec(), pcm))
    assert sniff_container(io.BytesIO(m4a)) == "mp4"
    assert sniff_container(io.BytesIO(b"garbage!")) == "unknown"


def test_caf_demux():
    cfg, pcm, caf = build()
    cookie, samples = find_alac_track_caf(io.BytesIO(caf))
    assert parse_magic_cookie(cookie) == cfg
    assert len(samples) == 3
    total = sum(s.size for s in samples)
    assert total <= len(caf)


@pytest.mark.parametrize("depth,channels", ((16, 2), (24, 1), (24, 6)))
def test_caf_decode_bit_exact(depth, channels):
    cfg, pcm, caf = build(depth=depth, channels=channels, seed=depth + channels)
    dec = new_decoder(io.BytesIO(caf))
    assert dec.read() == expected_pcm_bytes(pcm, depth)


def test_caf_seek():
    cfg, pcm, caf = build(n=2048)
    dec = new_decoder(io.BytesIO(caf))
    want = expected_pcm_bytes(pcm, 16)
    pos = dec.seek(dec.duration() / 2)
    off = round(pos * cfg.sample_rate) * 2 * cfg.num_channels
    assert dec.read() == want[off:]


def test_caf_wav_roundtrip(tmp_path):
    from saprobe_alac_tpu.encoder import encode_wav_to_m4a
    from saprobe_alac_tpu.formats import PCMFormat
    from saprobe_alac_tpu.utils.pcmconv import array_to_pcm_bytes
    from saprobe_alac_tpu.utils.wav import write_wav

    fmt = PCMFormat(sample_rate=48000, bit_depth=24, channels=2)
    pcm = music_pcm(3000, 2, 24, seed=77)
    buf = io.BytesIO()
    write_wav(buf, fmt, array_to_pcm_bytes(fmt, pcm))
    buf.seek(0)
    caf = encode_wav_to_m4a(buf, frame_length=1024, container="caf")
    dec = new_decoder(io.BytesIO(caf))
    assert dec.read() == array_to_pcm_bytes(fmt, pcm)


def test_caf_errors():
    import struct

    with pytest.raises(NoTrackError):
        find_alac_track_caf(io.BytesIO(b"caff" + b"\x00" * 20))

    # Non-ALAC desc with all required chunks present, so the failure comes
    # specifically from the format-id check.
    cfg, pcm, caf = build(n=512)
    desc_idx = caf.find(b"desc")
    bad = bytearray(caf)
    # fmt_id sits 8 bytes into the desc payload (after the f64 sample rate).
    fmt_off = desc_idx + 12 + 8
    bad[fmt_off : fmt_off + 4] = b"lpcm"
    with pytest.raises(NoTrackError, match="not ALAC"):
        find_alac_track_caf(io.BytesIO(bytes(bad)))

    # Truncated pakt table: clean error, no IndexError.
    pakt_idx = caf.find(b"pakt")
    bad = bytearray(caf)
    bad[pakt_idx + 12 : pakt_idx + 20] = struct.pack(">q", 10_000_000)
    with pytest.raises(NoTrackError, match="pakt"):
        find_alac_track_caf(io.BytesIO(bytes(bad)))
