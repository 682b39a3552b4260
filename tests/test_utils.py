"""WAV I/O and PCM conversion roundtrips."""

import io

import numpy as np
import pytest

from saprobe_alac_tpu.formats import PCMFormat
from saprobe_alac_tpu.utils.pcmconv import array_to_pcm_bytes, pcm_bytes_to_array
from saprobe_alac_tpu.utils.wav import read_wav, write_wav

from conftest import music_pcm


@pytest.mark.parametrize("depth", (16, 20, 24, 32))
@pytest.mark.parametrize("channels", (1, 2, 6))
def test_pcmconv_roundtrip(depth, channels):
    fmt = PCMFormat(sample_rate=48000, bit_depth=depth, channels=channels)
    pcm = music_pcm(257, channels, depth, seed=depth + channels)
    data = array_to_pcm_bytes(fmt, pcm)
    back = pcm_bytes_to_array(fmt, data)
    assert np.array_equal(back, pcm)


@pytest.mark.parametrize("depth", (16, 24, 32))
def test_wav_roundtrip(depth):
    fmt = PCMFormat(sample_rate=44100, bit_depth=depth, channels=2)
    pcm = music_pcm(100, 2, depth, seed=depth)
    payload = array_to_pcm_bytes(fmt, pcm)
    buf = io.BytesIO()
    write_wav(buf, fmt, payload)
    buf.seek(0)
    fmt2, data = read_wav(buf)
    assert (fmt2.sample_rate, fmt2.channels) == (44100, 2)
    assert data == payload


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        read_wav(io.BytesIO(b"not a wav file at all..."))


def test_decode_file_convenience(tmp_path):
    from saprobe_alac_tpu import decode
    from saprobe_alac_tpu.encoder import encode_to_m4a

    fmt = PCMFormat(sample_rate=44100, bit_depth=16, channels=2)
    pcm = music_pcm(700, 2, 16, seed=50)
    path = tmp_path / "x.m4a"
    path.write_bytes(encode_to_m4a(fmt, pcm, frame_length=256))
    fmt2, arr = decode.decode_file(str(path))
    assert fmt2 == fmt
    assert np.array_equal(arr, pcm)


def test_phase_timer_and_profile_batch():
    from saprobe_alac_tpu.utils.profiling import PhaseTimer, profile_batch_decode
    from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets
    from conftest import make_config

    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()

    cfg = make_config(frame_length=64)
    pcm = music_pcm(128, 2, 16, seed=1)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    timer = profile_batch_decode(cfg, pkts, iters=1)
    for phase in ("host_pack", "h2d", "walk", "lpc", "epilogue", "d2h"):
        assert phase in timer.phases
