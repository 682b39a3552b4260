"""CLI integration tests (reference tests/example_decoder_test.go)."""

import io
import subprocess
import sys

import pytest

from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets
from saprobe_alac_tpu.encoder.mux import build_m4a
from saprobe_alac_tpu.utils.wav import read_wav

from conftest import expected_pcm_bytes, make_config, music_pcm


@pytest.fixture(scope="module")
def m4a_file(tmp_path_factory):
    cfg = make_config(frame_length=512)
    pcm = music_pcm(1536, 2, 16, seed=21)
    packets = encode_packets(cfg, EncoderSpec(), pcm)
    path = tmp_path_factory.mktemp("cli") / "clip.m4a"
    path.write_bytes(build_m4a(cfg, packets))
    return path, pcm


def run_cli(*args, stdin=None):
    return subprocess.run(
        [sys.executable, "-m", "saprobe_alac_tpu.cli", *args],
        capture_output=True,
        input=stdin,
        timeout=300,
    )


def test_pcm_mode(m4a_file, tmp_path):
    path, pcm = m4a_file
    out = tmp_path / "out.pcm"
    r = run_cli("-format", "pcm", str(path), str(out))
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == expected_pcm_bytes(pcm, 16)
    assert b"44100 Hz, 16-bit, 2 ch" in r.stderr


def test_wav_mode(m4a_file, tmp_path):
    path, pcm = m4a_file
    out = tmp_path / "out.wav"
    r = run_cli("-format", "wav", str(path), str(out))
    assert r.returncode == 0, r.stderr
    fmt, data = read_wav(io.BytesIO(out.read_bytes()))
    assert (fmt.sample_rate, fmt.bit_depth, fmt.channels) == (44100, 16, 2)
    assert data == expected_pcm_bytes(pcm, 16)


def test_stdin_to_stdout(m4a_file):
    path, pcm = m4a_file
    r = run_cli("-format", "pcm", "-", stdin=path.read_bytes())
    assert r.returncode == 0, r.stderr
    assert r.stdout == expected_pcm_bytes(pcm, 16)


def test_version():
    r = run_cli("--version")
    assert r.returncode == 0
    assert b"alac-decode" in r.stdout


def test_bad_file(tmp_path):
    bad = tmp_path / "bad.m4a"
    bad.write_bytes(b"garbage data here")
    r = run_cli(str(bad))
    assert r.returncode == 1
    assert b"alac-decode:" in r.stderr


def test_missing_file():
    r = run_cli("/nonexistent/file.m4a")
    assert r.returncode == 1


def test_encode_roundtrip(tmp_path):
    """alac-encode WAV -> M4A -> alac-decode -> identical WAV payload."""

    from saprobe_alac_tpu.formats import PCMFormat
    from saprobe_alac_tpu.utils.wav import write_wav
    from saprobe_alac_tpu.utils.pcmconv import array_to_pcm_bytes

    fmt = PCMFormat(sample_rate=22050, bit_depth=16, channels=2)
    pcm = music_pcm(5000, 2, 16, seed=33)
    wav_in = tmp_path / "in.wav"
    with open(wav_in, "wb") as f:
        write_wav(f, fmt, array_to_pcm_bytes(fmt, pcm))

    m4a = tmp_path / "out.m4a"
    r = subprocess.run(
        [sys.executable, "-c",
         "from saprobe_alac_tpu.cli import encode_main; raise SystemExit(encode_main())",
         "-frame", "1024", str(wav_in), str(m4a)],
        capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr

    out = tmp_path / "rt.pcm"
    r = run_cli("-format", "pcm", str(m4a), str(out))
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == array_to_pcm_bytes(fmt, pcm)


def test_cli_decodes_caf(tmp_path):
    from saprobe_alac_tpu.caf import build_caf

    cfg = make_config(frame_length=512)
    pcm = music_pcm(1024, 2, 16, seed=44)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    path = tmp_path / "clip.caf"
    path.write_bytes(build_caf(cfg, pkts))
    out = tmp_path / "out.pcm"
    r = run_cli("-format", "pcm", str(path), str(out))
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == expected_pcm_bytes(pcm, 16)
