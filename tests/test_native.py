"""Differential conformance: C++ native core vs the scalar oracle.

The native core is the host runtime fast path; it must agree bit-exactly
with the oracle on every configuration and raise the same error taxonomy.
"""

import numpy as np
import pytest

from saprobe_alac_tpu import DecodeError, PacketDecoder, native
from saprobe_alac_tpu.codec import decode_packet as oracle
from saprobe_alac_tpu.encoder import EncoderSpec, encode_packet, encode_packets
from saprobe_alac_tpu.encoder.encode import ChannelSpec

from conftest import make_config, music_pcm

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


@pytest.mark.parametrize("depth", (16, 20, 24, 32))
@pytest.mark.parametrize("channels", (1, 2, 3, 6, 8))
def test_depth_channel_matrix(depth, channels):
    cfg = make_config(depth=depth, channels=channels, frame_length=160)
    pcm = music_pcm(160, channels, depth, seed=depth + channels)
    pkt = encode_packet(cfg, EncoderSpec(), pcm)
    assert native.decode_packet(cfg, pkt) == oracle(cfg, pkt)[0]


@pytest.mark.parametrize(
    "spec",
    [
        EncoderSpec(escape=True),
        EncoderSpec(bytes_shifted=1),
        EncoderSpec(bytes_shifted=2),
        EncoderSpec(mix_res=0),
        EncoderSpec(mix_res=-3, mix_bits=2),
        EncoderSpec(channel=ChannelSpec(order=0)),
        EncoderSpec(channel=ChannelSpec(order=8)),
        EncoderSpec(channel=ChannelSpec(order=30)),
        EncoderSpec(channel=ChannelSpec(order=31)),
        EncoderSpec(channel=ChannelSpec(order=12, mode=1)),
    ],
    ids=["esc", "bs1", "bs2", "mix0", "mixneg", "o0", "o8", "o30", "o31", "o12m1"],
)
@pytest.mark.parametrize("depth", (16, 24, 32))
def test_spec_matrix(spec, depth):
    cfg = make_config(depth=depth, channels=2, frame_length=160)
    pcm = music_pcm(160, 2, depth, seed=depth)
    pkt = encode_packet(cfg, spec, pcm)
    assert native.decode_packet(cfg, pkt) == oracle(cfg, pkt)[0]


def test_partial_silence_noise():
    cfg = make_config(frame_length=256)
    for pcm in (
        music_pcm(1000, 2, 16, seed=1),  # includes a partial final frame
        np.zeros((512, 2), dtype=np.int64),
        music_pcm(512, 2, 16, seed=2, tonality=0.0),
    ):
        for pkt in encode_packets(cfg, EncoderSpec(), pcm):
            assert native.decode_packet(cfg, pkt) == oracle(cfg, pkt)[0]


def test_threaded_batch():
    cfg = make_config(frame_length=256)
    pcm = music_pcm(256 * 20, 2, 16, seed=3)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    out, lens, errs = native.decode_batch(cfg, pkts, n_threads=4)
    assert (errs == 0).all()
    got = b"".join(out[i, : lens[i]].tobytes() for i in range(len(pkts)))
    assert got == b"".join(oracle(cfg, p)[0] for p in pkts)


def test_error_taxonomy():
    cfg = make_config(frame_length=4096)
    pcm = music_pcm(4096, 2, 16, seed=4)
    pkt = encode_packet(cfg, EncoderSpec(), pcm)
    with pytest.raises(DecodeError):
        native.decode_packet(cfg, pkt[: len(pkt) // 4])
    with pytest.raises(DecodeError):
        native.decode_packet(cfg, b"")


def test_packet_decoder_auto_backend():
    cfg = make_config(frame_length=256)
    dec = PacketDecoder(cfg)  # auto -> native here
    assert dec.backend == "native"
    pcm = music_pcm(256, 2, 16, seed=5)
    pkt = encode_packet(cfg, EncoderSpec(), pcm)
    assert dec.decode_packet(pkt) == oracle(cfg, pkt)[0]


def test_streaming_facade_native_batched():
    """Decoder(backend='native') batches through the threaded C++ core."""
    import io

    from saprobe_alac_tpu import new_decoder
    from saprobe_alac_tpu.encoder import EncoderSpec, build_m4a, encode_packets

    from conftest import expected_pcm_bytes

    cfg = make_config(frame_length=512)
    pcm = music_pcm(512 * 5 - 100, 2, 16, seed=88)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    spp = [min(512, pcm.shape[0] - i * 512) for i in range(len(pkts))]
    m4a = build_m4a(cfg, pkts, spp)
    dec = new_decoder(io.BytesIO(m4a), backend="native", batch_size=3)
    assert dec.read() == expected_pcm_bytes(pcm, 16)
