"""Pallas LPC kernel vs the XLA scan (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets
from saprobe_alac_tpu.encoder.encode import ChannelSpec
from saprobe_alac_tpu.ops.bitpack import pack_packets
from saprobe_alac_tpu.ops.epilogue import extract_escape
from saprobe_alac_tpu.ops.lpc import lpc_batch
from saprobe_alac_tpu.ops.lpc_pallas import lpc_batch_pallas
from saprobe_alac_tpu.ops.walk import walk_batch

from conftest import make_config, music_pcm

F = 128


def lanes_for(spec, seed=5):
    cfg = make_config(frame_length=F)
    pcm = music_pcm(F * 3, 2, 16, seed=seed)
    pkts = encode_packets(cfg, spec, pcm)
    words, sizes = pack_packets(pkts)
    B = len(pkts)
    w = walk_batch(jnp.asarray(words), jnp.asarray(sizes), F, 2, 16, 40, 10, 14)
    res = extract_escape(jnp.asarray(words), w.res, w.esc, w.esc_base, w.esc_cb, w.role, F, 2)
    L = B * 2
    return (
        res.reshape(L, F),
        w.order.reshape(L),
        w.mode.reshape(L),
        w.den.reshape(L),
        w.cb.reshape(L),
        jnp.repeat(w.ns, 2),
        w.coefs.reshape(L, 32),
    )


@pytest.mark.parametrize(
    "spec",
    [
        EncoderSpec(),
        EncoderSpec(channel=ChannelSpec(order=8)),
        EncoderSpec(channel=ChannelSpec(order=30)),
        EncoderSpec(channel=ChannelSpec(order=31)),
        EncoderSpec(channel=ChannelSpec(order=12, mode=1)),
        EncoderSpec(channel=ChannelSpec(order=0)),
        EncoderSpec(escape=True),
    ],
    ids=["o4", "o8", "o30", "o31", "o12m1", "o0", "esc"],
)
def test_pallas_matches_xla(spec):
    args = lanes_for(spec)
    a = np.asarray(lpc_batch(*args, F))
    b = np.asarray(lpc_batch_pallas(*args, F, interpret=True))
    assert np.array_equal(a, b)
