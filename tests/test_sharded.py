"""Multi-chip scale-out: shard_map over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from saprobe_alac_tpu.codec import decode_packet as oracle
from saprobe_alac_tpu.encoder import EncoderSpec, encode_packets
from saprobe_alac_tpu.parallel import ShardedBatchDecoder, make_packet_mesh

from conftest import make_config, music_pcm

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")


def test_sharded_bit_exact_8_devices():
    mesh = make_packet_mesh(jax.devices())
    assert mesh.devices.size == len(jax.devices())
    cfg = make_config(frame_length=128)
    pcm = music_pcm(128 * 12 - 9, 2, 16, seed=17)  # partial last packet
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    dec = ShardedBatchDecoder(cfg, mesh=mesh)
    got = dec.decode_packets(pkts)
    assert got == [oracle(cfg, p)[0] for p in pkts]


def test_sharded_subset_mesh():
    mesh = make_packet_mesh(jax.devices()[:4])
    cfg = make_config(frame_length=128)
    pcm = music_pcm(128 * 5, 2, 16, seed=18)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    dec = ShardedBatchDecoder(cfg, mesh=mesh)
    assert dec.decode_packets(pkts) == [oracle(cfg, p)[0] for p in pkts]


def test_graft_entry_hooks():
    """The driver's entry() compile check and multichip dryrun must pass."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)

    ge.dryrun_multichip(min(8, len(jax.devices())))
