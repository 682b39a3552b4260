"""Packet-axis data parallelism over a device mesh.

ALAC packets are fully self-contained (own headers, own coefficients, decoder
state reset per packet — reference decode.go:130-187), so multi-chip scaling
is pure data parallelism: shard the batch axis over the mesh and run the
single-chip pipeline per shard under jax.shard_map.  No collectives are
required for correctness (SURVEY §2.4); the only cross-device traffic is the
optional output gather, which rides ICI via the output sharding.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


from ..config import PacketConfig
from ..ops.batch import JaxBatchDecoder, _bucket, _decode_batch
from ..ops.bitpack import pack_packets


PACKET_AXIS = "packets"


def make_packet_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    """A 1-D mesh with every device on the packet axis."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (PACKET_AXIS,))


class ShardedBatchDecoder(JaxBatchDecoder):
    """Batch decoding sharded over a device mesh (packet-axis DP)."""

    def __init__(self, config: PacketConfig, mesh: Mesh | None = None):
        super().__init__(config)
        self.mesh = mesh if mesh is not None else make_packet_mesh()
        self._n = self.mesh.devices.size

        self._fns = {}

    def _fn(self, taps: int):
        """Sharded executable per taps variant (9 steady-state / 32 retry),
        built lazily and cached."""
        if taps not in self._fns:
            from ..ops import lpc as _lpc_mod
            from ..ops import walk as _walk_mod

            cfg = self.config
            single = partial(
                _decode_batch,
                frame_length=cfg.frame_length,
                num_channels=cfg.num_channels,
                depth=cfg.bit_depth,
                pb=cfg.pb,
                mb=cfg.mb,
                kb=cfg.kb,
                # Impl selections bind at first use: build a fresh decoder
                # after flipping the module globals (they are static jit args).
                walk_impl=_walk_mod._IMPL,
                lpc_impl=_lpc_mod._IMPL,
                taps=taps,
            )
            sharded = jax.shard_map(
                single,
                mesh=self.mesh,
                in_specs=(P(PACKET_AXIS, None), P(PACKET_AXIS)),
                out_specs=(
                    P(PACKET_AXIS, None), P(PACKET_AXIS), P(PACKET_AXIS),
                    P(PACKET_AXIS),
                ),
                # Loop carries are seeded from replicated literals; skip the
                # varying-manual-axes check (everything here is lane-local).
                check_vma=False,
            )
            self._fns[taps] = jax.jit(sharded)
        return self._fns[taps]

    def decode_async(self, packets: Sequence[bytes], taps: int = 9):
        words_np, sizes_np = pack_packets(list(packets))
        B = len(packets)
        n = self._n
        Bb = max(_bucket(B), n)
        Bb = ((Bb + n - 1) // n) * n  # divisible by mesh size
        Wb = _bucket(words_np.shape[1], floor=16)
        words = np.zeros((Bb, Wb), dtype=np.int32)
        words[:B, : words_np.shape[1]] = words_np
        sizes = np.zeros(Bb, dtype=np.int32)
        sizes[:B] = sizes_np

        in2 = NamedSharding(self.mesh, P(PACKET_AXIS, None))
        in1 = NamedSharding(self.mesh, P(PACKET_AXIS))
        words_d = jax.device_put(jnp.asarray(words), in2)
        sizes_d = jax.device_put(jnp.asarray(sizes), in1)
        return self._fn(taps)(words_d, sizes_d)
