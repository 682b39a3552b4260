"""Phase 3: fully parallel finishing stages.

Escape raw-sample extraction and shift-buffer extraction are fixed-stride bit
gathers (no serial dependency); stereo un-decorrelation, shift re-insert,
20-bit normalization, and MPEG->SMPTE channel remap are element-wise
(matrix.go semantics throughout).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .jaxint import I32, U32, s, sext, sshr, u
from .streambits import vread


@partial(jax.jit, static_argnames=("frame_length", "num_channels"))
def extract_escape(words, res, esc, esc_base, esc_cb, role, frame_length, num_channels):
    """Fill escape channels' planes with raw sign-extended samples.

    Escape data layout (decoder.go:326-345, 507-535): SCE = consecutive
    chan_bits-wide values; CPE = U/V interleaved.  Values land in the residual
    planes with order forced 0 so phase 2 passes them through.
    """
    B = res.shape[0]
    F = frame_length
    C = num_channels
    i = jnp.arange(F, dtype=I32)[None, :]
    out = res
    for c in range(C):
        active = esc[:, c] == 1
        cb = esc_cb[:, c][:, None]
        rl = role[:, c][:, None]
        # Mono: stride cb.  Pair U: stride 2cb phase 0.  Pair V: stride 2cb, phase cb.
        stride = jnp.where(rl == 0, cb, 2 * cb)
        phase = jnp.where(rl == 2, cb, 0)
        pos = esc_base[:, c][:, None] + i * stride + phase
        vals = sext(vread(words, pos, jnp.maximum(cb, 1)), cb)
        plane = jnp.where(active[:, None], vals, out[:, c * F : (c + 1) * F])
        out = jax.lax.dynamic_update_slice(out, plane, (0, c * F))
    return out


@partial(jax.jit, static_argnames=("frame_length", "num_channels"))
def extract_shift(words, shift_base, bs, role, frame_length, num_channels):
    """Extract shift-buffer LSB values: (B, C, F) int32.

    Mono channels read consecutive width-bit values; pairs are interleaved
    U/V (decoder.go:314-321, 492-502).
    """
    B = shift_base.shape[0]
    F = frame_length
    C = num_channels
    i = jnp.arange(F, dtype=I32)[None, :]
    planes = []
    for c in range(C):
        width = bs[:, c][:, None] * 8
        rl = role[:, c][:, None]
        stride = jnp.where(rl == 0, width, 2 * width)
        phase = jnp.where(rl == 2, width, 0)
        pos = shift_base[:, c][:, None] + i * stride + phase
        vals = vread(words, pos, jnp.maximum(width, 1))
        planes.append(jnp.where((bs[:, c] > 0)[:, None], vals, 0))
    return jnp.stack(planes, axis=1)


@partial(jax.jit, static_argnames=("frame_length", "num_channels", "depth"))
def finish(mix, shift_vals, bs, mixbits, mixres, role, out_chan, filled, frame_length, num_channels, depth):
    """Unmix pairs, re-insert shift bits, normalize 20-bit, remap channels.

    mix: (B, C, F) reconstructed channel values (bitstream channel order).
    ``filled`` masks slots no element decoded into (early END leaves those
    output channels zero, matching the reference's zeroed output buffer).
    Returns (B, F, C) int32 output samples in SMPTE order.
    """
    B = mix.shape[0]
    F = frame_length
    C = num_channels

    # Stereo un-decorrelation (matrix.go:38-49), wrapping int32:
    #   left = u + v - ((mixres*v) >> mixbits); right = left - v
    # Channels live as a Python list of (B, F) planes so every update is a
    # pure select — an .at[:, c].set on the (B, C, F) stack lowers to a full
    # buffer copy + dynamic-update-slice (~1 ms each at B=2048 F=4096).
    chans = [mix[:, c] for c in range(C)]
    for c in range(C - 1):
        is_u = role[:, c] == 1
        uvals = chans[c]
        vvals = chans[c + 1]
        mres = mixres[:, c][:, None]
        mbits = mixbits[:, c][:, None]
        corr = sshr(mres * vvals, mbits)
        left = jnp.where((is_u[:, None]) & (mres != 0), uvals + vvals - corr, uvals)
        right = jnp.where((is_u[:, None]) & (mres != 0), left - vvals, vvals)
        chans[c] = jnp.where(is_u[:, None], left, chans[c])
        chans[c + 1] = jnp.where(is_u[:, None], right, chans[c + 1])

    # Shift re-insert: (val << shift) | shiftbits (matrix.go:129-131).  Only
    # the 24/32-bit writers apply it; 16/20-bit ignore bytesShifted
    # (matrix.go:30-105 take no shift buffer).
    if depth in (24, 32):
        for c in range(C):
            shift = bs[:, c, None] * 8
            shifted = s(
                jax.lax.shift_left(u(chans[c]), u(jnp.minimum(shift, 31)))
            ) | shift_vals[:, c]
            chans[c] = jnp.where(bs[:, c, None] > 0, shifted, chans[c])

    # 20-bit output is stored << 4 (matrix.go:91-101).
    if depth == 20:
        chans = [s(jax.lax.shift_left(u(p), U32(4))) for p in chans]

    # MPEG -> SMPTE remap via recorded out_chan (decoder.go:55-64).  Built as
    # selects per output position rather than a scatter (TPU scatters over a
    # per-lane minor index serialize); out_chan is a permutation per lane, so
    # each output channel has at most one source.  Later slots win on
    # (malformed) duplicates, matching the former scatter's write order; slots
    # without a decoded element leave their SMPTE positions zero, matching the
    # reference's zeroed output buffer.
    planes = []
    for c_out in range(C):
        acc = jnp.zeros((B, F), I32)
        for c in range(C):
            sel = (filled[:, c] != 0) & (out_chan[:, c] == c_out)
            acc = jnp.where(sel[:, None], chans[c], acc)
        planes.append(acc)
    return jnp.stack(planes, axis=-1)


@partial(jax.jit, static_argnames=("depth",))
def pack_output(out, depth):
    """Device-side interleaved little-endian PCM byte packing.

    Keeps the device->host transfer at exactly the PCM payload size
    (16-bit: int16 lanes; 20/24-bit: 3-byte triples as uint8; 32-bit: int32).
    Matches the matrix.go writers' byte layout.
    """
    B, F, C = out.shape
    flat = out.reshape(B, F * C)
    if depth == 16:
        return flat.astype(jnp.int16)
    if depth in (20, 24):
        u8 = jnp.stack(
            [
                (flat & 0xFF).astype(jnp.uint8),
                (sshr(flat, 8) & 0xFF).astype(jnp.uint8),
                (sshr(flat, 16) & 0xFF).astype(jnp.uint8),
            ],
            axis=-1,
        )
        return u8.reshape(B, F * C * 3)
    return flat  # 32-bit: int32 little-endian on host
