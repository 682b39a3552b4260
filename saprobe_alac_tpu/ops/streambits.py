"""Vectorized bit-stream reads over packed (B, W) word batches.

Each lane owns one packet's words; all reads are per-lane gathers at per-lane
bit positions.  Word indices are clamped into the zero guard region so reads
past a packet's end see zeros — the same observable behavior as the reference
BitBuffer's zero padding (bitbuffer.go:28-32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .jaxint import I32, U32, s, u


def gather_word(words, wi):
    """words: (B, W) int32; wi: (B,) or (B, K) word indices (clamped)."""
    wmax = words.shape[1] - 1
    wic = jnp.clip(wi, 0, wmax)
    if wic.ndim == 1:
        return jnp.take_along_axis(words, wic[:, None], axis=1)[:, 0]
    return jnp.take_along_axis(words, wic, axis=1)


def window32(words, bitpos):
    """The true 32 stream bits starting at ``bitpos`` (int32 bit pattern).

    Replaces the reference's ``read32(bytePos) << (bitPos&7)`` zero-filled
    window; equivalent for all decode uses (see codec/golomb.py docstring).
    """
    bitpos = jnp.asarray(bitpos, I32)
    wi = jax.lax.shift_right_arithmetic(bitpos, 5)
    sh = u(bitpos & 31)
    w0 = u(gather_word(words, wi))
    w1 = u(gather_word(words, wi + 1))
    win = jax.lax.shift_left(w0, sh) | jax.lax.shift_right_logical(
        jax.lax.shift_right_logical(w1, U32(1)), u(31 - (bitpos & 31))
    )
    return s(win)


def vread(words, bitpos, n):
    """Exact right-aligned read of n (1..32) bits at per-lane bit positions.

    ``n`` may be a Python int or a per-lane array.
    """
    win = u(window32(words, bitpos))
    n = jnp.asarray(n, I32)
    shift = u(jnp.broadcast_to(32 - n, win.shape).astype(I32))
    return s(jax.lax.shift_right_logical(win, shift))
