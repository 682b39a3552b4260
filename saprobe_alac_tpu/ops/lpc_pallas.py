"""Pallas TPU kernel for the adaptive LPC reconstruction scan.

Alternative to ops/lpc.py's XLA implementation: the 32-deep sample history
and the adapting coefficient vector live as explicit rolling register state
carried through the sample loop (no per-step window slicing of the output
buffer), with the output written column-by-column.  Math is identical —
see ops/lpc.py for the derivation (predicated sign-walk via exclusive
suffix sums, Go fixed-width semantics).

Select with SAPROBE_ALAC_PALLAS=1 (ops/batch.py); differential tests run the
kernel in interpreter mode on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jaxint import I32, s, sext, sext16, sshr, u
from .lpc import _INT32_ORDERS, delta_decode

LANE_BLOCK = 256  # lanes per grid step


def _lpc_kernel(res_ref, order_ref, den_ref, cb_ref, ns_ref, coefs_ref, wrap_ref, out_ref):
    LB, F = res_ref.shape

    order = order_ref[:, 0]
    den = den_ref[:, 0]
    cb = cb_ref[:, 0]
    ns = ns_ref[:, 0]
    wrap16 = wrap_ref[:, 0] != 0
    is_fir = (order >= 1) & (order <= 30)

    den_half = jnp.where(
        den > 0, s(jax.lax.shift_left(u(jnp.ones(LB, I32)), u(jnp.maximum(den - 1, 0)))), 0
    )
    tap_idx = jax.lax.broadcasted_iota(I32, (LB, 32), 1)
    tap_mask = tap_idx < order[:, None]
    weight = order[:, None] - tap_idx
    # hist[:, k] = out[t-1-k]; top = out[t-1-order] = hist[:, order].
    top_onehot = tap_idx == order[:, None]

    out_ref[:, 0:1] = res_ref[:, 0:1]

    def body(t, carry):
        hist, coefs = carry
        active = is_fir & (t < ns)

        delta = res_ref[:, pl.ds(t, 1)][:, 0]
        top = jnp.sum(jnp.where(top_onehot, hist, 0), axis=1)

        acc = jnp.sum(jnp.where(tap_mask, coefs * (hist - top[:, None]), 0), axis=1, dtype=I32)
        sum1 = sshr(acc + den_half, den)

        warm = t <= order
        prev = hist[:, 0]
        val = jnp.where(
            warm, sext(delta + prev, cb), sext(delta + top + sum1, cb)
        )

        cur = out_ref[:, pl.ds(t, 1)][:, 0]
        newcol = jnp.where(active, val, cur)
        out_ref[:, pl.ds(t, 1)] = newcol[:, None]

        # Coefficient adaptation (predicated sign-walk; see ops/lpc.py).
        sign = jnp.sign(delta)
        dd = top[:, None] - hist
        sgn = jnp.sign(dd) * sign[:, None]
        contrib = jnp.where(tap_mask, weight * sshr(sgn * dd, den[:, None]), 0)
        suffix_inc = jnp.cumsum(
            contrib[:, ::-1].astype(jnp.uint32), axis=1
        )[:, ::-1].astype(I32)
        del0 = delta[:, None] - (suffix_inc - contrib)
        run = jnp.where(sign[:, None] > 0, del0 > 0, del0 < 0) & tap_mask
        adapt = active[:, None] & (sign != 0)[:, None] & ~warm[:, None] & run
        newc = coefs - sgn
        newc = jnp.where(wrap16[:, None], sext16(newc), newc)
        coefs = jnp.where(adapt, newc, coefs)

        # Roll history: hist'[k] = out[t-k] -> shift right, insert newcol at 0.
        hist = pltpu.roll(hist, 1, axis=1)
        hist = hist.at[:, 0].set(jnp.where(active, newcol, hist[:, 0]))
        # Lanes not active keep a consistent (unused) history.

        return hist, coefs

    hist0 = jnp.zeros((LB, 32), I32)
    hist0 = hist0.at[:, 0].set(res_ref[:, 0])
    jax.lax.fori_loop(1, F, body, (hist0, coefs_ref[:, :]), unroll=False)


@partial(jax.jit, static_argnames=("frame_length", "interpret"))
def lpc_batch_pallas(res, order, mode, den, cb, ns, coefs, frame_length, interpret=False):
    """Drop-in replacement for ops.lpc.lpc_batch using the Pallas kernel."""
    F = frame_length
    L = res.shape[0]

    # Special modes handled vectorially outside the kernel (as in lpc.py).
    pre = delta_decode(res, cb, ns)
    res = jnp.where((mode != 0)[:, None], pre, res)
    delta_out = delta_decode(res, cb, ns)
    out0 = jnp.where((order == 31)[:, None], delta_out, res)

    wrap16 = jnp.ones(L, dtype=I32)
    for o in _INT32_ORDERS:
        wrap16 = wrap16 * (order != o)

    # Pad lanes to the block size.
    Lp = ((L + LANE_BLOCK - 1) // LANE_BLOCK) * LANE_BLOCK
    pad = Lp - L

    def padded(x, fill=0):
        if pad == 0:
            return x
        shape = (pad,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=0)

    res_p = padded(res)
    out0_p = padded(out0)
    args1d = [padded(a)[:, None] for a in (order, den, cb, ns, wrap16)]
    coefs_p = padded(coefs)

    grid = (Lp // LANE_BLOCK,)

    out = pl.pallas_call(
        _lpc_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((LANE_BLOCK, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_BLOCK, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LANE_BLOCK, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Lp, F), jnp.int32),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(out0_p, *args1d[:1], *args1d[1:4], coefs_p, args1d[4])

    # NB: res (stream residuals) and out0 coincide for index 0 and for all
    # non-FIR lanes; FIR lanes read residuals from the aliased buffer before
    # overwriting each column, which is safe because column t is read
    # exactly at step t before being written.
    return out[:L]
