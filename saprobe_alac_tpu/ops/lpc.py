"""Phase 2: adaptive LPC reconstruction, vectorized over (packet, channel) lanes.

The recurrence is strictly serial per channel — out[i] depends on
out[i-1..i-order] AND on coefficients mutated at every prior sample — so it
cannot be an associative scan (SURVEY §2.3).  Parallelism comes from lanes:
L = batch * channels sequences advance in lockstep through one
jax.lax.fori_loop over samples.

The per-sample coefficient sign-walk with early exit (predictor.go:660-682)
becomes predicated arithmetic: tap contributions don't depend on the mutated
coefficients, so the walk's stop condition is evaluated from an exclusive
suffix-sum of contributions and every tap update is applied under a mask.

Special modes handled vectorially outside the loop:
  order 0  -> copy;  order 31 -> delta decode = wrapping cumsum + sign-extend
  mode > 0 -> delta pre-pass over the residuals (same cumsum identity:
              sext(sext(a)+b) == sext(a+b) mod 2^chan_bits)
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from .jaxint import I32, s, sext, sext16, sshr, u

#: FIR-scan implementation: "auto" uses the transposed Pallas kernel
#: (ops/lpc_kernel.py) on TPU and the XLA fori elsewhere; "xla"/"pallas"
#: force; "pallas_interpret" for CPU differential tests of the kernel.
_IMPL = os.environ.get("SAPROBE_LPC_IMPL", "auto")


def _kernel_impl(impl: str) -> bool:
    if impl in ("pallas", "pallas_interpret"):
        return True
    if impl == "xla":
        return False
    return jax.default_backend() == "tpu"

#: Orders whose reference kernels keep int32 (non-wrapping) coef accumulation
#: (predictor.go:99-618); all other orders wrap coefs to int16 per step.
_INT32_ORDERS = (4, 5, 6, 8)


def delta_decode(res_t, chan_bits, ns):
    """First-order delta decode: out[i] = sext(cumsum(res)[i]) for i >= 1.

    res_t: (F, L) int32 F-major; chan_bits, ns: (L,).  Rows at i >= ns are
    garbage (masked later).  out[0] = res[0] unsexted (predictor.go:53).
    """
    csum = jnp.cumsum(res_t.astype(jnp.uint32), axis=0).astype(jnp.int32)
    out = sext(csum, chan_bits[None, :])
    return jnp.where(jnp.arange(res_t.shape[0])[:, None] == 0, res_t, out)


def lpc_batch(res_t, order, mode, den, cb, ns, coefs, frame_length):
    """Thin unjitted wrapper forwarding the module-level ``_IMPL`` selection
    as a static jit argument (flipping it retraces — see walk.walk_batch)."""
    return _lpc_batch(res_t, order, mode, den, cb, ns, coefs, frame_length, _IMPL)


@partial(jax.jit, static_argnames=("frame_length", "impl", "rows_nb", "taps"))
def _lpc_batch(res_t, order, mode, den, cb, ns, coefs, frame_length, impl, rows_nb=None, taps=None):
    """Reconstruct samples from residuals for all lanes.

    res_t: (F, L) int32 entropy residuals, F-major (the walk kernel's row
           layout — escape lanes hold raw samples and have order == 0).
           With ``rows_nb`` set (kernel impls only), res_t is instead the
           walk kernel's RAW rows buffer (passes*F_pad_w, rows_nb, SL, 128)
           consumed in place by the FIR kernel — no merge select, no
           residual relayout, no (F, L) materialization anywhere.
    order, mode, den, cb, ns: (L,) int32.
    coefs: (L, 32) int32 (int16 range), zero beyond each lane's order.

    Returns (F, L) int32 reconstructed channel samples, same layout — the
    Pallas FIR kernel both reads and writes F-major, so the hot path has no
    transpose anywhere; only the XLA scan fallback (CPU backends) converts
    to lane-major and back around its dynamic-slice machinery.
    """
    F = frame_length
    L = order.shape[0]

    # Two-stage mode: delta pre-pass over the stream residuals
    # (decoder.go:307-309: UnpcBlock in-place with order 31).  The Pallas
    # kernel runs it in-kernel as a carried prefix (~3 vector ops/row); the
    # XLA fallback keeps the gated (F, L) cumsum pass (~1.1 ms at production
    # shapes, skipped when no lane needs it — real encoders emit mode == 0).
    if not _kernel_impl(impl):
        res_t = jax.lax.cond(
            jnp.any(mode != 0),
            lambda r: jnp.where((mode != 0)[None, :], delta_decode(r, cb, ns), r),
            lambda r: r,
            res_t,
        )

    # Vectorized special orders.
    is_delta = order == 31
    is_fir = (order >= 1) & (order <= 30)

    # den in [0,15]: den_half = 1 << (den-1) for den > 0 (predictor.go:48-51).
    den_half = jnp.where(
        den > 0, s(jax.lax.shift_left(u(jnp.ones(L, I32)), u(jnp.maximum(den - 1, 0)))), 0
    )

    wrap16 = jnp.ones(L, dtype=bool)
    for o in _INT32_ORDERS:
        wrap16 = wrap16 & (order != o)

    if _kernel_impl(impl):
        from .lpc_kernel import lpc_fir_pallas

        # Multiple of 16 = a whole PAIR of 8-row DMA chunks (the kernel's
        # chunk loop runs two at a time, double-buffered staging).
        F_pad = ((F + 15) // 16) * 16
        if rows_nb is not None:
            # Direct consumption of the walk kernel's raw rows buffer: its
            # lane blocking fixes LB, and L is already whole blocks (the
            # fused layout is only selected when B % 128 == 0).
            if res_t.shape[2] == 16:
                # The walk runs 2048-lane blocks (SL=16) to halve its
                # sequential grid steps, but the FIR kernel measured faster
                # at SL=8 (1.02 vs 1.12 ms at B=2048 F=4096 on v5e).  The
                # (P, nb, 16, 128) buffer IS (P, 2*nb, 8, 128) in linear
                # lane order (lane = nb*2048 + sl*128 + ln), so the view is
                # a free row-major reshape, no relayout.
                res_t = res_t.reshape(res_t.shape[0], -1, 8, 128)
                rows_nb *= 2
            LB = res_t.shape[2] * 128
            L_pad = L
            assert L % (rows_nb * LB) == 0, (L, rows_nb, LB)
        else:
            # Full (8, 128) vregs need 1024-lane blocks (same win as the walk
            # kernel: half-empty vregs double the sequential grid steps).
            LB = (
                1024
                if L % 1024 == 0
                else 512 if L % 512 == 0 else (256 if L % 256 == 0 else 128)
            )
            L_pad = ((L + LB - 1) // LB) * LB

        def padL(x, fill=0):
            if L_pad == L:
                return x
            pad_shape = (L_pad - L,) + x.shape[1:]
            return jnp.concatenate([x, jnp.full(pad_shape, fill, x.dtype)])

        res_k = res_t
        if rows_nb is None:
            if F_pad != F:
                res_k = jnp.concatenate(
                    [res_k, jnp.zeros((F_pad - F, L), I32)], axis=0
                )
            if L_pad != L:
                res_k = jnp.concatenate(
                    [res_k, jnp.zeros((F_pad, L_pad - L), I32)], axis=1
                )
        # Order-31 delta lanes ride the kernel as class 2: a fixed
        # order-1 / coef=1 / den=0 FIR with adaptation disabled is exactly
        # the first-order delta recurrence (predictor.go:63-73; sext is a
        # ring hom mod 2^cb so the stepwise sext chain equals the sexted
        # cumsum).  Order-0/escape lanes already pass through in-kernel,
        # so no post-kernel select pass is needed at all — that select and
        # the gated delta_decode cond each cost a full (F, L) HBM pass.
        fir_code = is_fir.astype(I32) + 2 * is_delta.astype(I32)
        order_k = jnp.where(is_delta, 1, order)
        den_k = jnp.where(is_delta, 0, den)
        e0 = (jnp.arange(32, dtype=I32) == 0).astype(I32)
        coefs_k = jnp.where(is_delta[:, None], e0[None, :], coefs)
        coefs_t = padL(coefs_k).T  # (32, L_pad)
        kargs = (
            res_k,
            padL(fir_code),
            padL(order_k),
            padL(den_k),
            padL(jnp.maximum(cb, 1)),
            padL(ns),
            padL(wrap16),
            padL(mode),
        )
        kw = dict(
            F=F if rows_nb is not None else F_pad,
            LB=LB,
            interpret=impl == "pallas_interpret",
            src_nb=rows_nb,
        )

        # Real encoders sit at orders 4-8 (the reference hand-unrolls
        # exactly those, predictor.go:99-618); a 9-tap kernel variant runs
        # ~3x fewer tap ops.  With ``taps`` static (the batch decoder's
        # 9-then-retry-at-32 protocol; see _decode_core's `wide` flag) the
        # variant is picked at trace time — the on-device lax.cond dispatch
        # this replaces moved the big residual/output buffers through the
        # conditional's boundary copies (~0.35 ms at B=2048 F=4096,
        # hack/trace_top.py).  taps=None keeps the cond for standalone
        # callers with no retry protocol.
        if taps == 9:
            out_t = lpc_fir_pallas(*kargs, coefs_t[:9], taps=9, **kw)
        elif taps == 32:
            out_t = lpc_fir_pallas(*kargs, coefs_t, taps=32, **kw)
        else:
            max_fir = jnp.max(jnp.where(is_fir, order, 0))
            out_t = jax.lax.cond(
                max_fir <= 8,
                lambda: lpc_fir_pallas(*kargs, coefs_t[:9], taps=9, **kw),
                lambda: lpc_fir_pallas(*kargs, coefs_t, taps=32, **kw),
            )
        return out_t[:F, :L]

    # --- XLA scan fallback (CPU backends / tests): lane-major internally ---
    out0_t = jax.lax.cond(
        jnp.any(is_delta),
        lambda r: jnp.where(is_delta[None, :], delta_decode(r, cb, ns), r),
        lambda r: r,
        res_t,
    )
    res = res_t.T
    out0 = out0_t.T

    # FIR lanes run the serial scan.  History is kept in a left-padded buffer
    # so the 32-wide window slice never needs branching.
    PAD = 32
    outP = jnp.zeros((L, PAD + F), I32)
    outP = jax.lax.dynamic_update_slice(outP, out0, (0, PAD))

    tap_idx = jnp.arange(32, dtype=I32)[None, :]  # k
    weight = order[:, None] - tap_idx  # adaptation weight for tap k
    tap_mask = tap_idx < order[:, None]

    any_fir = jnp.any(is_fir)

    def scan_body(t, carry):
        outP, coefs = carry
        active = is_fir & (t < ns)

        # W[:, j] = out[t-32+j]; reversed: WR[:, k] = out[t-1-k], k in [0,31].
        W = jax.lax.dynamic_slice(outP, (0, t), (L, PAD))
        WR = W[:, ::-1]
        top = jnp.take_along_axis(WR, order[:, None], axis=1)[:, 0]  # out[t-1-order]

        # Prediction (predictor.go:647-656): wrapping int32 dot.
        acc = jnp.sum(coefs * (WR - top[:, None]) * tap_mask, axis=1, dtype=I32)
        sum1 = sshr(acc + den_half, den)

        delta = jax.lax.dynamic_slice(res, (0, t), (L, 1))[:, 0]
        warm = t <= order
        prev = WR[:, 0]
        fir_val = sext(delta + top + sum1, cb)
        warm_val = sext(delta + prev, cb)
        val = jnp.where(warm, warm_val, fir_val)

        cur = jax.lax.dynamic_slice(outP, (0, PAD + t), (L, 1))[:, 0]
        newcol = jnp.where(active, val, cur)
        outP = jax.lax.dynamic_update_slice(outP, newcol[:, None], (0, PAD + t))

        # Coefficient adaptation (predictor.go:660-682), predicated walk.
        sign = jnp.sign(delta)
        dd = top[:, None] - WR  # dd_k = top - out[t-1-k]
        sgn = jnp.sign(dd) * sign[:, None]
        contrib = weight * sshr(sgn * dd, den[:, None])  # int32 wrap
        contrib = jnp.where(tap_mask, contrib, 0)
        # Exclusive suffix sum: T_k = sum of contribs for taps > k
        # (walk order is k = order-1 down to 0).
        suffix_inc = jnp.cumsum(contrib[:, ::-1].astype(jnp.uint32), axis=1)[:, ::-1].astype(I32)
        T = suffix_inc - contrib
        # Tap k executes iff every earlier step left del0 on sign's side of 0
        # (branch-exact: avoid sign*x, which wraps at INT32_MIN).
        del0 = delta[:, None] - T
        run = jnp.where(sign[:, None] > 0, del0 > 0, del0 < 0) & tap_mask
        adapt = active[:, None] & (sign != 0)[:, None] & ~warm[:, None] & run
        newc = coefs - sgn
        newc = jnp.where(wrap16[:, None], sext16(newc), newc)
        coefs = jnp.where(adapt, newc, coefs)

        return outP, coefs

    def run_scan(args):
        outP, coefs = args
        return jax.lax.fori_loop(1, F, scan_body, (outP, coefs))

    outP, _ = jax.lax.cond(any_fir, run_scan, lambda a: a, (outP, coefs))

    return jax.lax.dynamic_slice(outP, (0, PAD), (L, F)).T
