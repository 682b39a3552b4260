"""Pallas TPU kernel: dense-consumption adaptive Golomb-Rice entropy ENCODE.

The XLA device encoder (ops/encode_device.py `_entropy_encode`) is a lockstep
while-loop whose every codeword is two scatter-adds into a (B, W) word buffer
— per-lane positioned writes, the exact operation the VPU cannot do (see
ops/walk_kernel.py's header for the decode-side statement of the problem).
At F=4096 the measured cost is ~21 s per 1024-lane batch: the scatters
dominate everything else by orders of magnitude.

This kernel is the decode walk kernel run in reverse.  The decode side's
insight — make the divergent axis DENSE and uniform, keep the per-lane
positioned axis in registers, and bridge register<->HBM with a hierarchy of
one-hot layers — maps onto encode as:

  input   residual row t is CONSUMED by every lane at step t (a lane whose
          cursor jumped ahead over a zero run idles until the row index
          catches up), so input rows stream from HBM at uniform offsets —
          the mirror image of the decode kernel's dense emission schedule;
  output  bits append at a per-lane cursor through a 4-level hierarchy:
            acc      32-bit accumulator register (plain vector ALU),
            window   16 word registers = the 2 in-flight output blocks; a
                     completed word lands via a 16-way one-hot select,
            l1out    64-block-slot VMEM scratch addressed modulo 64; a
                     completed 8-word block lands via a bounded-range
                     one-hot row scan (the inverse of refill_window),
            HBM      chunk-streamed read-OR-write drains at a global block
                     watermark (the inverse of l1_fill): for every chunk
                     word row the source l1out row is LANE-UNIFORM —
                     ((gw>>3) & 63)*8 + (gw&7) — so the drain is a pure
                     row remap with no per-lane masking.  Correct because
                     the watermark `dbase` bounds live slot reuse: for any
                     block b in [dbase, dend) every lane's slot b%64 holds
                     either block b or zero (finished lanes' later slots
                     were cleared by earlier drains; live lanes can't be 64
                     blocks ahead — see _FREEZE).
          A lane that would wrap the ring (divergence > ~15 kbit from the
          slowest live lane) is frozen with an overflow flag and the host
          re-encodes its packet — pathological for same-config batches.

Behavioral parity: the emitted stream is bit-identical to
encode_device._entropy_encode (itself the inverse of golomb.go:112-253):
adaptive k from the mean, 9-one escape prefix + max_size-bit raw suffix,
interleaved zero-run codes with the (mean<<2) < 512 trigger, uint32-wrap
mean update, zmode handling.  The unsigned quotient is computed by compare
ladder (q = #{c in 1..8 : value >=u c*m}) because Mosaic has no vector
integer divide; this requires 9*m to fit in int32, i.e. kb <= 25 — the
dispatcher falls back to XLA beyond that (real cookies use kb ~14).

Differential coverage: tests/test_encode_kernel.py (vs the XLA lockstep
encoder bit for bit, plus decode round-trips).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .walk_kernel import _clz, _lg3a, _s, _shl, _u, _ushr

I32 = jnp.int32
U32 = jnp.uint32

_BLK = 8  # words per output block
_K = 8  # input rows per group (DMA granularity)
_NSLOT = 64  # l1out block slots (modulo-addressed)
_CW = 128  # drain chunk: words per DMA (16 blocks)
#: Freeze threshold: a lane this many blocks past the drain watermark would
#: wrap the 64-slot ring into undrained slots.  4 blocks of headroom over
#: the per-group worst case (8 rows x 66 bits < 3 blocks).
_FREEZE = 60
#: Drain trigger: keep >= one group pair of deposit headroom below _FREEZE.
_PRESS = 48
#: Max usable kb: the quotient ladder compares value >=u 9*(2^kb - 1).
MAX_KB = 25


def _encode_kernel(
    n_hbm,  # (F_pad, NB, SL, 128) int32 HBM (ANY): zigzagged residuals
    zr_hbm,  # (F_pad, NB, SL, 128) int32 HBM (ANY): zero-run length at t+1
    out_in,  # (W_pad, NB, SL, 128) int32 HBM (ANY): zeroed, aliased to out
    act_ref,  # (1, SL, 128)
    pb_ref,  # (1, SL, 128)
    maxsz_ref,  # (1, SL, 128)
    ns_ref,  # (1, SL, 128)
    mb_ref,  # (1, SL, 128)
    out_hbm,  # (W_pad, NB, SL, 128) OUTPUT in HBM (ANY), aliases out_in
    bits_out,  # (1, SL, 128)
    ovf_out,  # (1, SL, 128)
    stage_na,  # VMEM (_K, SL, 128) staged n rows, even groups
    stage_nb,  # VMEM (_K, SL, 128) staged n rows, odd groups
    stage_za,  # VMEM (_K, SL, 128) staged zrun rows, even groups
    stage_zb,  # VMEM (_K, SL, 128) staged zrun rows, odd groups
    chunk_ref,  # VMEM (_CW, SL, 128) drain chunk window
    l1_ref,  # VMEM (_NSLOT * _BLK, SL, 128) block-slot scratch
    sem_na,
    sem_nb,
    sem_za,
    sem_zb,
    sem_chunk,
    *,
    kb: int,
    F: int,
    W_pad: int,
    LB: int,
    interpret: bool = False,
):
    SL = LB // 128
    pid = pl.program_id(0)
    del out_in  # aliased storage; all access goes through out_hbm

    def vec(x):
        return x.reshape(SL, 128)

    act0 = vec(act_ref[...])
    pbl = vec(pb_ref[...])
    max_size = vec(maxsz_ref[...])
    ns = vec(ns_ref[...])
    mb0 = vec(mb_ref[...])

    z = jnp.zeros((SL, 128), I32)
    wb_mask = (1 << kb) - 1 if kb < 32 else -1

    l1_ref[...] = jnp.zeros((_NSLOT * _BLK, SL, 128), I32)

    NG = (F + 2 * _K - 1) // (2 * _K) * 2  # groups, rounded to a pair

    # ---- input streaming (double-buffered by group parity) ----
    def start_in(g, sn, sz):
        pltpu.make_async_copy(n_hbm.at[pl.ds(g * _K, _K), pid], sn, sem_na).start()
        pltpu.make_async_copy(zr_hbm.at[pl.ds(g * _K, _K), pid], sz, sem_za).start()

    def start_in_b(g, sn, sz):
        pltpu.make_async_copy(n_hbm.at[pl.ds(g * _K, _K), pid], sn, sem_nb).start()
        pltpu.make_async_copy(zr_hbm.at[pl.ds(g * _K, _K), pid], sz, sem_zb).start()

    def wait_in(g, sn, sz):
        pltpu.make_async_copy(n_hbm.at[pl.ds(g * _K, _K), pid], sn, sem_na).wait()
        pltpu.make_async_copy(zr_hbm.at[pl.ds(g * _K, _K), pid], sz, sem_za).wait()

    def wait_in_b(g, sn, sz):
        pltpu.make_async_copy(n_hbm.at[pl.ds(g * _K, _K), pid], sn, sem_nb).wait()
        pltpu.make_async_copy(zr_hbm.at[pl.ds(g * _K, _K), pid], sz, sem_zb).wait()

    if not interpret:
        start_in(0, stage_na, stage_za)
        start_in_b(1, stage_nb, stage_zb)

    # ---- output deposit helpers ----
    def deposit_word(regs, mask, word, idx):
        """regs[idx] = word for masked lanes; idx per-lane in [0, 16)."""
        out = []
        for j in range(16):
            out.append(jnp.where(mask & (idx == z + j), word, regs[j]))
        return out

    def block_deposit(regs, mask, blk):
        """Move the completed block `blk` (per-lane) from the register
        window to l1out slot blk % 64 via a bounded one-hot row scan, then
        clear the moved half of the window for those lanes."""
        slot = blk & (_NSLOT - 1)
        par = (blk & 1) == 1
        breg = [jnp.where(par, regs[8 + w], regs[w]) for w in range(_BLK)]
        new = jnp.stack(breg).reshape(_BLK, SL, 128)
        lo = jnp.maximum(jnp.min(jnp.where(mask, slot, _NSLOT)), 0)
        hi = jnp.minimum(jnp.max(jnp.where(mask, slot, -1)), _NSLOT - 1)

        def row(nb, _):
            m = (mask & (slot == nb)).astype(I32).reshape(1, SL, 128)
            cur = l1_ref[pl.ds(nb * _BLK, _BLK)]
            l1_ref[pl.ds(nb * _BLK, _BLK)] = jnp.where(m == 1, new, cur)
            return 0

        jax.lax.fori_loop(lo, hi + 1, row, 0)
        out = []
        for j in range(16):
            halfm = mask & (par if j >= 8 else ~par)
            out.append(jnp.where(halfm, 0, regs[j]))
        return out

    def drain(dbase, dend):
        """Stream completed blocks [dbase, dend) to HBM through chunk-sized
        read-OR-write DMAs, then clear their l1out slots.  Whole chunks
        only; returns the new watermark.  Degenerates to a no-op when
        dend <= dbase (no lax.cond needed)."""
        c0 = (dbase * _BLK) // _CW  # dbase*8 is always a multiple of _CW
        c1 = (jnp.maximum(dend, dbase) * _BLK) // _CW

        def one_chunk(c, _):
            cp = pltpu.make_async_copy(
                out_hbm.at[pl.ds(c * _CW, _CW), pid], chunk_ref, sem_chunk
            )
            cp.start()
            cp.wait()

            def row(wr, _):
                gw = c * _CW + wr
                l1row = ((gw >> 3) & (_NSLOT - 1)) * _BLK + (gw & 7)
                chunk_ref[pl.ds(wr, 1)] = (
                    chunk_ref[pl.ds(wr, 1)] | l1_ref[pl.ds(l1row, 1)]
                )
                return 0

            jax.lax.fori_loop(0, _CW, row, 0)
            cpo = pltpu.make_async_copy(
                chunk_ref, out_hbm.at[pl.ds(c * _CW, _CW), pid], sem_chunk
            )
            cpo.start()
            cpo.wait()
            return 0

        jax.lax.fori_loop(c0, c1, one_chunk, 0)
        newb = c1 * (_CW // _BLK)

        def clear(b, _):
            srow = (b & (_NSLOT - 1)) * _BLK
            l1_ref[pl.ds(srow, _BLK)] = jnp.zeros((_BLK, SL, 128), I32)
            return 0

        jax.lax.fori_loop(dbase, newb, clear, 0)
        return newb

    # ---- the append primitive ----
    def append(st, mask, v, w):
        """Append w (<= 32) bits of v at each masked lane's cursor."""
        regs, acc, accbits, wpos = st
        w = jnp.where(mask, w, 0)
        vmask = jnp.where(w >= 32, -1, _shl(z + 1, w) - 1)
        v = v & vmask
        space = 32 - accbits
        spill = w - space
        completes = (spill >= 0) & (w > 0)
        completed = acc | _ushr(v, jnp.maximum(spill, 0))
        acc = jnp.where(
            completes,
            _shl(v, 32 - jnp.maximum(spill, 0)),
            acc | _shl(v, space - w),
        )
        accbits = jnp.where(completes, jnp.maximum(spill, 0), accbits + w)
        regs = deposit_word(regs, completes, completed, wpos & 15)
        wpos = wpos + completes.astype(I32)
        return regs, acc, accbits, wpos

    # state tuple layout (12):
    # regs(16-list), acc, accbits, wpos, blkdone, blkend, i, mean, zmode,
    # act, flushed, ovf
    def finish_flush(st):
        """Lanes newly done: flush the partial word + partial block so the
        drain watermark can pass them (their remaining slots become safely
        clearable zeros)."""
        (regs, acc, accbits, wpos, blkdone, blkend, i, mean, zmode, act,
         flushed, ovf) = st
        nf = (flushed == 0) & (i >= ns)
        pend = nf & ((wpos >> 3) > blkdone)
        regs = block_deposit(regs, pend, blkdone)
        blkdone = blkdone + pend.astype(I32)
        regs = deposit_word(regs, nf & (accbits > 0), acc, wpos & 15)
        haspart = nf & (((wpos & 7) > 0) | (accbits > 0))
        regs = block_deposit(regs, haspart, blkdone)
        blkend = jnp.where(nf, blkdone + haspart.astype(I32), blkend)
        flushed = jnp.where(nf, 1, flushed)
        return (regs, acc, accbits, wpos, blkdone, blkend, i, mean, zmode,
                act, flushed, ovf)

    def one_group(g, carry, sn, sz, wait_fn, start_fn):
        st, dbase = carry
        (regs, acc, accbits, wpos, blkdone, blkend, i, mean, zmode, act,
         flushed, ovf) = st
        if interpret:
            # Interpret emulates copies synchronously: start+wait on the
            # same descriptor object, no cross-group pipelining.
            for hbm, stg, sem in ((n_hbm, sn, sem_na), (zr_hbm, sz, sem_za)):
                cp = pltpu.make_async_copy(
                    hbm.at[pl.ds(g * _K, _K), pid], stg, sem
                )
                cp.start()
                cp.wait()
        else:
            wait_fn(g, sn, sz)

        def row_body(k, rst):
            (regs, acc, accbits, wpos, blkdone, i, mean, zmode, act) = rst
            t = g * _K + k
            tv = z + t
            enc = (act == 1) & (i == tv) & (tv < ns)

            n = sn[pl.ds(k, 1)].reshape(SL, 128)
            zr1 = sz[pl.ds(k, 1)].reshape(SL, 128)

            value = n - zmode
            m0 = _s(jax.lax.shift_right_logical(_u(mean), U32(9)))
            kk = jnp.minimum(_lg3a(m0), kb)
            m = _shl(z + 1, kk) - 1

            uv = _u(value)
            esc = (m <= 0) | (uv >= _u(9 * m))
            q = z
            for c in range(1, 9):
                q = q + (uv >= _u(c * m)).astype(I32)
            q = jnp.where(m > 0, q, 0)
            p_w = jnp.where(esc, 9, q + 1)
            p_v = jnp.where(esc, 0x1FF, _shl(z + 1, q + 1) - 2)
            r = value - q * m
            sfx_w = jnp.where(
                esc, max_size,
                jnp.where(kk == 1, 0, jnp.where(r == 0, kk - 1, kk)),
            )
            sfx_v = jnp.where(esc, value, jnp.where(r == 0, 0, r + 1))

            stt = (regs, acc, accbits, wpos)
            stt = append(stt, enc, p_v, p_w)
            stt = append(stt, enc, sfx_v, sfx_w)

            # Adaptive mean (uint32 wrap); nd == n for encoding lanes.
            pblu = _u(pbl)
            mean_n = _s(
                pblu * _u(n)
                + _u(mean)
                - jax.lax.shift_right_logical(pblu * _u(mean), U32(9))
            )
            mean_n = jnp.where(_u(value) > 0xFFFF, 0xFFFF, mean_n)
            mean = jnp.where(enc, mean_n, mean)
            zmode = jnp.where(enc, 0, zmode)
            i = jnp.where(enc, i + 1, i)

            # Zero-run mode (golomb.go:223-246 inverse).
            zcond = enc & (_u(_shl(mean, 2)) < 512) & (i < ns)
            k32 = jnp.maximum(
                _clz(mean) - 24
                + _s(jax.lax.shift_right_logical(_u(mean + 16), U32(6))),
                0,
            )
            mz = (_shl(z + 1, k32) - 1) & wb_mask
            run = zr1
            uz = _u(run)
            zesc = (mz <= 0) | (uz >= _u(9 * mz))
            zq = z
            for c in range(1, 9):
                zq = zq + (uz >= _u(c * mz)).astype(I32)
            zq = jnp.where(mz > 0, zq, 0)
            zp_w = jnp.where(zesc, 9, zq + 1)
            zp_v = jnp.where(zesc, 0x1FF, _shl(z + 1, zq + 1) - 2)
            zrr = run - zq * mz
            zs_w = jnp.where(
                zesc, 16,
                jnp.where(k32 == 1, 0, jnp.where(zrr == 0, k32 - 1, k32)),
            )
            zs_v = jnp.where(zesc, run, jnp.where(zrr == 0, 0, zrr + 1))

            stt = append(stt, zcond, zp_v, zp_w)
            stt = append(stt, zcond, zs_v, zs_w)
            regs, acc, accbits, wpos = stt

            i = jnp.where(zcond, i + run, i)
            zmode = jnp.where(zcond, jnp.where(run >= 65535, 0, 1), zmode)
            mean = jnp.where(zcond, 0, mean)

            # Block completion: a row appends <= 66 bits (< 8 words), so at
            # most one block boundary is crossed per row.
            pend = (wpos >> 3) > blkdone
            regs = block_deposit(regs, pend, blkdone)
            blkdone = blkdone + pend.astype(I32)

            return (regs, acc, accbits, wpos, blkdone, i, mean, zmode, act)

        rst = (regs, acc, accbits, wpos, blkdone, i, mean, zmode, act)
        (regs, acc, accbits, wpos, blkdone, i, mean, zmode, act) = (
            jax.lax.fori_loop(0, _K, row_body, rst)
        )

        # Prefetch two groups ahead into the buffer this group just freed.
        if not interpret:
            @pl.when(jnp.asarray(g + 2 < NG))
            def _():
                start_fn(g + 2, sn, sz)

        st = (regs, acc, accbits, wpos, blkdone, blkend, i, mean, zmode, act,
              flushed, ovf)
        st = finish_flush(st)
        (regs, acc, accbits, wpos, blkdone, blkend, i, mean, zmode, act,
         flushed, ovf) = st

        # Watermark maintenance: drain when some lane is _PRESS blocks past
        # it; freeze (overflow) lanes that would wrap the 64-slot ring.
        live = (act0 == 1) & (flushed == 0)
        press = jnp.max(jnp.where(act0 == 1, jnp.where(live, blkdone, blkend), 0))
        anylive = jnp.any(live)
        dend_live = jnp.min(jnp.where(live, blkdone, z + (1 << 30)))
        dend_done = jnp.max(jnp.where(act0 == 1, blkend, 0))
        dend = jnp.where(anylive, dend_live, dend_done)
        dend = jnp.where(press - dbase >= _PRESS, dend, dbase)
        dbase = drain(dbase, dend)

        frz = (act == 1) & (blkdone - dbase >= _FREEZE)
        ovf = jnp.where(frz, 1, ovf)
        act = act * (1 - frz.astype(I32))
        flushed = jnp.where(frz, 1, flushed)

        st = (regs, acc, accbits, wpos, blkdone, blkend, i, mean, zmode, act,
              flushed, ovf)
        return st, dbase

    # ---- run ----
    regs0 = [z for _ in range(16)]
    act_init = act0 * (ns > 0).astype(I32)
    flushed0 = jnp.where(act_init == 1, 0, 1)
    st0 = (regs0, z, z, z, z, z, z, mb0, z, act_init, flushed0, z)

    def group_pair(gp, carry):
        carry = one_group(2 * gp, carry, stage_na, stage_za, wait_in, start_in)
        carry = one_group(
            2 * gp + 1, carry, stage_nb, stage_zb, wait_in_b, start_in_b
        )
        return carry

    st, dbase = jax.lax.fori_loop(0, NG // 2, group_pair, (st0, jnp.int32(0)))

    # Epilogue: all lanes have i >= ns; flush stragglers (already done at
    # their group end — this is a no-op safety net) and drain everything.
    st = finish_flush(st)
    (regs, acc, accbits, wpos, blkdone, blkend, i, mean, zmode, act,
     flushed, ovf) = st
    dend = jnp.max(jnp.where(act0 == 1, blkend, 0)) + 1
    dend_c = ((dend * _BLK + _CW - 1) // _CW) * (_CW // _BLK)
    drain(dbase, jnp.minimum(dend_c, W_pad // _BLK))

    bits_out[...] = jnp.where(
        act0 == 1, _shl(wpos, 5) + accbits, 0
    ).reshape(bits_out.shape)
    ovf_out[...] = ovf.reshape(ovf_out.shape)


@functools.partial(
    jax.jit, static_argnames=("kb", "F", "W_out", "LB", "interpret")
)
def dense_encode_pallas(
    n_t, zr_t, act, pb_local, max_size, ns, mb, *, kb, F, W_out, LB=1024,
    interpret=False,
):
    """Entropy-encode one channel for all lanes on the TPU.

    n_t, zr_t: (F, B) int32 row-major — zigzagged residuals and the
    zero-run length starting at the NEXT sample (zrun[t+1], clipped to
    65535; don't-care past ns).  Returns (words (B, W_pad) int32 in
    big-endian bit order, each lane's stream starting at its own word 0;
    bits (B,); overflow (B,)).  Overflowed lanes (output divergence beyond
    the slot ring) must be re-encoded by the caller; their words are
    unspecified.  Requires kb <= MAX_KB.
    """
    assert kb <= MAX_KB, kb
    Fin, B = n_t.shape
    assert B % LB == 0, (B, LB)
    SL = LB // 128
    nblocks = B // LB
    F_pad = (F + 2 * _K - 1) // (2 * _K) * (2 * _K)
    if Fin < F_pad:
        pad = jnp.zeros((F_pad - Fin, B), I32)
        n_t = jnp.concatenate([n_t, pad], axis=0)
        zr_t = jnp.concatenate([zr_t, pad], axis=0)
    W_pad = ((W_out + _CW - 1) // _CW) * _CW

    def lanes(x):
        return x.reshape(nblocks, SL, 128)

    def rows(x):
        return x.reshape(F_pad, nblocks, SL, 128)

    kern = functools.partial(
        _encode_kernel, kb=kb, F=F, W_pad=W_pad, LB=LB, interpret=interpret
    )
    lane_spec = pl.BlockSpec(
        (1, SL, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    zeros_out = jnp.zeros((W_pad, nblocks, SL, 128), I32)
    words, bits, ovf = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            lane_spec,
            lane_spec,
            lane_spec,
            lane_spec,
            lane_spec,
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            lane_spec,
            lane_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((W_pad, nblocks, SL, 128), I32),
            jax.ShapeDtypeStruct((nblocks, SL, 128), I32),
            jax.ShapeDtypeStruct((nblocks, SL, 128), I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_K, SL, 128), I32),
            pltpu.VMEM((_K, SL, 128), I32),
            pltpu.VMEM((_K, SL, 128), I32),
            pltpu.VMEM((_K, SL, 128), I32),
            pltpu.VMEM((_CW, SL, 128), I32),
            pltpu.VMEM((_NSLOT * _BLK, SL, 128), I32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(
        rows(n_t),
        rows(zr_t),
        zeros_out,
        lanes(act.astype(I32)),
        lanes(pb_local),
        lanes(max_size),
        lanes(ns),
        lanes(mb),
    )
    # (W_pad, NB, SL, 128) -> (W_pad, B) -> (B, W_pad)
    return words.reshape(W_pad, B).T, bits.reshape(B), ovf.reshape(B)
