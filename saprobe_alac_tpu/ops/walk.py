"""Phase 1: vectorized element walk + adaptive Golomb-Rice entropy decode.

One packet per lane.  The outer loop steps over element slots (static bound
num_channels + EXTRA_SLOTS); each slot parses SCE/LFE/CPE/DSE/FIL/END headers
branchlessly across lanes, then runs the bit-serial entropy loop in lockstep
(a jax.lax.while_loop that ends when every lane finished its channel).

Lanes that hit malformed data set an error code and go inactive; the host
falls back to the scalar oracle for those packets, reproducing the reference's
exact error surface (decoder.go / golomb.go sentinel errors).

Behavioral parity references: decoder.go:133-574 (element dispatch, headers),
golomb.go:112-253 (entropy), bitbuffer.go (cursor semantics).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.element import CHANNEL_LAYOUT_OFFSETS
from .jaxint import I32, U32, clz, lg3a, s, sext, sext16, shl, sshr, u, ushr
from .streambits import vread, window32

#: Slots beyond the channel-filling elements, for DSE/FIL/END interleave.
EXTRA_SLOTS = 4

# Error codes (host maps these to the error taxonomy).
ERR_NONE = 0
ERR_OVERRUN = 1  # BitstreamOverrun
ERR_ELEMENT = 2  # UnsupportedElement (CCE/PCE)
ERR_HEADER = 3  # InvalidHeader (nonzero unused bits)
ERR_SHIFT = 4  # InvalidShift (bytesShifted == 3)
ERR_SAMPLES = 5  # SampleOverrun (zero run / partial count out of range)
ERR_SLOTS = 6  # element layout longer than the slot budget
ERR_WIDTH = 7  # chan_bits > 32 (degenerate 32-bit CPE path) -> scalar fallback


class WalkResult(NamedTuple):
    """Per-batch phase-1 outputs (all int32)."""

    res: jnp.ndarray  # (B, C*F) entropy residuals per channel plane
    err: jnp.ndarray  # (B,)
    ns: jnp.ndarray  # (B,) decoded samples per packet
    order: jnp.ndarray  # (B, C)
    mode: jnp.ndarray  # (B, C)
    den: jnp.ndarray  # (B, C)
    cb: jnp.ndarray  # (B, C) chan_bits
    bs: jnp.ndarray  # (B, C) bytes shifted (0 for escape)
    esc: jnp.ndarray  # (B, C) escape flag
    esc_base: jnp.ndarray  # (B, C) bit offset of raw escape data
    esc_cb: jnp.ndarray  # (B, C) escape read width
    shift_base: jnp.ndarray  # (B, C) bit offset of the shift region
    coefs: jnp.ndarray  # (B, C, 32)
    mixbits: jnp.ndarray  # (B, C)
    mixres: jnp.ndarray  # (B, C)
    role: jnp.ndarray  # (B, C) 0=mono, 1=pair-U, 2=pair-V
    out_chan: jnp.ndarray  # (B, C) SMPTE output channel index
    filled: jnp.ndarray  # (B, C) 1 if a channel element actually decoded here


def _entropy_channel(words, size_bits, bitpos, err, res, active, cur_chan, pb_local, max_size, ns, cfg):
    """Entropy-decode one channel for all active lanes (lockstep while loop).

    Returns (bitpos, err, res).  Residual writes target res[(B, C*F+1)] flat
    with a dummy column for masked lanes.
    """
    F = cfg["frame_length"]
    kb = cfg["kb"]
    wb = (1 << kb) - 1 if kb < 32 else 0xFFFFFFFF
    mb0 = cfg["mb"]
    dummy = res.shape[1] - 1

    # Every iteration decodes >= 1 sample per active lane, so F iterations
    # suffice; the guard makes divergence impossible even under bugs/adversarial
    # streams (stuck lanes error out instead of hanging the device).
    max_iters = F + 4

    def cond(st):
        return jnp.any(st[0]) & (st[7] < max_iters)

    def body(st):
        act, bitpos, err, count, mean, zmode, res, iters = st

        # Overrun guard (golomb.go:168-170); negative bitpos = Go uint32 wrap.
        over = act & ((bitpos >= size_bits) | (bitpos < 0))
        err = jnp.where(over, ERR_OVERRUN, err)
        act = act & ~over

        m0 = s(jax.lax.shift_right_logical(u(mean), U32(9)))
        k = jnp.minimum(lg3a(m0), kb)
        m = shl(1, k) - 1

        win = window32(words, bitpos)
        pre = clz(~win)

        # Escape: prefix >= 9 -> raw max_size bits (golomb.go:184-186).
        is_esc = pre >= 9
        val_esc = vread(words, bitpos + 9, jnp.maximum(max_size, 1))
        bits_esc = 9 + max_size

        # Normal: value from prefix and k-bit remainder (golomb.go:188-201).
        win2 = shl(win, pre + 1)
        v = ushr(win2, 32 - k)  # k >= 1 in practice; k=0 gives v=win2 (harmless, see below)
        vbig = v >= 2
        val_n = jnp.where(
            k != 1,
            jnp.where(vbig, pre * m + v - 1, pre * m),
            pre,
        )
        bits_n = pre + 1 + jnp.where(k != 1, jnp.where(vbig, k, k - 1), 0)

        value = jnp.where(is_esc, val_esc, val_n)
        nbits = jnp.where(is_esc, bits_esc, bits_n)

        # Signed mapping (golomb.go:206-212), wrapping 32-bit.
        nd = value + zmode
        mult = 1 - 2 * (nd & 1)
        delta = s(jax.lax.shift_right_logical(u(nd + 1), U32(1))) * mult

        # Masked lanes scatter into the dummy column.
        idx = jnp.where(act, cur_chan * F + count, dummy)
        res = res.at[jnp.arange(res.shape[0]), idx].set(jnp.where(act, delta, 0))

        count_n = jnp.where(act, count + 1, count)
        bitpos = jnp.where(act, bitpos + nbits, bitpos)

        # Adaptive mean (golomb.go:215-218): uint32 wrap arithmetic.
        pbl = u(pb_local)
        mean_n = s(pbl * u(nd) + u(mean) - jax.lax.shift_right_logical(pbl * u(mean), U32(9)))
        mean_n = jnp.where(u(value) > 0xFFFF, 0xFFFF, mean_n)
        mean = jnp.where(act, mean_n, mean)
        zmode = jnp.where(act, 0, zmode)

        # Zero-run mode (golomb.go:223-246); (mean<<2) < 512 is unsigned in Go.
        zcond = act & (u(shl(mean, 2)) < 512) & (count_n < ns)
        k32 = jnp.maximum(clz(mean) - 24 + s(jax.lax.shift_right_logical(u(mean + 16), U32(6))), 0)
        mz = (shl(1, k32) - 1) & wb

        zwin = window32(words, bitpos)
        zpre = clz(~zwin)
        z_esc = zpre >= 9
        zval_esc = ushr(shl(zwin, 9), 16)
        zbits_esc = 9 + 16
        zwin2 = shl(zwin, zpre + 1)
        zv = ushr(zwin2, 32 - jnp.maximum(k32, 1))
        zv = jnp.where(k32 == 0, 0, zv)
        zvbig = zv >= 2
        zval_n = jnp.where(zvbig, zpre * mz + zv - 1, zpre * mz)
        zbits_n = zpre + 1 + jnp.where(zvbig, k32, k32 - 1)
        zrun = jnp.where(z_esc, zval_esc, zval_n)
        zbits = jnp.where(z_esc, zbits_esc, zbits_n)

        zover = zcond & (count_n + zrun > ns)
        err = jnp.where(zover, ERR_SAMPLES, err)
        act = act & ~zover
        zcond = zcond & ~zover

        count_n = jnp.where(zcond, count_n + zrun, count_n)
        bitpos = jnp.where(zcond, bitpos + zbits, bitpos)
        zmode = jnp.where(zcond, jnp.where(zrun >= 65535, 0, 1), zmode)
        mean = jnp.where(zcond, 0, mean)

        act = act & (count_n < ns) & (err == ERR_NONE)
        return act, bitpos, err, count_n, mean, zmode, res, iters + 1

    B = bitpos.shape[0]
    init_act = active & (ns > 0) & (err == ERR_NONE)
    state = (
        init_act,
        bitpos,
        err,
        jnp.zeros(B, I32),
        jnp.full(B, mb0, I32),
        jnp.zeros(B, I32),
        res,
        jnp.zeros((), I32),
    )
    act, bitpos, err, count, mean, zmode, res, _ = jax.lax.while_loop(cond, body, state)
    err = jnp.where(act, ERR_OVERRUN, err)  # guard-tripped lanes
    return bitpos, err, res


def _parse_coefs(words, p, num):
    """Read up to 32 int16 coefficients at per-lane positions; returns
    ((B, 32) coefs, new p)."""
    idx = jnp.arange(32, dtype=I32)[None, :]
    pos = p[:, None] + 16 * idx
    vals = sext16(vread(words, pos, 16))
    coefs = jnp.where(idx < num[:, None], vals, 0)
    return coefs, p + 16 * num


@partial(jax.jit, static_argnames=("frame_length", "num_channels", "depth", "pb", "mb", "kb"))
def walk_batch(words, size_bits, frame_length, num_channels, depth, pb, mb, kb):
    """Run phase 1 over a packed batch.  Returns WalkResult."""
    B = words.shape[0]
    F = frame_length
    C = num_channels
    cfg = {"frame_length": F, "kb": kb, "mb": mb}
    offsets_table = jnp.asarray(
        np.array(CHANNEL_LAYOUT_OFFSETS[C - 1], dtype=np.int32)
    )

    arange_b = jnp.arange(B)

    def zeros_c():
        return jnp.zeros((B, C + 2), I32)

    # Carried state.
    state = {
        "bitpos": jnp.zeros(B, I32),
        "chan": jnp.zeros(B, I32),
        "done": jnp.zeros(B, bool),
        "err": jnp.zeros(B, I32),
        "ns": jnp.full(B, F, I32),
        "res": jnp.zeros((B, C * F + 1), I32),
        "order": zeros_c(),
        "mode": zeros_c(),
        "den": zeros_c(),
        "cb": zeros_c(),
        "bs": zeros_c(),
        "esc": zeros_c(),
        "esc_base": zeros_c(),
        "esc_cb": zeros_c(),
        "shift_base": zeros_c(),
        "coefs": jnp.zeros((B, C + 2, 32), I32),
        "mixbits": zeros_c(),
        "mixres": zeros_c(),
        "role": zeros_c(),
        "out_chan": zeros_c(),
        "filled": zeros_c(),
    }

    def slot_body(_, st):
        bitpos = st["bitpos"]
        chan = st["chan"]
        err = st["err"]
        ns = st["ns"]

        active = ~st["done"] & (err == ERR_NONE)

        # Past-end check before the tag read (decoder.go:143-145).
        over = active & (sshr(bitpos, 3) >= sshr(size_bits, 3))
        err = jnp.where(over, ERR_OVERRUN, err)
        active = active & ~over

        tag = vread(words, bitpos, 3)
        p0 = bitpos + 3

        is_sce = active & ((tag == 0) | (tag == 3))
        is_cpe_raw = active & (tag == 1)
        cpe_break = is_cpe_raw & (chan + 2 > C)  # goto done (decoder.go:163-165)
        is_cpe = is_cpe_raw & ~cpe_break
        is_dse = active & (tag == 4)
        is_fil = active & (tag == 6)
        is_end = active & (tag == 7)
        is_bad = active & ((tag == 2) | (tag == 5))
        is_elem = is_sce | is_cpe

        err = jnp.where(is_bad, ERR_ELEMENT, err)

        # --- SCE/CPE common header (decoder.go:210-235 / 348-375) ---
        unused = vread(words, p0 + 4, 12)
        hdr4 = vread(words, p0 + 16, 4)
        partial = sshr(hdr4, 3)
        bsf = sshr(hdr4, 1) & 3
        escf = hdr4 & 1

        err = jnp.where(is_elem & (unused != 0), ERR_HEADER, err)
        err = jnp.where(is_elem & (bsf == 3), ERR_SHIFT, err)
        is_elem = is_elem & (err == ERR_NONE)
        is_sce = is_sce & is_elem
        is_cpe = is_cpe & is_elem

        p = p0 + 20
        ns_part = s(
            jax.lax.shift_left(u(vread(words, p, 16)), U32(16))
        ) | vread(words, p + 16, 16)
        ns_new = jnp.where(is_elem & (partial == 1), ns_part, ns)
        err = jnp.where(is_elem & ((ns_new > F) | (ns_new < 0)), ERR_SAMPLES, err)
        is_elem = is_elem & (err == ERR_NONE)
        is_sce = is_sce & is_elem
        is_cpe = is_cpe & is_elem
        p = p + jnp.where(is_elem & (partial == 1), 32, 0)
        ns = jnp.where(is_elem, ns_new, ns)

        # chan_bits (decoder.go:230, 371); escape resets (decoder.go:326, 388).
        cb_comp = depth - bsf * 8 + jnp.where(is_cpe, 1, 0)
        esc_cb = jnp.where(is_cpe, depth, depth - bsf * 8)
        # chan_bits outside [1, 32] hits degenerate Go shift-saturation paths;
        # flag for exact scalar fallback rather than emulate on-device.
        bad_width = (escf == 0) & ((cb_comp > 32) | (cb_comp < 1))
        bad_width = bad_width | ((escf == 1) & (esc_cb < 1))
        err = jnp.where(is_elem & bad_width, ERR_WIDTH, err)
        is_elem = is_elem & (err == ERR_NONE)
        is_sce = is_sce & is_elem
        is_cpe = is_cpe & is_elem

        is_comp = is_elem & (escf == 0)
        is_escape = is_elem & (escf == 1)

        # --- Compressed header: mix info + per-channel predictor headers ---
        mixbits = vread(words, p, 8)
        mixres = sext(vread(words, p + 8, 8), 8)
        pc = p + 16  # compressed lanes advance past mix bytes (SCE reads them too)

        b1 = vread(words, pc, 8)
        mode_u = sshr(b1, 4)
        den_u = b1 & 15
        b2 = vread(words, pc + 8, 8)
        pbf_u = sshr(b2, 5)
        num_u = b2 & 31
        coefs_u, p_after_u = _parse_coefs(words, pc + 16, num_u)

        b3 = vread(words, p_after_u, 8)
        mode_v = sshr(b3, 4)
        den_v = b3 & 15
        b4 = vread(words, p_after_u + 8, 8)
        pbf_v = sshr(b4, 5)
        num_v = b4 & 31
        coefs_v, p_after_v = _parse_coefs(words, p_after_u + 16, num_v)

        p_pred = jnp.where(is_cpe, p_after_v, p_after_u)

        # Shift region: saved cursor then skipped (decoder.go:289-293, 453-457).
        shift_base = p_pred
        nch_elem = 1 + jnp.where(is_cpe, 1, 0)
        p_ent = p_pred + jnp.where(is_comp, bsf * 8 * nch_elem * ns, 0)

        # --- Escape: raw data begins right after the element header ---
        esc_base = p
        p_esc_end = p + ns * esc_cb * nch_elem
        # Truncated raw region: flag for the oracle's BitstreamOverrun.
        err = jnp.where(is_escape & (p_esc_end > size_bits), ERR_OVERRUN, err)
        is_escape = is_escape & (err == ERR_NONE)
        is_elem = is_elem & (err == ERR_NONE)
        is_sce = is_sce & is_elem
        is_cpe = is_cpe & is_elem
        is_comp = is_comp & is_elem

        # --- DSE skip (decoder.go:554-574) ---
        d_align = vread(words, p0 + 4, 1)
        d_cnt = vread(words, p0 + 5, 8)
        d_cnt2 = vread(words, p0 + 13, 8)
        d_has2 = d_cnt == 255
        d_total = d_cnt + jnp.where(d_has2, d_cnt2, 0)
        p_dse = p0 + 5 + 8 + jnp.where(d_has2, 8, 0)
        p_dse = jnp.where(d_align == 1, (p_dse + 7) & ~7, p_dse)
        p_dse = p_dse + d_total * 8
        err = jnp.where(is_dse & (sshr(p_dse, 3) >= sshr(size_bits, 3)), ERR_OVERRUN, err)

        # --- FIL skip (decoder.go:538-551) ---
        f_cnt = vread(words, p0, 4)
        f_has2 = f_cnt == 15
        f_cnt2 = vread(words, p0 + 4, 8)
        f_total = f_cnt + jnp.where(f_has2, f_cnt2 - 1, 0)
        p_fil = p0 + 4 + jnp.where(f_has2, 8, 0) + f_total * 8
        err = jnp.where(is_fil & (sshr(p_fil, 3) >= sshr(size_bits, 3)), ERR_OVERRUN, err)

        # --- END: byte-align then done (decoder.go:192-195) ---
        p_end = (p0 + 7) & ~7

        # --- Commit positions for non-entropy lanes ---
        new_bitpos = bitpos
        new_bitpos = jnp.where(is_comp, p_ent, new_bitpos)
        new_bitpos = jnp.where(is_escape, p_esc_end, new_bitpos)
        new_bitpos = jnp.where(is_dse & (err == ERR_NONE), p_dse, new_bitpos)
        new_bitpos = jnp.where(is_fil & (err == ERR_NONE), p_fil, new_bitpos)
        new_bitpos = jnp.where(is_end, p_end, new_bitpos)

        # --- Record per-channel metadata ---
        chan_u = jnp.where(is_elem, chan, C)  # dummy column when masked
        chan_v = jnp.where(is_cpe, chan + 1, C)
        out_u = offsets_table[jnp.clip(chan, 0, C - 1)]

        def put(arr, col, val):
            # Masked lanes carry col >= C, landing in the dummy columns.
            return arr.at[arange_b, col].set(val)

        st2 = dict(st)
        st2["order"] = put(put(st["order"], chan_u, jnp.where(is_comp, num_u, 0)), chan_v, jnp.where(is_comp, num_v, 0))
        st2["mode"] = put(put(st["mode"], chan_u, jnp.where(is_comp, mode_u, 0)), chan_v, jnp.where(is_comp, mode_v, 0))
        st2["den"] = put(put(st["den"], chan_u, jnp.where(is_comp, den_u, 0)), chan_v, jnp.where(is_comp, den_v, 0))
        st2["cb"] = put(put(st["cb"], chan_u, jnp.where(is_comp, cb_comp, esc_cb)), chan_v, jnp.where(is_comp, cb_comp, esc_cb))
        st2["bs"] = put(put(st["bs"], chan_u, jnp.where(is_comp, bsf, 0)), chan_v, jnp.where(is_comp, bsf, 0))
        st2["esc"] = put(put(st["esc"], chan_u, escf), chan_v, escf)
        st2["esc_base"] = put(put(st["esc_base"], chan_u, esc_base), chan_v, esc_base)
        st2["esc_cb"] = put(put(st["esc_cb"], chan_u, esc_cb), chan_v, esc_cb)
        st2["shift_base"] = put(put(st["shift_base"], chan_u, shift_base), chan_v, shift_base)
        st2["mixbits"] = put(put(st["mixbits"], chan_u, jnp.where(is_cpe & is_comp, mixbits, 0)), chan_v, jnp.where(is_cpe & is_comp, mixbits, 0))
        st2["mixres"] = put(put(st["mixres"], chan_u, jnp.where(is_cpe & is_comp, mixres, 0)), chan_v, jnp.where(is_cpe & is_comp, mixres, 0))
        st2["role"] = put(put(st["role"], chan_u, jnp.where(is_cpe, 1, 0)), chan_v, 2)
        st2["out_chan"] = put(put(st["out_chan"], chan_u, out_u), chan_v, out_u + 1)
        st2["filled"] = put(put(st["filled"], chan_u, 1), chan_v, 1)
        coefs = st["coefs"].at[arange_b, chan_u].set(jnp.where(is_comp[:, None], coefs_u, 0))
        coefs = coefs.at[arange_b, chan_v].set(jnp.where(is_comp[:, None], coefs_v, 0))
        st2["coefs"] = coefs

        # --- Entropy loops: U then V (order matters: shared bit cursor) ---
        pb_u = (pb * pbf_u) // 4
        pb_v = (pb * pbf_v) // 4
        ent_u = is_comp
        ent_v = is_comp & is_cpe

        res = st["res"]

        def run_u(args):
            bp, er, rs = args
            return _entropy_channel(
                words, size_bits, bp, er, rs, ent_u, chan, pb_u, cb_comp, ns, cfg
            )

        def run_v(args):
            bp, er, rs = args
            return _entropy_channel(
                words, size_bits, bp, er, rs, ent_v, chan + 1, pb_v, cb_comp, ns, cfg
            )

        new_bitpos, err, res = jax.lax.cond(
            jnp.any(ent_u), run_u, lambda a: a, (new_bitpos, err, res)
        )
        new_bitpos, err, res = jax.lax.cond(
            jnp.any(ent_v), run_v, lambda a: a, (new_bitpos, err, res)
        )

        # --- Advance channel counter / done flags ---
        chan_new = chan + jnp.where(is_sce, 1, 0) + jnp.where(is_cpe, 2, 0)
        done = st["done"] | is_end | cpe_break | (chan_new >= C)

        st2["bitpos"] = new_bitpos
        st2["chan"] = chan_new
        st2["done"] = done
        st2["err"] = err
        st2["ns"] = ns
        st2["res"] = res
        return st2

    state = jax.lax.fori_loop(0, C + EXTRA_SLOTS, slot_body, state)

    err = jnp.where(~state["done"] & (state["err"] == ERR_NONE), ERR_SLOTS, state["err"])

    return WalkResult(
        res=state["res"][:, : C * F],
        err=err,
        ns=state["ns"],
        order=state["order"][:, :C],
        mode=state["mode"][:, :C],
        den=state["den"][:, :C],
        cb=state["cb"][:, :C],
        bs=state["bs"][:, :C],
        esc=state["esc"][:, :C],
        esc_base=state["esc_base"][:, :C],
        esc_cb=state["esc_cb"][:, :C],
        shift_base=state["shift_base"][:, :C],
        coefs=state["coefs"][:, :C],
        mixbits=state["mixbits"][:, :C],
        mixres=state["mixres"][:, :C],
        role=state["role"][:, :C],
        out_chan=state["out_chan"][:, :C],
        filled=state["filled"][:, :C],
    )
