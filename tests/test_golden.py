"""Golden vectors: literal packet bytes -> literal expected PCM.

Every other correctness test in this repo is differential between
implementations that share an author; a shared misreading of the format
would pass them all.  These vectors are the external anchor: the packet
bytes AND the expected PCM below are hand-derived from the spec math
(reference decoder.go / golomb.go / predictor.go / matrix.go studied as the
format specification) — no repo code generates either side at test time.

All three implementations (Python oracle, C++ native core, JAX device
pipeline) must decode each literal packet to its literal PCM.

Shared config for all vectors: frame_length=4096, pb=40, mb=10, kb=14,
max_run=255 (Apple-standard tuning), 16-bit.  All packets use the
partial-frame flag so the hand-assembled streams stay a few samples long.

Derivation conventions (bitstream is MSB-first):
  element = tag(3) instance(4) unused(12,=0) [partial(1) shift(2) escape(1)]
            [numSamples(32) if partial]
  compressed body = mixBits(8) mixRes(8) then per channel:
            {mode(4) denShift(4) pbFactor(3) num(5) coefs(16 each)}
  entropy: adaptive Golomb-Rice, mean starts at mb=10, so the first
  codeword has k = lg3a(10>>9) = lg3a(0) = 1 -> unary prefix only, n = #ones.
  sign decode: ndecode = n + zmode; del = +/-((ndecode+1)>>1), LSB = sign.
  mean update: mean' = pb*(n+zmode) + mean - ((pb*mean)>>9).
  zero-run mode triggers when mean'<<2 < 512; run length is a secondary
  Golomb code with k32 = lead32(mean')-24 + ((mean'+16)>>6), m = (1<<k32)-1.
"""

import numpy as np
import pytest

from saprobe_alac_tpu import native
from saprobe_alac_tpu.codec import decode_packet as oracle
from saprobe_alac_tpu.ops.batch import JaxBatchDecoder

from conftest import make_config

# ---------------------------------------------------------------------------
# Vector 1 — SCE escape path, mono 16-bit, 4 samples.
#
# Bits: 000 0000 (SCE, instance 0) + 12x0 + 1001 (partial, shift=0, escape=1)
#       + numSamples=4 (32b) + four raw 16-bit samples
#       {0x0001, 0xFFFF, 0x7FFF, 0x8000} + END(111) + pad.
# Escape with chanBits=16 sign-extends each raw read: 1, -1, 32767, -32768.
PKT_ESCAPE_SCE = bytes.fromhex("000012000000080003fffeffff0001c0")
PCM_ESCAPE_SCE = bytes.fromhex("0100ffffff7f0080")

# ---------------------------------------------------------------------------
# Vector 2 — SCE compressed, order 0 (num=0), zero-run mode, 8 samples.
#
# Header: 1000 (partial, no shift, compressed), ns=8; mixBits=mixRes=0
# (unused for mono); mode=0 denShift=0 (byte 0x00); pbFactor=4 num=0
# (byte 0x80); no coefs.  Entropy stream, mean trace:
#   n=2 ("110")      -> del=+1, mean 10->90; 90<<2<512 => zero-run,
#                       k32 = (25-24)+((90+16)>>6)=2, m=3
#   run=3 ("100")    -> pre=1, v=0<2 => run=1*3, consumes prefix+1 bit;
#                       fills 3 zeros, zmode stays 1, mean=0
#   n=0 ("0"), z=1   -> ndecode=1 => del=-1, mean=40; 160<512 => zero-run
#                       k32=(26-24)+((40+16)>>6)=2, m=3
#   run=0 ("00")     -> pre=0, v<2 => run 0, zmode stays 1, mean=0
#   n=4 ("11110"),z=1-> ndecode=5 => del=-3, mean=200 (800>=512, no run)
#   n=1 ("10")       -> ndecode=1 => del=-1, mean=40+200-((8000)>>9)=225
#   n=6 ("1111110")  -> ndecode=6 => del=+3, count=8 done
# Order 0 => output = residuals: [1,0,0,0,-1,-3,-1,3].
PKT_ORDER0_ZERORUN = bytes.fromhex("0000100000001000000101a0f5fb80")
PCM_ORDER0_ZERORUN = np.array([1, 0, 0, 0, -1, -3, -1, 3], dtype="<i2").tobytes()

# ---------------------------------------------------------------------------
# Vector 3 — SCE compressed, order-31 first-order delta mode, 4 samples.
#
# num=31 (pb/num byte 0x9F) with 31 zero coefficients (496 zero bits —
# ignored by the delta path).  Entropy (same mean trace math as above):
#   "110" n=2 -> del=+1; mean 90 => zero-run k32=2: "00" run=0, mean=0
#   "0" n=0,z=1 -> del=-1; mean 40 => zero-run k32=2: "00" run=0, mean=0
#   "1110" n=3,z=1 -> ndecode=4 => del=+2; mean=160 (no run)
#   "1110" n=3 -> ndecode=3 => del=-2
# Residuals [1,-1,2,-2]; delta decode: out[i] = out[i-1] + r[i] ->
# [1, 0, 2, 0].
PKT_ORDER31_DELTA = (
    bytes.fromhex("000010000000080000013e") + b"\x00" * 61 + bytes.fromhex("0181ddc0")
)
PCM_ORDER31_DELTA = np.array([1, 0, 2, 0], dtype="<i2").tobytes()

# ---------------------------------------------------------------------------
# Vector 4 — CPE stereo unmix, 2 samples, mixBits=1 mixRes=1.
#
# Tag 001 (CPE), chanBits = 16+1 = 17.  U channel entropy: "110" (del=+1,
# mean 90 => zero-run k32=2 m=3) + "010" (pre=0, v=2 => run = 0*3+2-1 = 1)
# -> U = [1, 0].  V: "110" (del=+1) + "00" (run 0) + "10" (n=1, z=1,
# ndecode=2 => del=+1) -> V = [1, 1].
# Unmix: left = U + V - ((mixRes*V)>>mixBits); right = left - V:
#   s0: left=1+1-(1>>1)=2, right=1;  s1: left=0+1-0=1, right=0.
PKT_CPE_UNMIX = bytes.fromhex("20001000000004020201000101962e".replace(" ", ""))
PCM_CPE_UNMIX = np.array([2, 1, 1, 0], dtype="<i2").tobytes()

# ---------------------------------------------------------------------------
# Vector 5 — SCE adaptive LPC, order 1, denShift=1, coef0=2, 4 samples.
#
# mode/denShift byte 0x01, pb/num byte 0x81 (pbFactor=4, num=1),
# coef0 = 0x0002.  Entropy: "1111110" n=6 -> del=+3 (mean 250);
# "110" n=2 -> del=+1 (mean 311); "110" -> del=+1 (mean 367);
# "1110" n=3 -> del=-2.  Residuals [3, 1, 1, -2].
# Predictor trace (unpcBlockGeneral, lim=2, denHalf=1):
#   warm-up: out[0]=3, out[1]=1+3=4
#   idx2: top=3, sum1=2*(4-3)=2, del=1+3+((2+1)>>1)=5 -> out[2]=5;
#         sign>0 adapt: dd=3-4=-1 -> c0=3, del0=1-((1)>>1)=1 (no break)
#   idx3: top=4, sum1=3*(5-4)=3, del=-2+4+((3+1)>>1)=4 -> out[3]=4;
#         sign<0 adapt: dd=4-5=-1 -> c0=2, del0=-2-((-1)>>1 = -1)=-1
# Output [3, 4, 5, 4].
PKT_LPC_ORDER1 = bytes.fromhex("000010000000080000030200 05fb6ee0".replace(" ", ""))
PCM_LPC_ORDER1 = np.array([3, 4, 5, 4], dtype="<i2").tobytes()


# ---------------------------------------------------------------------------
# Vector 6 — zero-run k32 boundary: mean exactly 48 at zero-run entry.
#
# (mean+16)>>6 in the run-length k32 formula changes value only when
# mean+16 is a multiple of 64; with mean<<2 < 512 that means mean must be
# exactly 48 or 112.  Config pb=48, mb=0 reaches 48 on the first sample:
#   s0: mean=0, k=1; "10" n=1 -> del=-1; mean = 48*1 = 48
#       48<<2 = 192 < 512 => zero-run, k32 = (26-24) + ((48+16)>>6) = 3, m=7
#   run=2 ("0011"): pre=0, v=0b011=3>=2 => run = 0*7+3-1 = 2 -> two zeros
#   s3: "110" n=2, z=1 -> ndecode=3 => del=-2
# Order 0 => PCM [-1, 0, 0, -2].  A decoder computing k32=2 here desyncs.
PKT_ZERORUN_K32_EDGE = bytes.fromhex("00001000000008000001011ee0")
PCM_ZERORUN_K32_EDGE = np.array([-1, 0, 0, -2], dtype="<i2").tobytes()


# ---------------------------------------------------------------------------
# Vector 7 — SCE order-2 adaptive FIR with the multi-tap sign-walk, 6 samples.
#
# The walk (predictor.go:660-682) is the subtlest loop in the codec: taps
# adapt from k=order-1 down to 0, each subtracting (order-k)*((±dd)>>den)
# from del0, with an early break when del0 crosses zero.  This vector drives
# all three walk outcomes: full walk incl. a sgn==0 tap, early exit on the
# sign<0 branch (del0 hits exactly 0), early exit on the sign>0 branch.
#
# Header: partial, no shift, compressed; ns=6; mode=0 denShift=1 (0x01);
# pbFactor=4 num=2 (0x04? -> byte 0b100_00010 = 0x82); c0=2 (0x0002),
# c1=-1 (0xFFFF).
# Entropy (mean trace, pb=40 mb=10: k=1 while mean<512, k=2 at mean>=512):
#   "11110" n=4 -> del=+2, mean 10->170      "1110"  n=3 -> del=-2, mean 277
#   "11110" n=4 -> del=+2, mean 416          "11110" n=4 -> del=+2, mean 544
#   mean 544 -> k=2 (m=3): "010" pre=0 v=2 -> 0*3+v-1=1 -> del=-1, mean 542
#   k=2: "011" v=3 -> ndecode 2 -> del=+1
# Residuals [2,-2,2,2,-1,1].  Predictor (order 2, den=1, denHalf=1):
#   warm-up: out0=2, out1=0, out2=2
#   idx3: top=out0=2, sum1 = 2*(out2-2) + (-1)*(out1-2) = 0+2 = 2
#         out3 = 2+2+((2+1)>>1) = 5; sign>0 walk:
#           k=1: dd=2-out1=2, sgn=1, c1->-2, del0=2-1*((2)>>1)=1 >0, continue
#           k=0: dd=2-out2=0, sgn=0, c0 stays, del0 unchanged (full walk)
#   idx4: top=out1=0, sum1 = 2*5 + (-2)*2 = 6
#         out4 = -1+0+((6+1)>>1) = 2; sign<0 walk:
#           k=1: dd=0-out2=-2, sgn=-1, c1->-3, del0=-1-1*((2)>>1)=0 >=0 BREAK
#   idx5: top=out2=2, sum1 = 2*(2-2) + (-3)*(5-2) = -9
#         out5 = 1+2+((-9+1)>>1 = -4) = -1; sign>0 walk:
#           k=1: dd=2-5=-3, sgn=-1, c1->-2, del0=1-1*((3)>>1)=0 <=0 BREAK
# Output [2, 0, 2, 5, 2, -1].
PKT_LPC_ORDER2_WALK = bytes.fromhex("0000100000000c000003040005ffffeef793e0")
PCM_LPC_ORDER2_WALK = np.array([2, 0, 2, 5, 2, -1], dtype="<i2").tobytes()

# ---------------------------------------------------------------------------
# Vector 8 — 24-bit, bytesShifted=1: the shift-buffer LSB re-insert, 4 samples.
#
# Header shift field = 01 -> chanBits = 24-8 = 16.  After the channel header
# the decoder snapshots the cursor, skips ns*8 shift bits, entropy-decodes,
# then re-reads the shift bytes from the snapshot (decoder.go:289-293,
# 314-321).  Output sample = (val<<8) | shiftByte, 3 bytes LE
# (matrix.go WriteMono24).
# Shift region bytes: AB 00 FF 01.  Entropy "11110","1110","1111110",
# "111110" -> residuals [2,-2,3,-3] (mean trace 170, 277, 496 — all in
# [128,512): k stays 1, no zero-run).  Order 0 -> out = residuals.
# PCM: (2<<8)|0xAB=0x02AB; (-2<<8)=0xFFFE00; (3<<8)|0xFF=0x03FF;
#      (-3<<8)|0x01=0xFFFD01 -> LE triples.
PKT_24BIT_SHIFT = bytes.fromhex("00001400000008000001015601fe03eefdf7")
PCM_24BIT_SHIFT = bytes.fromhex("ab020000feffff030001fdff")

# ---------------------------------------------------------------------------
# Vector 9 — 20-bit: the <<4 output path, 4 samples, order 0, no shift.
#
# chanBits = 20; WriteMono20 emits (val<<4) as 3 LE bytes (matrix.go:66-105).
# Entropy "11110","1110","11110","1110" -> residuals [2,-2,2,-2].
# PCM: 32 -> 20 00 00; -32=0xFFFFE0 -> E0 FF FF; repeat.
PKT_20BIT = bytes.fromhex("0000100000000800000101eef770")
PCM_20BIT = bytes.fromhex("200000e0ffff200000e0ffff")

# ---------------------------------------------------------------------------
# Vector 10 — 32-bit, bytesShifted=2: 16-bit shift re-insert, 4 samples.
#
# Header shift field = 10 -> chanBits = 32-16 = 16; shift region is ns
# 16-bit words (BEEF 0001 FFFF 8000); WriteMono32 emits (val<<16)|shift as
# 4 LE bytes.  Entropy as vector 8 -> residuals [2,-2,3,-3].
# PCM: 0x02BEEF; 0xFFFE0001; 0x03FFFF; 0xFFFD8000 -> LE quads.
PKT_32BIT_SHIFT2 = bytes.fromhex("00001800000008000001017dde0003ffff0001eefdf7")
PCM_32BIT_SHIFT2 = bytes.fromhex("efbe02000100feffffff03000080fdff")


# ---------------------------------------------------------------------------
# Vector 11 — pbFactor=2: the channel header's pb scaling, 5 samples.
#
# pb_effective = pb * pbFactor / 4 = 40*2/4 = 20 (decoder.go:296-300 passes
# pbFactor*PB/4 into SetAGParams).  The pbFactor byte is 0x40 (pbf=2, num=0).
# Entropy trace with pb=20 (a pbFactor-blind decoder computes mean 90 after
# s0 and k32=2, desyncing immediately):
#   s0 "110"  n=2 -> del=+1; mean = 20*2+10-((20*10)>>9=0) = 50
#       50<<2=200<512 => zero-run, k32 = lead(50)-24+((50+16)>>6) = 2+1 = 3,
#       m=7: "000" -> pre=0, v<2 => run 0 (consumes prefix+2); zmode=1
#   s1 "0"    n=0,z=1 -> ndecode=1 => del=-1; mean = 20*1 = 20
#       80<512 => zero-run, k32 = (27-24)+((36)>>6=0) = 3: "0011" ->
#       pre=0, v=3>=2 => run = 3-1 = 2 -> two zeros; zmode=1
#   s4 "10"   n=1,z=1 -> ndecode=2 => del=+1
# Order 0 => PCM [1, -1, 0, 0, 1].
PKT_PBFACTOR2 = bytes.fromhex("0000100000000a0000008180ee")
PCM_PBFACTOR2 = np.array([1, -1, 0, 0, 1], dtype="<i2").tobytes()

# ---------------------------------------------------------------------------
# Vector 12 — chanBits=33: the >32-bit entropy escape read, 32-bit CPE.
#
# CPE at 32-bit depth with no byte shift has chanBits = 32+1 = 33
# (decoder.go:371), which becomes maxSize in DynDecomp's escape arm
# (golomb.go:185: getStreamBits(input, bitPos+9, 33)).  Go's getStreamBits
# (golomb.go:86-108) computes `result >>= 32 - numBits` with uint32
# operands: 32-33 wraps to 2^32-1, the shift count exceeds 31, and Go
# defines such shifts to produce 0 — so ONLY the load2 tail survives:
# the final (bitOffset&7)+1 bits of the 33-bit field, from the 5th byte.
# Layout below puts the field at bit 112 (byte-aligned, b=0), so the
# decoded value is exactly the field's last bit.
#   U s0: "1"*9 escape prefix, field = 32 zeros + "1" -> value=1 => del=-1;
#         mean = 40*1+10 = 50 -> zero-run k32=3: "000" run 0; zmode=1
#   U s1: "10" n=1,z=1 -> ndecode=2 => del=+1
#   V s0: "1110" n=3 -> del=-2; mean=130 (no run)   V s1: "10" -> del=-1
# mixBits=mixRes=0 => passthrough (left=U, right=V).
# PCM int32 LE: s0 (-1,-2), s1 (1,-1).  A decoder reading the full 33-bit
# field (value 1 but 2^32 if the high bits survived — or any impl reading
# 32 bits and consuming 32) desyncs or clamps differently.
PKT_CPE_CHANBITS33 = bytes.fromhex("20001000000004000001000101ff000000008bae")
PCM_CPE_CHANBITS33 = np.array([-1, -2, 1, -1], dtype="<i4").tobytes()

# ---------------------------------------------------------------------------
# Vector 13 — maximum zero-run (65535) and the zmode reset, 65537 samples.
#
# The zero-run length decoder (dynGet, golomb.go:112-144) escapes at
# prefix>=9 to a raw 16-bit read: "1"*9 + 0xFFFF = run 65535.  After a run
# that hits maxZeroRun the decoder clears zmode (golomb.go:240-242) — the
# next codeword decodes with ndecode = value + 0, NOT +1.
#   s0 "110" n=2 -> del=+1; mean=90 -> zero-run k32=2: "1"*9 + "1"*16
#      -> run=65535 zeros; zmode RESET to 0; mean=0
#   s65536 "10" n=1, zmode=0 -> ndecode=1 => del=-1
#      (a decoder that leaves zmode=1 decodes ndecode=2 => +1: sign flip)
# frame_length=65537 (the run plus its two bracketing samples cannot fit
# in 65536); the device path routes frames >2^16 to the host
# implementations by design (ops/batch.py _scalar_only).
PKT_ZERORUN_MAX = bytes.fromhex("0000100002000200000101bffffff7")
_pcm13 = np.zeros(65537, dtype="<i2")
_pcm13[0] = 1
_pcm13[-1] = -1
PCM_ZERORUN_MAX = _pcm13.tobytes()

# ---------------------------------------------------------------------------
# Vector 14 — 8-channel SCE+CPE+CPE+CPE+LFE layout with SMPTE remap.
#
# The 7.1 MPEG element order maps to interleave offsets (2,6,7,0,1,4,5,3)
# (decoder.go:55-64).  Elements carry two distinct order-0 bodies so any
# channel-mapping error is visible:
#   body A "1110"+"10"  -> [-2, -1]   body B "11110"+"0" -> [+2, 0]
#   (A: n=3 -> del=-2, mean 130, no run; n=1 -> del=-1.
#    B: n=4 -> del=+2, mean 170; n=0 -> del=0.)
# SCE(A)->ch2, CPE(A,B)->ch6,7, CPE(B,A)->ch0,1, CPE(B,B)->ch4,5,
# LFE(A)->ch3.  Interleaved rows: s0 [2,-2,-2,-2,2,2,-2,2],
# s1 [0,-1,-1,-1,0,0,-1,0].
PKT_8CH_LAYOUT = bytes.fromhex(
    "0000100000000400000101d10000800000002000000800080ebc"
    "20001000000004000001000101e744"
    "0002000000008000002000203cf180004000000010000004075c"
)
PCM_8CH_LAYOUT = np.array(
    [[2, -2, -2, -2, 2, 2, -2, 2], [0, -1, -1, -1, 0, 0, -1, 0]], dtype="<i2"
).tobytes()

# ---------------------------------------------------------------------------
# Golden ERROR vectors — literal packets that must RAISE, not decode.
#
# E1 kb=0: k = min(lg3a, kb) = 0 makes m = 0 and the k-bit arm consume
# k-1 = -1 bits (Go uint32 bitPos wrap, golomb.go:196-201), so sample
# codewords advance only by their prefix; wb = (1<<0)-1 = 0 zeroes mz but
# dynGet still adds v-1.  Entropy "1"+"01111": s0 (prefix 1) decodes value
# 0, mean stays 10 -> zero-run k32=4, run code pre=0 v=15 -> run 14 > 3
# remaining => ErrSampleOverrun (golomb.go:232-234).
PKT_ERR_KB0_RUN = bytes.fromhex("00001000000008000001017f")
# E2: escape SCE declaring 1000 samples (16000 raw bits) in an 11-byte
# packet — the raw region runs past the end (reference reads it
# sample-by-sample off the zero pad then crashes on the slice; this repo
# raises BitstreamOverrun up front, errors.py taxonomy).
PKT_ERR_ESCAPE_END = bytes.fromhex("000012000007d000000000")
# E3: partial-frame count 5000 > frame_length 4096 => SampleOverrun
# (decoder.go would write past its frame buffer; see element.py guard).
PKT_ERR_NS_OVER = bytes.fromhex("000010000027100000000000000000")


#: (depth, packet, want) triples covering every bit depth and both shift
#: widths; all mono SCE so they batch per-config.
DEPTH_VECTORS = [
    pytest.param(16, PKT_LPC_ORDER2_WALK, PCM_LPC_ORDER2_WALK, id="lpc-order2-signwalk"),
    pytest.param(24, PKT_24BIT_SHIFT, PCM_24BIT_SHIFT, id="24bit-shift1"),
    pytest.param(20, PKT_20BIT, PCM_20BIT, id="20bit-shl4"),
    pytest.param(32, PKT_32BIT_SHIFT2, PCM_32BIT_SHIFT2, id="32bit-shift2"),
]


@pytest.mark.parametrize("depth,packet,want", DEPTH_VECTORS)
def test_golden_depths_all_impls(depth, packet, want):
    cfg = make_config(depth=depth, channels=1)
    got, _ = oracle(cfg, packet)
    assert got == want
    if native.available():
        assert native.decode_packet(cfg, packet) == want
    assert JaxBatchDecoder(cfg).decode_packets([packet]) == [want]


def _edge_config():
    return make_config(depth=16, channels=1, pb=48, mb=0, kb=14)


def test_golden_zerorun_k32_edge_all_impls():
    cfg = _edge_config()
    got, _ = oracle(cfg, PKT_ZERORUN_K32_EDGE)
    assert got == PCM_ZERORUN_K32_EDGE
    if native.available():
        assert native.decode_packet(cfg, PKT_ZERORUN_K32_EDGE) == PCM_ZERORUN_K32_EDGE
    assert JaxBatchDecoder(cfg).decode_packets([PKT_ZERORUN_K32_EDGE]) == [
        PCM_ZERORUN_K32_EDGE
    ]


VECTORS = [
    pytest.param(1, PKT_ESCAPE_SCE, PCM_ESCAPE_SCE, id="escape-sce"),
    pytest.param(1, PKT_ORDER0_ZERORUN, PCM_ORDER0_ZERORUN, id="order0-zerorun"),
    pytest.param(1, PKT_ORDER31_DELTA, PCM_ORDER31_DELTA, id="order31-delta"),
    pytest.param(2, PKT_CPE_UNMIX, PCM_CPE_UNMIX, id="cpe-unmix"),
    pytest.param(1, PKT_LPC_ORDER1, PCM_LPC_ORDER1, id="lpc-order1-adapt"),
]


@pytest.mark.parametrize("channels,packet,want", VECTORS)
def test_golden_oracle(channels, packet, want):
    cfg = make_config(depth=16, channels=channels)
    got, _ = oracle(cfg, packet)
    assert got == want


@pytest.mark.parametrize("channels,packet,want", VECTORS)
@pytest.mark.skipif(not native.available(), reason="no native core")
def test_golden_native(channels, packet, want):
    cfg = make_config(depth=16, channels=channels)
    assert native.decode_packet(cfg, packet) == want


def test_golden_pbfactor2_all_impls():
    cfg = make_config(depth=16, channels=1)
    got, _ = oracle(cfg, PKT_PBFACTOR2)
    assert got == PCM_PBFACTOR2
    if native.available():
        assert native.decode_packet(cfg, PKT_PBFACTOR2) == PCM_PBFACTOR2
    assert JaxBatchDecoder(cfg).decode_packets([PKT_PBFACTOR2]) == [PCM_PBFACTOR2]


def test_golden_chanbits33_all_impls():
    """32-bit CPE compressed: chanBits=33 escape (Go uint32-wrap read).

    The device walk declines chanBits>32 lanes (walk_kernel bad_width) and
    falls back to the host implementations per design — decode_packets must
    still produce the literal PCM."""
    cfg = make_config(depth=32, channels=2)
    got, _ = oracle(cfg, PKT_CPE_CHANBITS33)
    assert got == PCM_CPE_CHANBITS33
    if native.available():
        assert native.decode_packet(cfg, PKT_CPE_CHANBITS33) == PCM_CPE_CHANBITS33
    assert JaxBatchDecoder(cfg).decode_packets([PKT_CPE_CHANBITS33]) == [
        PCM_CPE_CHANBITS33
    ]


def test_golden_zerorun_max_all_impls():
    """65535-sample zero run + the maxZeroRun zmode reset."""
    cfg = make_config(depth=16, channels=1, frame_length=65537)
    got, _ = oracle(cfg, PKT_ZERORUN_MAX)
    assert got == PCM_ZERORUN_MAX
    if native.available():
        assert native.decode_packet(cfg, PKT_ZERORUN_MAX) == PCM_ZERORUN_MAX
    # frame_length > 2^16 routes to the host path inside the batch facade.
    assert JaxBatchDecoder(cfg).decode_packets([PKT_ZERORUN_MAX]) == [PCM_ZERORUN_MAX]


def test_golden_8ch_layout_all_impls():
    cfg = make_config(depth=16, channels=8)
    got, _ = oracle(cfg, PKT_8CH_LAYOUT)
    assert got == PCM_8CH_LAYOUT
    if native.available():
        assert native.decode_packet(cfg, PKT_8CH_LAYOUT) == PCM_8CH_LAYOUT
    assert JaxBatchDecoder(cfg).decode_packets([PKT_8CH_LAYOUT]) == [PCM_8CH_LAYOUT]


# ---------------------------------------------------------------------------
# Vector 15 — multi-element packet: FIL + DSE + SCE in one stream.
#
# The skip elements (decoder.go:538-574) share the packet with a real SCE;
# a decoder that mis-sizes either skip desyncs the SCE that follows.
#   FIL (tag 110): count(4)=1 -> skip 1 fill byte (0xAA).  Ends at bit 15 —
#     deliberately NOT byte-aligned, so the DSE's align flag below has work.
#   DSE (tag 100): instance(4)=0, dataByteAlignFlag=1, count(8)=2;
#     ByteAlign consumes the one pad bit (bit 31 -> 32), then 2 data bytes
#     (0xDE 0xAD) are skipped.  Ends at bit 48 = byte 6, so the SCE that
#     follows is byte-for-byte vector 2 (order0-zerorun) and must produce
#     its exact PCM.
PKT_MULTI_ELEMENT = bytes.fromhex("c3550204dead") + PKT_ORDER0_ZERORUN
PCM_MULTI_ELEMENT = PCM_ORDER0_ZERORUN

# ---------------------------------------------------------------------------
# Vector 16 — multi-packet stream inside a literal CAF container.
#
# The container path has its own failure modes (chunk walk, VLQ packet
# table, data-chunk edit count) that per-packet vectors never touch.  This
# blob is a complete hand-assembled CAF file (Apple CAF spec layout; every
# field literal):
#   'caff' v1; 'desc' (rate f64 44100, fmt 'alac', fpp 4096, 1 ch);
#   'kuki' = 24-byte ALACSpecificConfig (4096/16-bit/pb40/mb10/kb14/1ch/
#   maxRun 255/44100); 'pakt' numPackets=3 validFrames=16 + VLQ sizes
#   [15,16,16]; 'data' edit-count u32=0 + the three packet payloads:
#   vector 2 (order0-zerorun, ns=8) + vector 5 (lpc-order1, ns=4) +
#   vector 1 (escape-sce, ns=4).
# Expected stream PCM = the three vectors' PCM concatenated (16 samples).
CAF_GOLDEN = bytes.fromhex(
    "636166660001000064657363000000000000002040e58880000000006"
    "16c616300000000000000000000100000000001000000006b756b6900"
    "00000000000018000010000010280a0e0100ff0000000000000000000"
    "0ac4470616b74000000000000001b00000000000000030000000000000"
    "01000000000000000000f1010646174610000000000000033000000000"
    "000100000001000000101a0f5fb800000100000000800000302000"
    "5fb6ee0000012000000080003fffeffff0001c0"
)
PCM_STREAM_GOLDEN = (
    PCM_ORDER0_ZERORUN + PCM_LPC_ORDER1 + PCM_ESCAPE_SCE
)


GOLDEN_ERRORS = [
    pytest.param(
        dict(depth=16, channels=1, kb=0), PKT_ERR_KB0_RUN, id="kb0-zerorun-overrun"
    ),
    pytest.param(
        dict(depth=16, channels=1), PKT_ERR_ESCAPE_END, id="escape-past-end"
    ),
    pytest.param(dict(depth=16, channels=1), PKT_ERR_NS_OVER, id="partial-ns-over"),
]


@pytest.mark.parametrize("cfgkw,packet", GOLDEN_ERRORS)
def test_golden_error_vectors_all_impls(cfgkw, packet):
    """Literal malformed packets must raise the typed taxonomy everywhere.

    The device path flags the lane and re-runs it through the oracle
    (finish_async), so the same exception type surfaces from all three
    entry points."""
    from saprobe_alac_tpu.errors import DecodeError

    cfg = make_config(**cfgkw)
    with pytest.raises(DecodeError):
        oracle(cfg, packet)
    if native.available():
        # The native core reports a nonzero error code for the batch.
        _, _, errs = native.decode_batch(cfg, [packet])
        assert errs[0] != 0
    with pytest.raises(DecodeError):
        JaxBatchDecoder(cfg).decode_packets([packet])


def test_golden_multi_element_all_impls():
    """FIL + DSE + SCE sharing one packet (vector 15)."""
    cfg = make_config(depth=16, channels=1)
    got, _ = oracle(cfg, PKT_MULTI_ELEMENT)
    assert got == PCM_MULTI_ELEMENT
    if native.available():
        assert native.decode_packet(cfg, PKT_MULTI_ELEMENT) == PCM_MULTI_ELEMENT
    assert JaxBatchDecoder(cfg).decode_packets([PKT_MULTI_ELEMENT]) == [
        PCM_MULTI_ELEMENT
    ]


def test_golden_caf_container_stream():
    """Literal CAF file -> literal stream PCM, through the full container
    path (sniff, chunk walk, VLQ packet table) on every backend; plus
    seek back into the middle packet (vector 16)."""
    import io

    from saprobe_alac_tpu.decode import Decoder

    for backend in ("scalar", "native", "jax"):
        if backend == "native" and not native.available():
            continue
        dec = Decoder(io.BytesIO(CAF_GOLDEN), backend=backend, batch_size=2)
        fmt = dec.format()
        assert (fmt.sample_rate, fmt.bit_depth, fmt.channels) == (44100, 16, 1)
        assert dec.read() == PCM_STREAM_GOLDEN
        # Packet 2 starts at sample 8 (packet 1 is a partial frame of 8
        # samples but seek math is frame_length-aligned: the table index for
        # t just past 0 is still 0) — verify a mid-stream reposition.
        dec.seek(0.0)
        assert dec.read(4) == PCM_STREAM_GOLDEN[:4]
        assert dec.read() == PCM_STREAM_GOLDEN[4:]


def test_golden_multi_packet_stream_batch():
    """The three stream packets as one device batch (vector 16's payload),
    preserving per-packet partial-frame truncation."""
    cfg = make_config(depth=16, channels=1)
    got = JaxBatchDecoder(cfg).decode_packets(
        [PKT_ORDER0_ZERORUN, PKT_LPC_ORDER1, PKT_ESCAPE_SCE]
    )
    assert b"".join(got) == PCM_STREAM_GOLDEN


def test_golden_device_batch():
    """All vectors of one shape through the device pipeline in one batch."""
    cfg = make_config(depth=16, channels=1)
    mono = [(p, w) for ch, p, w in
            [(1, PKT_ESCAPE_SCE, PCM_ESCAPE_SCE),
             (1, PKT_ORDER0_ZERORUN, PCM_ORDER0_ZERORUN),
             (1, PKT_ORDER31_DELTA, PCM_ORDER31_DELTA),
             (1, PKT_LPC_ORDER1, PCM_LPC_ORDER1)] if ch == 1]
    got = JaxBatchDecoder(cfg).decode_packets([p for p, _ in mono])
    assert got == [w for _, w in mono]

    cfg2 = make_config(depth=16, channels=2)
    got2 = JaxBatchDecoder(cfg2).decode_packets([PKT_CPE_UNMIX])
    assert got2 == [PCM_CPE_UNMIX]
