"""ctypes binding to the C++ native decode core (native/alac_core.cpp).

Builds the shared library on demand with g++ (no pybind11 in this image).
``-fwrapv`` is required: the codec math relies on wrapping int32 like Go.
Falls back gracefully (available() == False) when no compiler is present.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
import threading
from pathlib import Path

import numpy as np

from ..config import PacketConfig
from ..errors import (
    BitstreamOverrun,
    DecodeError,
    InvalidHeader,
    InvalidShift,
    SampleOverrun,
    UnsupportedElement,
)
from ..formats import bytes_per_sample

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "alac_core.cpp"
_SRC_ENC = _REPO_ROOT / "native" / "alac_encode.cpp"
_SO = Path(__file__).resolve().parent / "_alac_core.so"
_HASH = _SO.with_suffix(".so.sha256")  # content hash of the sources the .so was built from


def _src_digest() -> str:
    h = hashlib.sha256()
    for src in (_SRC, _SRC_ENC):
        if src.exists():
            h.update(src.read_bytes())
    return h.hexdigest()

_lock = threading.Lock()
_lib = None
_build_error: str | None = None

_ERROR_MAP = {
    1: BitstreamOverrun,
    2: UnsupportedElement,
    3: InvalidHeader,
    4: InvalidShift,
    5: SampleOverrun,
}


class _ConfigC(ctypes.Structure):
    _fields_ = [
        ("frame_length", ctypes.c_uint32),
        ("bit_depth", ctypes.c_uint32),
        ("num_channels", ctypes.c_uint32),
        ("pb", ctypes.c_uint32),
        ("mb", ctypes.c_uint32),
        ("kb", ctypes.c_uint32),
        ("max_run", ctypes.c_uint32),
    ]


class _EncSpecC(ctypes.Structure):
    _fields_ = [
        ("order", ctypes.c_int32),
        ("den_shift", ctypes.c_int32),
        ("pb_factor", ctypes.c_int32),
        ("mode", ctypes.c_int32),
        ("mix_bits", ctypes.c_int32),
        ("mix_res", ctypes.c_int32),
        ("bytes_shifted", ctypes.c_int32),
        ("force_escape", ctypes.c_int32),
        ("auto_escape", ctypes.c_int32),
        ("use_lfe_tag", ctypes.c_int32),
        ("fit", ctypes.c_int32),
        ("coefs", ctypes.c_int16 * 32),
    ]


def _build() -> str | None:
    """Compile the shared library; returns an error string or None."""
    if not _SRC.exists():
        return f"source not found: {_SRC}"
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-fwrapv",  # wrapping signed arithmetic (Go/int32 semantics)
        "-fopenmp",
        "-o",
        str(_SO),
        str(_SRC),
        str(_SRC_ENC),
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as exc:
        return f"g++ invocation failed: {exc}"
    if proc.returncode != 0:
        return f"g++ failed:\n{proc.stderr}"
    try:
        _HASH.write_text(_src_digest())
    except OSError:
        pass  # read-only tree: the .so still works, just rebuilds next import
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        # Rebuild keyed on a source content hash, not mtimes: git does not
        # preserve mtimes, so a fresh clone would otherwise load a stale .so.
        stale = _SO.exists() and (
            not _HASH.exists() or _HASH.read_text().strip() != _src_digest()
        )
        if not _SO.exists() or stale:
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as exc:
            _build_error = str(exc)
            return None
        lib.alac_decode_packet.restype = ctypes.c_int32
        lib.alac_decode_packet.argtypes = [
            ctypes.POINTER(_ConfigC),
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.alac_encode_packet.restype = ctypes.c_int32
        lib.alac_encode_packet.argtypes = [
            ctypes.POINTER(_ConfigC),
            ctypes.POINTER(_EncSpecC),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.alac_decode_batch.restype = ctypes.c_int32
        lib.alac_decode_batch.argtypes = [
            ctypes.POINTER(_ConfigC),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.alac_pack_packets.restype = ctypes.c_int32
        lib.alac_pack_packets.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native core is built and loadable."""
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def _config_c(config: PacketConfig) -> _ConfigC:
    return _ConfigC(
        frame_length=config.frame_length,
        bit_depth=config.bit_depth,
        num_channels=config.num_channels,
        pb=config.pb,
        mb=config.mb,
        kb=config.kb,
        max_run=config.max_run,
    )


def _raise_for(code: int) -> None:
    exc = _ERROR_MAP.get(code, DecodeError)
    raise exc(f"native decode error code {code}")


def decode_packet(config: PacketConfig, packet: bytes) -> bytes:
    """Decode one packet via the native core (bit-exact vs the oracle)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native core unavailable: {_build_error}")
    cap = config.frame_length * config.num_channels * bytes_per_sample(config.bit_depth)
    out = np.empty(cap, dtype=np.uint8)
    out_len = ctypes.c_int32(0)
    rc = lib.alac_decode_packet(
        ctypes.byref(_config_c(config)),
        packet,
        len(packet),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
        ctypes.byref(out_len),
    )
    if rc != 0:
        _raise_for(rc)
    return out[: out_len.value].tobytes()


def decode_batch(
    config: PacketConfig, packets: list[bytes], n_threads: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threaded batch decode.  Returns (out rows uint8 (B, stride), lens, errs)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native core unavailable: {_build_error}")
    count = len(packets)
    stride = config.frame_length * config.num_channels * bytes_per_sample(config.bit_depth)
    flat = np.frombuffer(b"".join(packets), dtype=np.uint8)
    if flat.size == 0:
        flat = np.zeros(1, dtype=np.uint8)
    offsets = np.zeros(count, dtype=np.int64)
    sizes = np.zeros(count, dtype=np.int32)
    pos = 0
    for i, p in enumerate(packets):
        offsets[i] = pos
        sizes[i] = len(p)
        pos += len(p)
    out = np.zeros((count, stride), dtype=np.uint8)
    lens = np.zeros(count, dtype=np.int32)
    errs = np.zeros(count, dtype=np.int32)
    lib.alac_decode_batch(
        ctypes.byref(_config_c(config)),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        stride,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        errs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return out, lens, errs


def encode_packet(config: PacketConfig, spec, samples: np.ndarray) -> bytes:
    """Encode one packet via the native core.

    ``spec`` is an encoder.EncoderSpec; ``samples`` is (ns, channels)
    integer PCM in SMPTE order.  Initial LPC coefficients are fitted here
    (cheap) and passed in; the per-sample loops run natively.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native core unavailable: {_build_error}")

    from ..encoder.encode import ChannelSpec

    ch: ChannelSpec = spec.channel
    # Fallback coefficients for degenerate blocks; when ch.fit is on and no
    # explicit coefficients are pinned, the C++ core re-fits per channel per
    # packet (Levinson-Durbin on the post-mix data) and ignores these.
    coefs = ch.initial_coefs(samples[:, 0].astype(np.int64) if ch.order not in (0, 31) else None)
    c_arr = (ctypes.c_int16 * 32)(*([int(c) for c in coefs] + [0] * (32 - len(coefs))))
    sp = _EncSpecC(
        order=ch.order,
        den_shift=ch.den_shift,
        pb_factor=ch.pb_factor,
        mode=ch.mode,
        mix_bits=max(spec.mix_bits, 0),
        mix_res=spec.mix_res,
        bytes_shifted=spec.bytes_shifted,
        force_escape=int(spec.escape),
        auto_escape=int(spec.auto_escape),
        use_lfe_tag=int(spec.use_lfe_tag),
        fit=int(ch.fit and not ch.coefs),
        coefs=c_arr,
    )
    ns, channels = samples.shape
    flat = np.ascontiguousarray(samples.astype(np.int32).reshape(-1))
    # Worst case per channel-sample: shift region (<=16 bits) + Golomb escape
    # (9 + chan_bits <= 9 + depth + 1 bits); budget 8 bytes/sample + headers.
    cap = ns * channels * 8 + 4096 * channels
    out = np.empty(cap, dtype=np.uint8)
    rc = lib.alac_encode_packet(
        ctypes.byref(_config_c(config)),
        ctypes.byref(sp),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ns,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
    )
    if rc < 0:
        raise ValueError(f"native encode failed with code {rc}")
    return out[:rc].tobytes()


def pack_packets(packets, w_words: int) -> np.ndarray:
    """Batch packets into a (B, w_words) big-endian-bit-order word array
    via the threaded C++ packer.  Raises RuntimeError if unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native core unavailable: {_build_error}")
    flat = np.frombuffer(b"".join(packets), dtype=np.uint8)
    if flat.size == 0:
        flat = np.zeros(1, dtype=np.uint8)
    sizes = np.array([len(p) for p in packets], dtype=np.int32)
    offsets = np.zeros(len(packets), dtype=np.int64)
    if len(packets) > 1:
        np.cumsum(sizes[:-1], out=offsets[1:])
    out = np.empty((len(packets), w_words), dtype=np.uint32)
    rc = lib.alac_pack_packets(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(packets),
        w_words,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    if rc != 0:
        raise RuntimeError(f"alac_pack_packets failed: {rc}")
    return out.view(np.int32)
