"""Host-side rANS coder: ctypes bindings to the native library.

Public API mirrors the reference's ``MLCodec_rans`` pybind module
(``src/cpp/py_rans/py_rans.cpp:261-281``):

    RansEncoder(multi_thread, stream_part).{add_cdf, encode_with_indexes,
        flush, get_encoded_stream, reset, empty_cdf_buffer}
    RansDecoder(stream_part).{add_cdf, set_stream, decode_stream,
        empty_cdf_buffer}

plus ``pmf_to_quantized_cdf`` (reference ``MLCodec_CXX``). A pure-Python
implementation (`PyRansEncoder`/`PyRansDecoder`) provides both a fallback
when no C++ toolchain exists and an executable spec the native library is
cross-tested against.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_PRECISION = 16
_RANS_L = 1 << 23
_BYPASS_BITS = 2
_MAX_BYPASS = (1 << _BYPASS_BITS) - 1

_CPP_DIR = Path(__file__).parent / "cpp"
# ONEDC_RANS_LIB overrides the library path (e.g. the TSAN build
# libonedc_rans_tsan.so from `make tsan`, used by the race stress test)
_LIB_PATH = Path(os.environ.get("ONEDC_RANS_LIB",
                                _CPP_DIR / "libonedc_rans.so"))
_build_lock = threading.Lock()
_lib = None
_lib_tried = False


def _build_native() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=str(_CPP_DIR), check=True,
            capture_output=True, timeout=180,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_native_lib():
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    with _build_lock:
        if _lib is not None or _lib_tried:
            return _lib
        _lib_tried = True
        if not _LIB_PATH.exists() and os.environ.get("ONEDC_NO_NATIVE") != "1":
            _build_native()
        if not _LIB_PATH.exists():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        i32p = ctypes.POINTER(ctypes.c_int32)
        i16p = ctypes.POINTER(ctypes.c_int16)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.onedc_encoder_new.restype = ctypes.c_void_p
        lib.onedc_encoder_new.argtypes = [ctypes.c_int]
        lib.onedc_encoder_free.argtypes = [ctypes.c_void_p]
        lib.onedc_encoder_add_cdf.restype = ctypes.c_int
        lib.onedc_encoder_add_cdf.argtypes = [
            ctypes.c_void_p, i32p, ctypes.c_int, ctypes.c_int, i32p, i32p]
        lib.onedc_encoder_encode.argtypes = [
            ctypes.c_void_p, i16p, i16p, ctypes.c_int, ctypes.c_int]
        lib.onedc_encoder_flush.argtypes = [ctypes.c_void_p]
        lib.onedc_encoder_stream_size.restype = ctypes.c_int
        lib.onedc_encoder_stream_size.argtypes = [ctypes.c_void_p]
        lib.onedc_encoder_get_stream.argtypes = [ctypes.c_void_p, u8p]
        lib.onedc_encoder_reset.argtypes = [ctypes.c_void_p]
        lib.onedc_encoder_clear_cdfs.argtypes = [ctypes.c_void_p]
        lib.onedc_decoder_new.restype = ctypes.c_void_p
        lib.onedc_decoder_new.argtypes = [ctypes.c_int]
        lib.onedc_decoder_free.argtypes = [ctypes.c_void_p]
        lib.onedc_decoder_add_cdf.restype = ctypes.c_int
        lib.onedc_decoder_add_cdf.argtypes = [
            ctypes.c_void_p, i32p, ctypes.c_int, ctypes.c_int, i32p, i32p]
        lib.onedc_decoder_set_stream.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int]
        lib.onedc_decoder_decode.argtypes = [
            ctypes.c_void_p, i16p, ctypes.c_int, ctypes.c_int, i16p]
        lib.onedc_decoder_decode_multi.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int, i16p,
            ctypes.c_int, ctypes.c_int, i16p]
        lib.onedc_decoder_clear_cdfs.argtypes = [ctypes.c_void_p]
        lib.onedc_pmf_to_quantized_cdf.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, u32p]
        _lib = lib
        return _lib


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _as_i16(a):
    return np.ascontiguousarray(a, dtype=np.int16).reshape(-1)


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


# ---------------------------------------------------------------------------
# PMF -> quantized CDF
# ---------------------------------------------------------------------------

def pmf_to_quantized_cdf_np(pmf: np.ndarray, precision: int = _PRECISION) -> np.ndarray:
    """Pure-numpy CDF quantizer; semantics of reference ops.cpp:24-82.

    Float32 rounding of p * 2^precision, +0.5 truncation, integer
    renormalization to a total of 2^precision, then frequency stealing from
    the smallest freq>1 bucket to enforce a strictly increasing CDF.
    """
    pmf = np.asarray(pmf, dtype=np.float32)
    n = pmf.shape[0]
    cdf = np.zeros(n + 1, dtype=np.uint64)
    cdf[1:] = (np.round(pmf * np.float32(1 << precision)).astype(np.float64)
               + 0.5).astype(np.uint64)
    total = int(cdf.sum())
    if total == 0:
        total = 1
    cdf = ((1 << precision) * cdf) // total
    cdf = np.cumsum(cdf, dtype=np.uint64)
    cdf[-1] = 1 << precision
    cdf = cdf.astype(np.int64)
    for i in range(n):
        if cdf[i] != cdf[i + 1]:
            continue
        freqs = cdf[1:] - cdf[:-1]
        candidates = np.where(freqs > 1)[0]
        if candidates.size == 0:
            continue
        best_steal = candidates[np.argmin(freqs[candidates])]
        if best_steal < i:
            cdf[best_steal + 1:i + 1] -= 1
        else:
            cdf[i + 1:best_steal + 1] += 1
    return cdf.astype(np.uint32)


def pmf_to_quantized_cdf(pmf, precision: int = _PRECISION) -> np.ndarray:
    lib = get_native_lib()
    pmf = np.ascontiguousarray(pmf, dtype=np.float32)
    if lib is None:
        return pmf_to_quantized_cdf_np(pmf, precision)
    out = np.empty(pmf.shape[0] + 1, dtype=np.uint32)
    lib.onedc_pmf_to_quantized_cdf(
        _ptr(pmf, ctypes.c_float), pmf.shape[0], precision,
        _ptr(out, ctypes.c_uint32))
    return out


# ---------------------------------------------------------------------------
# Pure-Python coder (spec + fallback)
# ---------------------------------------------------------------------------

class _PyPart:
    def __init__(self):
        self.syms: list[tuple[int, int]] = []  # (start, range); range 0 = raw
        self.stream = b""

    def encode(self, symbols, indexes, cdf_group):
        cdfs, sizes, offsets = cdf_group
        for sym, idx in zip(symbols.tolist(), indexes.tolist()):
            if idx < 0:
                continue
            max_value = int(sizes[idx]) - 2
            value = int(sym) - int(offsets[idx])
            raw_val = 0
            if value < 0:
                raw_val = -2 * value - 1
                value = max_value
            elif value >= max_value:
                raw_val = 2 * (value - max_value)
                value = max_value
            row = cdfs[idx]
            self.syms.append((int(row[value]), int(row[value + 1] - row[value])))
            if value == max_value:
                n_bypass = 0
                while (raw_val >> (n_bypass * _BYPASS_BITS)) != 0:
                    n_bypass += 1
                v = n_bypass
                while v >= _MAX_BYPASS:
                    self.syms.append((_MAX_BYPASS, 0))
                    v -= _MAX_BYPASS
                self.syms.append((v, 0))
                for j in range(n_bypass):
                    self.syms.append(
                        ((raw_val >> (j * _BYPASS_BITS)) & _MAX_BYPASS, 0))

    def flush(self):
        x = _RANS_L
        out = bytearray()
        for start, rng in reversed(self.syms):
            if rng != 0:
                x_max = rng << 15
                while x >= x_max:
                    out.append(x & 0xFF)
                    x >>= 8
                x = ((x // rng) << _PRECISION) + (x % rng) + start
            else:
                freq = 1 << (_PRECISION - _BYPASS_BITS)
                x_max = freq << 15
                while x >= x_max:
                    out.append(x & 0xFF)
                    x >>= 8
                x = (x << _BYPASS_BITS) | start
        out += bytes([(x >> 24) & 0xFF, (x >> 16) & 0xFF,
                      (x >> 8) & 0xFF, x & 0xFF])
        self.stream = bytes(reversed(out))

    def reset(self):
        self.syms = []
        self.stream = b""


class PyRansEncoder:
    """Pure-Python encoder with the multi-part container format."""

    def __init__(self, multi_thread: bool = False, stream_part: int = 1):
        del multi_thread  # no host threads in the Python fallback
        self.parts = [_PyPart() for _ in range(max(1, stream_part))]
        self.groups: list[tuple] = []

    def add_cdf(self, cdfs, cdfs_sizes, offsets) -> int:
        cdfs = _as_i32(cdfs)
        self.groups.append((cdfs, _as_i32(cdfs_sizes).reshape(-1),
                            _as_i32(offsets).reshape(-1)))
        return len(self.groups) - 1

    def empty_cdf_buffer(self):
        self.groups = []

    def encode_with_indexes(self, symbols, indexes, cdf_group_index: int):
        symbols = _as_i16(symbols)
        indexes = _as_i16(indexes)
        n = symbols.shape[0]
        np_ = len(self.parts)
        each = n // np_
        for p, part in enumerate(self.parts):
            off = p * each
            cnt = n - off if p == np_ - 1 else each
            part.encode(symbols[off:off + cnt], indexes[off:off + cnt],
                        self.groups[cdf_group_index])

    def flush(self):
        for part in self.parts:
            part.flush()

    def get_encoded_stream(self) -> np.ndarray:
        streams = [p.stream for p in self.parts]
        n_parts = len(streams)
        maximum = max((len(s) for s in streams[:-1]), default=0)
        per_header = 4 if maximum > 65535 else 2
        overhead = 1 + (n_parts - 1) * per_header if n_parts > 1 else 1
        out = bytearray(overhead)
        out[0] = ((n_parts - 1) << 4) + (1 if per_header == 2 else 0)
        for i, s in enumerate(streams[:-1]):
            out[1 + per_header * i:1 + per_header * (i + 1)] = len(s).to_bytes(
                per_header, "little")
        for s in streams:
            out += s
        return np.frombuffer(bytes(out), dtype=np.uint8)

    def reset(self):
        for part in self.parts:
            part.reset()


class _PyPartDecoder:
    def __init__(self, data: bytes):
        self.data = data + b"\x00" * 8
        self.x = int.from_bytes(data[:4], "little")
        self.pos = 4

    def _advance(self, start, freq):
        mask = (1 << _PRECISION) - 1
        self.x = freq * (self.x >> _PRECISION) + (self.x & mask) - start
        while self.x < _RANS_L:
            self.x = (self.x << 8) | self.data[self.pos]
            self.pos += 1

    def _get_bits(self, nbits):
        val = self.x & ((1 << nbits) - 1)
        self.x >>= nbits
        if self.x < _RANS_L:
            self.x = (self.x << 8) | self.data[self.pos]
            self.pos += 1
        return val

    def decode(self, indexes, cdf_group):
        cdfs, sizes, offsets = cdf_group
        out = np.zeros(indexes.shape[0], dtype=np.int16)
        for i, idx in enumerate(indexes.tolist()):
            if idx < 0:
                continue
            row = cdfs[idx]
            size = int(sizes[idx])
            max_value = size - 2
            cum = self.x & ((1 << _PRECISION) - 1)
            s = int(np.searchsorted(row[:size], cum, side="right")) - 1
            self._advance(int(row[s]), int(row[s + 1] - row[s]))
            value = s
            if value == max_value:
                v = self._get_bits(_BYPASS_BITS)
                n_bypass = v
                while v == _MAX_BYPASS:
                    v = self._get_bits(_BYPASS_BITS)
                    n_bypass += v
                raw_val = 0
                for j in range(n_bypass):
                    raw_val |= self._get_bits(_BYPASS_BITS) << (j * _BYPASS_BITS)
                value = raw_val >> 1
                if raw_val & 1:
                    value = -value - 1
                else:
                    value += max_value
            out[i] = value + int(offsets[idx])
        return out


class PyRansDecoder:
    def __init__(self, stream_part: int = 1):
        self.n_parts = max(1, stream_part)
        self.decoders: list[_PyPartDecoder] = []
        self.groups: list[tuple] = []

    def add_cdf(self, cdfs, cdfs_sizes, offsets) -> int:
        self.groups.append((_as_i32(cdfs), _as_i32(cdfs_sizes).reshape(-1),
                            _as_i32(offsets).reshape(-1)))
        return len(self.groups) - 1

    def empty_cdf_buffer(self):
        self.groups = []

    def set_stream(self, encoded: np.ndarray):
        data = np.asarray(encoded, dtype=np.uint8).tobytes()
        flag = data[0]
        n_streams = (flag >> 4) + 1
        per_header = 2 if (flag & 0x0F) == 1 else 4
        sizes = []
        off = 1
        declared = 0
        for _ in range(n_streams - 1):
            s = int.from_bytes(data[off:off + per_header], "little")
            off += per_header
            sizes.append(s)
            declared += s
        sizes.append(len(data) - off - declared)
        self.decoders = []
        for s in sizes:
            self.decoders.append(_PyPartDecoder(data[off:off + s]))
            off += s

    def decode_stream(self, indexes, cdf_group_index: int) -> np.ndarray:
        indexes = _as_i16(indexes)
        n = indexes.shape[0]
        each = n // self.n_parts
        outs = []
        for p, dec in enumerate(self.decoders):
            off = p * each
            cnt = n - off if p == self.n_parts - 1 else each
            outs.append(dec.decode(indexes[off:off + cnt],
                                   self.groups[cdf_group_index]))
        return np.concatenate(outs) if len(outs) > 1 else outs[0]


# ---------------------------------------------------------------------------
# Native coder (ctypes)
# ---------------------------------------------------------------------------

class NativeRansEncoder:
    def __init__(self, multi_thread: bool = False, stream_part: int = 1):
        del multi_thread  # parts are flushed on std::threads natively
        self._lib = get_native_lib()
        self._h = self._lib.onedc_encoder_new(max(1, stream_part))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.onedc_encoder_free(self._h)
            self._h = None

    def add_cdf(self, cdfs, cdfs_sizes, offsets) -> int:
        cdfs = _as_i32(cdfs)
        sizes = _as_i32(cdfs_sizes).reshape(-1)
        offs = _as_i32(offsets).reshape(-1)
        return self._lib.onedc_encoder_add_cdf(
            self._h, _ptr(cdfs, ctypes.c_int32), cdfs.shape[0], cdfs.shape[1],
            _ptr(sizes, ctypes.c_int32), _ptr(offs, ctypes.c_int32))

    def empty_cdf_buffer(self):
        self._lib.onedc_encoder_clear_cdfs(self._h)

    def encode_with_indexes(self, symbols, indexes, cdf_group_index: int):
        symbols = _as_i16(symbols)
        indexes = _as_i16(indexes)
        self._lib.onedc_encoder_encode(
            self._h, _ptr(symbols, ctypes.c_int16), _ptr(indexes, ctypes.c_int16),
            symbols.shape[0], cdf_group_index)

    def flush(self):
        self._lib.onedc_encoder_flush(self._h)

    def get_encoded_stream(self) -> np.ndarray:
        n = self._lib.onedc_encoder_stream_size(self._h)
        out = np.empty(n, dtype=np.uint8)
        if n:
            self._lib.onedc_encoder_get_stream(self._h, _ptr(out, ctypes.c_uint8))
        return out

    def reset(self):
        self._lib.onedc_encoder_reset(self._h)


class NativeRansDecoder:
    def __init__(self, stream_part: int = 1):
        self._lib = get_native_lib()
        self._h = self._lib.onedc_decoder_new(max(1, stream_part))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.onedc_decoder_free(self._h)
            self._h = None

    def add_cdf(self, cdfs, cdfs_sizes, offsets) -> int:
        cdfs = _as_i32(cdfs)
        sizes = _as_i32(cdfs_sizes).reshape(-1)
        offs = _as_i32(offsets).reshape(-1)
        return self._lib.onedc_decoder_add_cdf(
            self._h, _ptr(cdfs, ctypes.c_int32), cdfs.shape[0], cdfs.shape[1],
            _ptr(sizes, ctypes.c_int32), _ptr(offs, ctypes.c_int32))

    def empty_cdf_buffer(self):
        self._lib.onedc_decoder_clear_cdfs(self._h)

    def set_stream(self, encoded):
        data = np.ascontiguousarray(np.asarray(encoded, dtype=np.uint8))
        self._lib.onedc_decoder_set_stream(
            self._h, _ptr(data, ctypes.c_uint8), data.shape[0])

    def decode_stream(self, indexes, cdf_group_index: int) -> np.ndarray:
        indexes = _as_i16(indexes)
        out = np.empty(indexes.shape[0], dtype=np.int16)
        self._lib.onedc_decoder_decode(
            self._h, _ptr(indexes, ctypes.c_int16), indexes.shape[0],
            cdf_group_index, _ptr(out, ctypes.c_int16))
        return out


def decode_streams_multi(decoders, indexes, cdf_group_index: int):
    """Decode the same-length index rows of several INDEPENDENT decoders
    in ONE native call (one ctypes round trip per serving chunk instead
    of one per stream; an ILP state-chain interleave was measured slower
    — see decode_multi in onedc_rans.cpp). ``indexes``: (n_dec, n)
    int16. Returns (n_dec, n) int16, identical to calling
    ``decode_stream`` per decoder. Falls back to the per-decoder loop
    when any decoder is the pure-Python one."""
    indexes = np.ascontiguousarray(indexes, dtype=np.int16)
    assert indexes.ndim == 2 and indexes.shape[0] == len(decoders)
    lib = get_native_lib()
    if lib is None or not all(isinstance(d, NativeRansDecoder)
                              for d in decoders):
        return np.stack([d.decode_stream(indexes[i], cdf_group_index)
                         for i, d in enumerate(decoders)])
    n_dec, n = indexes.shape
    handles = (ctypes.c_void_p * n_dec)(*[d._h for d in decoders])
    out = np.empty((n_dec, n), dtype=np.int16)
    lib.onedc_decoder_decode_multi(
        handles, n_dec, _ptr(indexes, ctypes.c_int16), n,
        cdf_group_index, _ptr(out, ctypes.c_int16))
    return out


def RansEncoder(multi_thread: bool = False, stream_part: int = 1):
    """Factory mirroring the reference constructor signature."""
    if get_native_lib() is not None:
        return NativeRansEncoder(multi_thread, stream_part)
    return PyRansEncoder(multi_thread, stream_part)


def RansDecoder(stream_part: int = 1):
    if get_native_lib() is not None:
        return NativeRansDecoder(stream_part)
    return PyRansDecoder(stream_part)
