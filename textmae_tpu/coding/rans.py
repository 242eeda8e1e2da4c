"""rANS bitstream codec: ctypes bindings over the C++ runtime + pure-Python mirror.

API shape follows the reference's native coder surface (compressai
`BufferedRansEncoder`/`RansDecoder`, used at
/root/reference/models/Compression/MCM.py:845-887, 917-944):

    enc = RansEncoder()
    enc.encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)  # xN
    stream: bytes = enc.flush()

    dec = RansDecoder()
    dec.set_stream(stream)
    symbols = dec.decode_stream(indexes, cdfs, cdf_lengths, offsets)       # xN

but takes numpy arrays, not Python lists — the device produces symbol/index
tensors and the host codes them without a `.tolist()` round trip (the
reference's per-slice `.tolist()` at MCM.py:872-873 is the anti-pattern this
design removes).

Stream format (shared bit-exactly by C++ and Python paths): see csrc/rans.cpp.
"""
from __future__ import annotations

import ctypes
from typing import List, Optional

import numpy as np

_PROB_BITS = 16
_RANS_L = 1 << 31
_MASK64 = (1 << 64) - 1

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    try:
        from textmae_tpu.coding.build import build

        path = build()
        lib = ctypes.CDLL(str(path))
    except Exception as e:
        import warnings

        # cached for the process lifetime: every coder falls back to the
        # ~100x slower Python mirror, so say why, loudly, once
        warnings.warn(
            f"textmae_tpu native rANS extension unavailable ({e!r}); "
            "falling back to the pure-Python coder for this process "
            "(same stream format, much slower)",
            RuntimeWarning,
        )
        _lib = False
        return False

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.tm_enc_new.restype = ctypes.c_void_p
    lib.tm_enc_free.argtypes = [ctypes.c_void_p]
    lib.tm_enc_reset.argtypes = [ctypes.c_void_p]
    lib.tm_enc_encode_with_indexes.restype = ctypes.c_int
    lib.tm_enc_encode_with_indexes.argtypes = [
        ctypes.c_void_p, i32p, i32p, ctypes.c_int64,
        i32p, ctypes.c_int32, ctypes.c_int32, i32p, i32p,
    ]
    lib.tm_enc_flush.restype = ctypes.c_int64
    lib.tm_enc_flush.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.tm_dec_new.restype = ctypes.c_void_p
    lib.tm_dec_free.argtypes = [ctypes.c_void_p]
    lib.tm_dec_set_stream.restype = ctypes.c_int
    lib.tm_dec_set_stream.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.tm_dec_decode_stream.restype = ctypes.c_int
    lib.tm_dec_decode_stream.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int64,
        i32p, ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p,
    ]
    if hasattr(lib, "tm_dec_decode_subset"):
        lib.tm_dec_decode_subset.restype = ctypes.c_int
        lib.tm_dec_decode_subset.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, i32p,
            i32p, ctypes.c_int32, ctypes.c_int32, i32p,
            ctypes.POINTER(ctypes.c_uint8),
        ]
    lib.tm_pmf_to_quantized_cdf.restype = ctypes.c_int
    lib.tm_pmf_to_quantized_cdf.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, i32p,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return bool(_load_lib())


# --------------------------------------------------------------------------
# Coder registry (testing.py:176-179/208 parity: compressai's
# available_entropy_coders() / set_entropy_coder() CLI surface)
# --------------------------------------------------------------------------
_DEFAULT_CODER = "rans"


def available_entropy_coders() -> List[str]:
    """Selectable coder backends: "rans" (C++ when built, else the Python
    mirror) and "rans-python" (force the mirror; same stream format)."""
    return ["rans", "rans-python"]


def set_entropy_coder(name: str) -> None:
    """Set the process-wide default backend for RansEncoder/RansDecoder."""
    if name not in available_entropy_coders():
        raise ValueError(
            f"unknown entropy coder {name!r}; available: {available_entropy_coders()}"
        )
    global _DEFAULT_CODER
    _DEFAULT_CODER = name


def get_entropy_coder() -> str:
    return _DEFAULT_CODER


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).reshape(-1), dtype=np.int32)


def pmf_to_quantized_cdf_native(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """C++ pmf->CDF (bit-identical to entropy.tables.pmf_to_quantized_cdf)."""
    lib = _load_lib()
    pmf = np.ascontiguousarray(pmf, dtype=np.float64)
    out = np.empty(len(pmf) + 1, np.int32)
    rc = lib.tm_pmf_to_quantized_cdf(pmf, len(pmf), precision, out)
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed (rc={rc})")
    return out


# ---------------------------------------------------------------------------
# Pure-Python mirror (same stream format; used when the .so can't build)
# ---------------------------------------------------------------------------
def _symbol_ops(symbols, indexes, cdfs, cdf_lengths, offsets, ops: List):
    for sym, idx in zip(symbols, indexes):
        row = cdfs[idx]
        length = int(cdf_lengths[idx])
        max_bin = length - 2
        value = int(sym) - int(offsets[idx])
        escape = value < 0 or value >= max_bin
        if escape:
            raw = 2 * (value - max_bin) if value >= max_bin else 2 * (-value) - 1
            value = max_bin
        ops.append((int(row[value]), int(row[value + 1] - row[value]), _PROB_BITS))
        if escape:
            while True:
                chunk = raw & 7
                raw >>= 3
                if raw:
                    chunk |= 8
                ops.append((chunk, 1, 4))
                if not raw:
                    break


def _py_flush(ops: List) -> bytes:
    x = _RANS_L
    words: List[int] = []
    for start, freq, bits in reversed(ops):
        x_max = ((_RANS_L >> bits) << 32) * freq
        if x >= x_max:
            words.append(x & 0xFFFFFFFF)
            x >>= 32
        x = (((x // freq) << bits) + (x % freq) + start) & _MASK64
    out = [x >> 32, x & 0xFFFFFFFF] + words[::-1]
    return np.array(out, dtype="<u4").tobytes()


class _PyDecState:
    def __init__(self, data: bytes):
        w = np.frombuffer(data, dtype="<u4")
        self.x = (int(w[0]) << 32) | int(w[1])
        self.words = w
        self.pos = 2

    def advance(self, start, freq, bits):
        self.x = freq * (self.x >> bits) + (self.x & ((1 << bits) - 1)) - start
        if self.x < _RANS_L and self.pos < len(self.words):
            self.x = (self.x << 32) | int(self.words[self.pos])
            self.pos += 1

    def get_bits(self, nbits):
        val = self.x & ((1 << nbits) - 1)
        self.advance(val, 1, nbits)
        return val


def _py_decode(state: _PyDecState, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
    out = np.empty(len(indexes), np.int32)
    for i, idx in enumerate(indexes):
        row = cdfs[idx]
        length = int(cdf_lengths[idx])
        max_bin = length - 2
        dx = state.x & ((1 << _PROB_BITS) - 1)
        bin_ = int(np.searchsorted(row[:length], dx, side="right")) - 1
        state.advance(int(row[bin_]), int(row[bin_ + 1] - row[bin_]), _PROB_BITS)
        value = bin_
        if bin_ == max_bin:
            raw, shift = 0, 0
            while True:
                chunk = state.get_bits(4)
                raw |= (chunk & 7) << shift
                shift += 3
                if not (chunk & 8):
                    break
            value = -((raw + 1) // 2) if raw & 1 else max_bin + raw // 2
        out[i] = value + int(offsets[idx])
    return out


# ---------------------------------------------------------------------------
# Public classes
# ---------------------------------------------------------------------------
class RansEncoder:
    """Buffered multi-call encoder; flush() emits one stream for all calls."""

    def __init__(self, force_python: bool = False):
        force_python = force_python or _DEFAULT_CODER == "rans-python"
        self._native = native_available() and not force_python
        if self._native:
            self._lib = _load_lib()
            self._enc = self._lib.tm_enc_new()
        else:
            self._ops: List = []

    def __del__(self):
        if getattr(self, "_native", False) and getattr(self, "_enc", None):
            self._lib.tm_enc_free(self._enc)
            self._enc = None

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets):
        symbols, indexes = _as_i32(symbols), _as_i32(indexes)
        cdfs = np.ascontiguousarray(cdfs, np.int32)
        cdf_lengths, offsets = _as_i32(cdf_lengths), _as_i32(offsets)
        if self._native:
            rc = self._lib.tm_enc_encode_with_indexes(
                self._enc, symbols, indexes, len(symbols),
                cdfs, cdfs.shape[0], cdfs.shape[1], cdf_lengths, offsets,
            )
            if rc != 0:
                raise ValueError(f"encode_with_indexes failed (rc={rc})")
        else:
            _symbol_ops(symbols, indexes, cdfs, cdf_lengths, offsets, self._ops)

    def flush(self) -> bytes:
        if self._native:
            ptr = ctypes.POINTER(ctypes.c_uint8)()
            n = self._lib.tm_enc_flush(self._enc, ctypes.byref(ptr))
            return ctypes.string_at(ptr, n)
        out = _py_flush(self._ops)
        self._ops = []
        return out


class RansDecoder:
    """Streaming decoder; state persists across decode_stream calls."""

    def __init__(self, force_python: bool = False):
        force_python = force_python or _DEFAULT_CODER == "rans-python"
        self._native = native_available() and not force_python
        if self._native:
            self._lib = _load_lib()
            self._dec = self._lib.tm_dec_new()
        self._state: Optional[_PyDecState] = None

    def __del__(self):
        if getattr(self, "_native", False) and getattr(self, "_dec", None):
            self._lib.tm_dec_free(self._dec)
            self._dec = None

    def set_stream(self, data: bytes):
        if self._native:
            rc = self._lib.tm_dec_set_stream(self._dec, data, len(data))
            if rc != 0:
                raise ValueError(f"set_stream failed (rc={rc})")
        else:
            if len(data) < 8 or len(data) % 4:
                raise ValueError("set_stream failed: truncated stream")
            self._state = _PyDecState(data)

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
        indexes = _as_i32(indexes)
        cdfs = np.ascontiguousarray(cdfs, np.int32)
        cdf_lengths, offsets = _as_i32(cdf_lengths), _as_i32(offsets)
        if self._native:
            out = np.empty(len(indexes), np.int32)
            rc = self._lib.tm_dec_decode_stream(
                self._dec, indexes, len(indexes),
                cdfs, cdfs.shape[0], cdfs.shape[1], cdf_lengths, offsets, out,
            )
            if rc != 0:
                raise ValueError(f"decode_stream failed (rc={rc})")
            return out
        return _py_decode(self._state, indexes, cdfs, cdf_lengths, offsets)
