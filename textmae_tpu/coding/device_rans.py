"""On-device (jit) rANS coder: encode and decode without host alternation.

The MCM decode chain is the format's real data dependency: slice i's mu/sigma
(and therefore its CDF indexes) depend on decoded slices < i, so the reference
alternates device math and host `decode_stream` per slice
(/root/reference/models/Compression/MCM.py:917-944), and our host path keeps
that alternation (6 blocking device<->host round trips — ~43 ms each over a
remote-attached chip, VERDICT r2 Next #6). This module removes the host from
the loop entirely: the stream words are uploaded once and the rANS state
machine itself runs inside jit, so the whole chain — per-slice params, symbol
decode, buffer update — is one async dispatch chain with a single blocking
fetch at the end.

Bit-exactness: this is the SAME stream format as coding/rans.py / csrc/rans.cpp
(rans64: 64-bit state, 32-bit little-endian renorm words, 16-bit probability
precision, 4-bit escape chunks). TPUs have no native 64-bit integers, so the
state is carried as a (hi, lo) uint32 pair with explicit carries/borrows —
exact integer arithmetic, no floats anywhere. Fuzz-tested for byte-for-byte
agreement with the C++/Python coders (tests/test_coding.py).

The per-symbol CDF-row selectors ("indexes") may be device-computed (they are,
in the MCM chain), which is the whole point: nothing about the symbols ever
touches the host.

Domain note: escape payloads are carried in uint32 on device (TPUs have no
native 64-bit ints), so out-of-bin magnitudes must satisfy raw < 2^31 —
i.e. |symbol - offset| and symbol - offset - max_bin below ~2^30. The host
coders accept arbitrary int32 symbols (Python/C++ widen internally); MCM
symbols are int16-range quantized latents, far inside the shared domain.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_U16 = 0xFFFF
_HALF = 1 << 31  # _RANS_L: renormalize while x < 2^31 (state stays < 2^63)


def init_states(
    streams: Sequence[bytes],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-stream decoder init (host side, cheap).

    Returns (words (N, W) uint32, count (N,), hi (N,), lo (N,), pos (N,)):
    the padded word matrix plus the initial state x = words[0]<<32 | words[1]
    as a (hi, lo) pair, read position 2. Upload once; everything after is jit.
    """
    ws = [np.frombuffer(s, dtype="<u4") for s in streams]
    for w in ws:
        if len(w) < 2:
            raise ValueError("truncated rANS stream")
    width = max(len(w) for w in ws)
    words = np.zeros((len(ws), width), np.uint32)
    for i, w in enumerate(ws):
        words[i, : len(w)] = w
    count = np.array([len(w) for w in ws], np.int32)
    return words, count, words[:, 0].copy(), words[:, 1].copy(), np.full(len(ws), 2, np.int32)


def _advance(hi, lo, pos, words, count, start, freq, bits: int):
    """x = freq * (x >> bits) + (x & mask) - start, then renorm (exact u64
    semantics on (hi, lo) uint32 pairs; mirrors _PyDecState.advance)."""
    u16 = jnp.uint32(_U16)
    dx = lo & jnp.uint32((1 << bits) - 1)
    # y = x >> bits  (bits is 16 or 4, so 32 - bits is a valid shift)
    ylo = (lo >> bits) | (hi << (32 - bits))
    yhi = hi >> bits
    # p = freq * y: freq <= 2^16 and y < 2^48, so p < 2^64; per-limb products
    # all fit uint32 exactly (yhi < 2^16 since x < 2^63 on any valid stream)
    a = freq * (ylo & u16)
    b = freq * (ylo >> 16)
    c = freq * yhi
    lo1 = a + ((b & u16) << 16)
    hi1 = (b >> 16) + c + (lo1 < a).astype(jnp.uint32)
    # + dx
    lo2 = lo1 + dx
    hi2 = hi1 + (lo2 < lo1).astype(jnp.uint32)
    # - start
    lo3 = lo2 - start
    hi3 = hi2 - (lo2 < start).astype(jnp.uint32)
    # renorm: while x < 2^31 (single step suffices: one 32-bit word brings
    # x to >= 2^31 unless the stream is exhausted — same as the host coders)
    need = (hi3 == 0) & (lo3 < jnp.uint32(_HALF)) & (pos < count)
    w = jnp.take_along_axis(
        words, jnp.minimum(pos, words.shape[1] - 1)[:, None], axis=1
    )[:, 0]
    hi4 = jnp.where(need, lo3, hi3)  # x' = x << 32 | w  (x < 2^31 -> hi = lo)
    lo4 = jnp.where(need, w, lo3)
    return hi4, lo4, pos + need.astype(pos.dtype)


def decode_symbols(words, count, hi, lo, pos, indexes, cdf, cdf_length, offset):
    """Decode one symbol per (stream, step) pair, fully inside jit.

    words/count/hi/lo/pos: from init_states (or a previous call — state
    threads across calls exactly like RansDecoder.decode_stream).
    indexes: (N, T) int32 CDF-row selector per symbol, in stream order.
    cdf: (K, L) int32 zero-padded quantized CDFs; cdf_length/offset: (K,).

    Returns (symbols (N, T) int32, hi, lo, pos).
    """
    cdf = jnp.asarray(cdf, jnp.int32)
    cdf_length = jnp.asarray(cdf_length, jnp.int32)
    offset = jnp.asarray(offset, jnp.int32)

    # Doctor the zero padding ONCE: rows are zero-padded past their valid
    # prefix, and 0 <= dx is always true, so the original search needed a
    # per-step `lane < length` mask. Rewriting pad entries to 2^16 + 1
    # (above any 16-bit dx) makes the plain `row <= dx` count exact with no
    # mask. The quantized CDFs are non-decreasing over the valid prefix and
    # end at exactly 2^16, so boundary selection below is unaffected.
    # (A two-level bucketed search and per-element window gathers were both
    # measured SLOWER on TPU than this wide-row linear scan — narrow/strided
    # gathers are the expensive op, full-row gather + VPU scan is the fast
    # idiom; see VERIFICATION.md decode-bench rows.)
    lanes = jnp.arange(cdf.shape[1], dtype=jnp.int32)
    _PAD = jnp.int32((1 << 16) + 1)
    cdf = jnp.where(lanes[None, :] < cdf_length[:, None], cdf, _PAD)

    def esc_cond(c):
        return c[-1].any()

    def esc_body(c):
        hi, lo, pos, raw, shift, active = c
        val = lo & jnp.uint32(15)
        hi2, lo2, pos2 = _advance(
            hi, lo, pos, words, count, val, jnp.uint32(1), 4
        )
        raw2 = raw | ((val & jnp.uint32(7)) << shift)
        hi = jnp.where(active, hi2, hi)
        lo = jnp.where(active, lo2, lo)
        pos = jnp.where(active, pos2, pos)
        raw = jnp.where(active, raw2, raw)
        shift = jnp.where(active, shift + 3, shift)
        active = active & ((val & jnp.uint32(8)) != 0)
        return hi, lo, pos, raw, shift, active

    def step(carry, idx_t):
        hi, lo, pos = carry
        row = cdf[idx_t]  # (N, L)
        dx = (lo & jnp.uint32(_U16)).astype(jnp.int32)
        le = row <= dx[:, None]
        bin_ = le.sum(axis=1).astype(jnp.int32) - 1
        # boundaries without take_along gathers: the row is non-decreasing,
        # so the largest entry <= dx IS cdf[bin] and the smallest entry > dx
        # IS cdf[bin+1] — two VPU reductions instead of two gathers
        start = jnp.max(jnp.where(le, row, 0), axis=1)
        nxt = jnp.min(jnp.where(le, _PAD, row), axis=1)
        hi, lo, pos = _advance(
            hi, lo, pos, words, count,
            start.astype(jnp.uint32), (nxt - start).astype(jnp.uint32), 16,
        )
        max_bin = cdf_length[idx_t] - 2
        is_esc = bin_ == max_bin
        zero = jnp.zeros_like(lo)
        hi, lo, pos, raw, _, _ = jax.lax.while_loop(
            esc_cond, esc_body, (hi, lo, pos, zero, zero, is_esc)
        )
        rawi = raw.astype(jnp.int32)
        esc_val = jnp.where(rawi & 1, -((rawi + 1) // 2), max_bin + rawi // 2)
        value = jnp.where(is_esc, esc_val, bin_)
        return (hi, lo, pos), value + offset[idx_t]

    (hi, lo, pos), syms = jax.lax.scan(
        step, (hi, lo, pos), jnp.asarray(indexes, jnp.int32).T
    )
    return syms.T, hi, lo, pos


# ---------------------------------------------------------------------------
# Encoder: the same rans64 stream format, produced inside jit
# ---------------------------------------------------------------------------
def _divmod_u64_u32(hi, lo, f):
    """(q_hi, q_lo, rem) = divmod(hi<<32 | lo, f) for f in [1, 2^16].

    Base-2^16 long division: every partial dividend is (rem<<16 | digit) with
    rem < f <= 2^16, so each of the four u32 divisions is exact. hi < 2^31 on
    any valid encoder state (x < 2^63), so hi>>16 < 2^15.
    """
    u16 = jnp.uint32(_U16)
    q3 = (hi >> 16) // f
    r = (hi >> 16) % f
    t = (r << 16) | (hi & u16)
    q2 = t // f
    t = ((t % f) << 16) | (lo >> 16)
    q1 = t // f
    t = ((t % f) << 16) | (lo & u16)
    q0 = t // f
    return (q3 << 16) | q2, (q1 << 16) | q0, t % f


def encode_symbols(symbols, indexes, cdf, cdf_length, offset, max_words=None):
    """Encode one (N, T) symbol matrix per stream, fully inside jit.

    symbols/indexes: (N, T) int32 in STREAM order — the exact order a decoder
    will consume them (encode_with_indexes call order). The rANS op list is
    processed in reverse internally, as the host coders' flush() does.
    cdf/cdf_length/offset: the same quantized tables the host coders take.
    max_words: capacity of the emitted-word buffer per stream; the worst case
    is 12*T + 2 (every symbol an 11-chunk escape, one word per op). Pass a
    tighter bound to save memory — finalize_streams raises on overflow rather
    than emitting a corrupt stream.

    Returns (words (N, cap) uint32, wcount (N,) int32, hi (N,), lo (N,)):
    feed to finalize_streams for the final byte strings. Byte-for-byte
    identical to RansEncoder.encode_with_indexes(...).flush() by the fuzz
    contract (tests/test_coding.py).
    """
    symbols = jnp.asarray(symbols, jnp.int32)
    indexes = jnp.asarray(indexes, jnp.int32)
    n, t = symbols.shape
    cap = int(max_words) if max_words is not None else 12 * t + 2
    cdf = jnp.asarray(cdf, jnp.int32)
    cdf_length = jnp.asarray(cdf_length, jnp.int32)
    offset = jnp.asarray(offset, jnp.int32)

    rows_i = jnp.arange(n)

    def emit(hi, lo, words, wpos, start, freq, bits: int, active):
        # renorm first (single push suffices: x_max >= 2^47 > 2^32)
        need = active & (hi >= (freq << (31 - bits)))
        cols = jnp.where(need, wpos, jnp.int32(cap))
        words = words.at[rows_i, cols].set(lo, mode="drop")
        wpos = wpos + need.astype(wpos.dtype)
        lo1 = jnp.where(need, hi, lo)
        hi1 = jnp.where(need, jnp.uint32(0), hi)
        # x = ((x // freq) << bits) + x % freq + start
        qhi, qlo, rem = _divmod_u64_u32(hi1, lo1, freq)
        shi = (qhi << bits) | (qlo >> (32 - bits))
        slo = qlo << bits
        add = rem + start
        lo2 = slo + add
        hi2 = shi + (lo2 < slo).astype(jnp.uint32)
        hi = jnp.where(active, hi2, hi)
        lo = jnp.where(active, lo2, lo)
        return hi, lo, words, wpos

    def esc_cond(c):
        return c[-1].any()

    def esc_body(c):
        hi, lo, words, wpos, raw, j, klast, active = c
        # clamp the shift for inactive lanes (j == -1 would be a >= 32-bit
        # shift, which XLA leaves undefined); their chunk value is never used
        sh = (3 * jnp.maximum(j, 0)).astype(jnp.uint32)
        chunk = (jax.lax.shift_right_logical(raw, sh) & 7) | jnp.where(
            j < klast, jnp.uint32(8), jnp.uint32(0)
        )
        hi, lo, words, wpos = emit(
            hi, lo, words, wpos, chunk, jnp.uint32(1), 4, active
        )
        j = j - 1
        active = active & (j >= 0)
        return hi, lo, words, wpos, raw, j, klast, active

    def step(carry, st):
        hi, lo, words, wpos = carry
        sym_t, idx_t = st
        max_bin = cdf_length[idx_t] - 2
        value = sym_t - offset[idx_t]
        is_esc = (value < 0) | (value >= max_bin)
        # escape payload: 2*(value - max_bin) when clipped high, 2*(-value)-1
        # when negative (exact in uint32 even at INT32_MIN)
        vu = value.astype(jnp.uint32)
        raw = jnp.where(
            value >= max_bin,
            (vu - max_bin.astype(jnp.uint32)) << 1,
            ((jnp.uint32(0) - vu) << 1) - 1,
        )
        raw = jnp.where(is_esc, raw, jnp.uint32(0))
        # number of 3-bit chunks = max over k of (raw >> 3k != 0) + 1
        klast = sum(
            (jax.lax.shift_right_logical(raw, jnp.uint32(3 * k)) != 0).astype(jnp.int32)
            for k in range(1, 11)
        )  # index of the LAST chunk (K - 1)
        # reversed op order within a symbol: chunks K-1 .. 0, then the main op
        j = jnp.where(is_esc, klast, jnp.int32(-1))
        hi, lo, words, wpos, *_ = jax.lax.while_loop(
            esc_cond,
            esc_body,
            (hi, lo, words, wpos, raw, j, klast, is_esc & (j >= 0)),
        )
        bin_ = jnp.where(is_esc, max_bin, value)
        # the encoder knows the bin outright — gather just the two boundary
        # entries instead of materializing the whole (N, L) row per step
        # (the row gather dominated the encode scan on production tables)
        start = cdf[idx_t, bin_]
        nxt = cdf[idx_t, bin_ + 1]
        hi, lo, words, wpos = emit(
            hi, lo, words, wpos,
            start.astype(jnp.uint32), (nxt - start).astype(jnp.uint32), 16,
            jnp.ones_like(is_esc),
        )
        return (hi, lo, words, wpos), None

    words0 = jnp.zeros((n, cap), jnp.uint32)
    wpos0 = jnp.zeros((n,), jnp.int32)
    hi0 = jnp.zeros((n,), jnp.uint32)
    lo0 = jnp.full((n,), jnp.uint32(_HALF))  # x = _RANS_L
    (hi, lo, words, wpos), _ = jax.lax.scan(
        step, (hi0, lo0, words0, wpos0), (symbols.T, indexes.T), reverse=True
    )
    return words, wpos, hi, lo


def finalize_streams(words, wcount, hi, lo):
    """Assemble encode_symbols output into byte strings (host side, cheap).

    Stream layout (identical to _py_flush): [x_hi, x_lo] then the emitted
    words in reverse emission order, little-endian u32 each.
    """
    words = np.asarray(words)
    wcount = np.asarray(wcount)
    hi = np.asarray(hi)
    lo = np.asarray(lo)
    cap = words.shape[1]
    out = []
    for i in range(words.shape[0]):
        c = int(wcount[i])
        if c > cap:
            raise ValueError(
                f"encode word buffer overflow (stream {i}: {c} words > "
                f"capacity {cap}); re-run encode_symbols with a larger max_words"
            )
        w = np.empty(c + 2, np.uint32)
        w[0] = hi[i]
        w[1] = lo[i]
        w[2:] = words[i, :c][::-1]
        out.append(w.astype("<u4").tobytes())
    return out
