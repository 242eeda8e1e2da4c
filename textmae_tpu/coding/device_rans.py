"""On-device (jit) rANS decoder: the decode chain without host alternation.

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
    lanes = jnp.arange(cdf.shape[1], dtype=jnp.int32)

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
        length = cdf_length[idx_t]  # (N,)
        dx = (lo & jnp.uint32(_U16)).astype(jnp.int32)
        le = (row <= dx[:, None]) & (lanes[None, :] < length[:, None])
        bin_ = le.sum(axis=1).astype(jnp.int32) - 1
        start = jnp.take_along_axis(row, bin_[:, None], axis=1)[:, 0]
        nxt = jnp.take_along_axis(row, (bin_ + 1)[:, None], axis=1)[:, 0]
        hi, lo, pos = _advance(
            hi, lo, pos, words, count,
            start.astype(jnp.uint32), (nxt - start).astype(jnp.uint32), 16,
        )
        max_bin = length - 2
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
