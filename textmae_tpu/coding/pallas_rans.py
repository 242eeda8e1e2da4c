"""Pallas TPU kernel for the rANS decode scan (same stream format).

The jit decode chain (coding/device_rans.py) runs the rans64 state machine
as a lax.scan; measured on chip the scan floor is ~4.8 us/symbol — the body
is ~40 tiny dependent HLO ops whose per-op issue overhead and HBM round
trips dominate, not compute (ablation in VERIFICATION.md). This kernel runs
the SAME algorithm as straight-line vector code inside one Mosaic program:
the decoder state lives in registers across the symbol loop, the quantized
CDF table is VMEM-resident, and there are NO narrow gathers anywhere — only
the measured-fast idioms:

  * CDF row select: an exact one-hot matmul on the MXU. The table is packed
    as two 8-bit planes (hi8 | lo8, both <= 256 so bf16-exact) plus two
    offset columns; a one-hot row has exactly ONE nonzero, so the f32
    accumulation is exact and the recombined row values (<= 2^16 + 1) are
    exact f32 integers.
  * bin search: `row <= dx` count over the full padded row — padding is
    doctored to 2^16 + 1 up front so no length mask is needed (same trick
    as device_rans.decode_symbols).
  * bin boundaries: max/min reductions over the compared row (rows are
    non-decreasing), not take_along gathers.
  * renorm word fetch / per-step index fetch / symbol store: masked
    lane-select reductions and merges on register blocks — never a
    dynamic-lane memory op.

Layouts: everything is (N, ...) sublane-oriented, so the one-hot, the row
compare block and the state math share a layout with zero transposes.
Streams (indexes, symbols) are (N, T) with T padded to 128; each 128-step
block is read into registers once and symbols accumulate in a register
staging tile flushed once per block.

Escape coding (4-bit chunk continuation) matches the host coders exactly;
the escape sub-loop is a lax.while_loop on in-register lanes (int32 mask —
Mosaic cannot carry i1 vectors through scf.while), active only on the rare
steps whose selected bin is the escape bin.

Bit-exactness contract: byte-identical to coding/rans.py / csrc/rans.cpp,
fuzz-tested against the lax.scan decoder and the host coders
(tests/test_pallas_rans.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU/interpret-only here; import lazily guarded
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_U16 = 0xFFFF
_HALF = 1 << 31
_PAD = (1 << 16) + 1  # above any 16-bit dx slot
_BLK = 128  # symbols per register staging block (one lane tile)


def pack_tables(cdf, cdf_length, offset):
    """Pack (cdf, cdf_length, offset) into the kernel's bf16 matmul table.

    Returns (tab (K, 2L + 128) bf16, L): columns [0, L) are the doctored
    row's high 8 bits, [L, 2L) the low 8 bits, and the first two columns of
    the final 128-padded block hold (offset + 2^15) split the same way.
    Every stored value is <= 256, hence exact in bf16.
    """
    cdf = np.asarray(cdf, np.int64)
    cdf_length = np.asarray(cdf_length, np.int64)
    offset = np.asarray(offset, np.int64)
    k, l = cdf.shape
    lanes = np.arange(l)
    doctored = np.where(lanes[None, :] < cdf_length[:, None], cdf, _PAD)
    off_biased = offset + (1 << 15)
    if not ((0 <= off_biased) & (off_biased < (1 << 16))).all():
        raise ValueError("offsets out of the int16 wire domain")
    pad = 128
    tab = np.zeros((k, 2 * l + pad), np.float32)
    tab[:, :l] = doctored >> 8
    tab[:, l : 2 * l] = doctored & 0xFF
    tab[:, 2 * l] = off_biased >> 8
    tab[:, 2 * l + 1] = off_biased & 0xFF
    tab[:, 2 * l + 2] = cdf_length >> 8
    tab[:, 2 * l + 3] = cdf_length & 0xFF
    return jnp.asarray(tab.astype(jnp.bfloat16)), l


def _u32_lt(a, b):
    """a < b as uint32, returned as a 0/1 uint32 (sign-flip trick: Mosaic
    compares are signed; and i1 vectors cannot lane-broadcast, so masks ride
    as integers throughout)."""
    m = jnp.uint32(0x80000000)
    return ((a ^ m).astype(jnp.int32) < (b ^ m).astype(jnp.int32)).astype(
        jnp.uint32
    )


def _mux(cond, a, b):
    """cond ? a : b with a 0/1 integer cond — multiply-add, no select_n and
    no bitwise mixing (Mosaic cannot lane-broadcast i1 vectors, and or/and on
    while-carried layouts hit the same legalization gap). Exact for u32/i32:
    multiplication by 0/1 and the add wrap mod 2^32."""
    c = cond.astype(a.dtype)
    return a * c + b * (jnp.ones_like(c) - c)


def _kernel(idx_ref, words_ref, count_ref, hi_ref, lo_ref, pos_ref, tab_ref,
            syms_ref, hi_out, lo_out, pos_out, *, n, t_steps, l, k, w_max):
    f_pad = jnp.float32(_PAD)
    u16 = jnp.uint32(_U16)

    tab = tab_ref[:]  # (K, 2L + 128) bf16
    words = words_ref[:]  # (N, Wmax) i32 (bit-pattern of u32)
    count = count_ref[:]  # (N, 1) i32
    wlane_iota = jax.lax.broadcasted_iota(jnp.int32, (n, w_max), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (n, k), 1)
    blk_iota = jax.lax.broadcasted_iota(jnp.int32, (n, _BLK), 1)

    def fetch_word(pos, c1i):
        # words[n, pos[n]] per stream, as a masked lane reduction; the
        # result is laundered to a concrete layout (* concrete ones) —
        # Mosaic's lane-replicated reduction layout cannot flow into
        # scf.while carries (unimplemented lane-broadcast relayout)
        m = wlane_iota == pos
        red = jnp.sum(jnp.where(m, words, 0), axis=1, keepdims=True)
        return (red * c1i).astype(jnp.uint32)

    def advance(hi, lo, pos, start, freq, bits):
        # x = freq * (x >> bits) + (x & mask) - start, then one-word renorm
        c1i = (pos ^ pos) + 1  # concrete ones (layout laundering)
        dx = lo & jnp.uint32((1 << bits) - 1)
        ylo = (lo >> bits) | (hi << (32 - bits))
        yhi = hi >> bits
        a = freq * (ylo & u16)
        b = freq * (ylo >> 16)
        c = freq * yhi
        lo1 = a + ((b & u16) << 16)
        hi1 = (b >> 16) + c + _u32_lt(lo1, a)
        lo2 = lo1 + dx
        hi2 = hi1 + _u32_lt(lo2, lo1)
        lo3 = lo2 - start
        hi3 = hi2 - _u32_lt(lo2, start)
        need = (
            (hi3 == 0).astype(jnp.uint32)
            & _u32_lt(lo3, jnp.uint32(_HALF))
            & (pos < count).astype(jnp.uint32)
        )
        w = fetch_word(jnp.minimum(pos, w_max - 1), c1i)
        hi4 = _mux(need, lo3, hi3)
        lo4 = _mux(need, w, lo3)
        return hi4, lo4, pos + need.astype(pos.dtype)

    # Mosaic cannot carry i1 vectors through scf.while — active is int32 0/1
    def esc_cond(c):
        return (c[-1] != 0).any()

    def esc_body(c):
        hi, lo, pos, raw, mult, active = c
        on = active.astype(jnp.uint32)
        val = lo & jnp.uint32(15)
        hi2, lo2, pos2 = advance(hi, lo, pos, val, jnp.uint32(1), 4)
        # chunk << shift as chunk * 2^shift — Mosaic has no vector-amount
        # shifts; u32 multiply wraps identically mod 2^32
        raw2 = raw | ((val & jnp.uint32(7)) * mult)
        hi = _mux(on, hi2, hi)
        lo = _mux(on, lo2, lo)
        pos = _mux(on.astype(jnp.int32), pos2, pos)
        raw = _mux(on, raw2, raw)
        mult = _mux(on, mult * jnp.uint32(8), mult)
        active = active & ((val & jnp.uint32(8)) != 0).astype(jnp.int32)
        return hi, lo, pos, raw, mult, active

    def step(j, carry):
        # one symbol per stream; j is the lane inside the current block
        hi, lo, pos, idx_blk, stage = carry  # (N,1) state, (N,BLK) blocks
        c1i = (pos ^ pos) + 1  # concrete ones: launder reduction layouts
        sel = blk_iota == j
        idx = jnp.sum(jnp.where(sel, idx_blk, 0), axis=1, keepdims=True) * c1i
        # exact one-hot row select on the MXU: (N, K) . (K, C) -> (N, C)
        oh = (k_iota == idx).astype(jnp.bfloat16)
        rows = jax.lax.dot_general(
            oh, tab, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, 2L + 128)
        row_f = rows[:, :l] * 256.0 + rows[:, l : 2 * l]  # (N, L) exact ints
        off = rows[:, 2 * l : 2 * l + 1] * 256.0 + rows[:, 2 * l + 1 : 2 * l + 2]

        dx_f = (lo & u16).astype(jnp.int32).astype(jnp.float32)  # (N, 1)
        c1f = dx_f * 0.0 + 1.0  # concrete f32 ones (layout laundering)
        le = row_f <= dx_f
        bin_ = (
            jnp.sum(le.astype(jnp.float32), axis=1, keepdims=True) * c1f
        ).astype(jnp.int32) - 1
        start_f = jnp.max(jnp.where(le, row_f, 0.0), axis=1, keepdims=True) * c1f
        nxt_f = jnp.min(jnp.where(le, f_pad, row_f), axis=1, keepdims=True) * c1f
        # Mosaic has no f32 -> u32 cast; values <= 2^16 + 1 are exact via i32
        start = start_f.astype(jnp.int32).astype(jnp.uint32)
        nxt = nxt_f.astype(jnp.int32).astype(jnp.uint32)
        off_i = off.astype(jnp.int32) - (1 << 15)

        hi, lo, pos = advance(hi, lo, pos, start, nxt - start, 16)

        # escape bin <=> its upper boundary is the row-final 2^16 entry
        is_esc = nxt == jnp.uint32(1 << 16)
        # derive the loop-init constants from live values (lo ^ lo), NOT
        # jnp.zeros_like: splat-layout while carries trip Mosaic's
        # unimplemented lane-broadcast relayout when they meet concrete
        # layouts inside the loop
        zero = lo ^ lo
        one = zero + jnp.uint32(1)
        hi, lo, pos, raw, _, _ = jax.lax.while_loop(
            esc_cond, esc_body,
            (hi, lo, pos, zero, one, is_esc.astype(jnp.int32)),
        )
        rawi = raw.astype(jnp.int32)
        esc_val = _mux(
            (rawi & 1).astype(jnp.int32), -((rawi + 1) // 2), bin_ + rawi // 2
        )
        value = _mux(is_esc.astype(jnp.int32), esc_val, bin_) + off_i  # (N, 1)
        stage = _mux(
            sel.astype(jnp.int32), jnp.broadcast_to(value, (n, _BLK)), stage
        )
        return hi, lo, pos, idx_blk, stage

    def block(b, carry):
        hi, lo, pos = carry
        idx_blk = idx_ref[:, pl.ds(b * _BLK, _BLK)]  # (N, BLK)
        stage = jnp.zeros((n, _BLK), jnp.int32)
        hi, lo, pos, _, stage = jax.lax.fori_loop(
            0, _BLK, step, (hi, lo, pos, idx_blk, stage)
        )
        syms_ref[:, pl.ds(b * _BLK, _BLK)] = stage
        return hi, lo, pos

    hi0 = hi_ref[:].astype(jnp.uint32)
    lo0 = lo_ref[:].astype(jnp.uint32)
    pos0 = pos_ref[:]
    n_full, rem = divmod(t_steps, _BLK)
    hi, lo, pos = jax.lax.fori_loop(0, n_full, block, (hi0, lo0, pos0))
    if rem:  # static partial tail block: rem real steps, full-width flush
        idx_blk = idx_ref[:, pl.ds(n_full * _BLK, _BLK)]
        stage = jnp.zeros((n, _BLK), jnp.int32)
        hi, lo, pos, _, stage = jax.lax.fori_loop(
            0, rem, step, (hi, lo, pos, idx_blk, stage)
        )
        syms_ref[:, pl.ds(n_full * _BLK, _BLK)] = stage
    hi_out[:] = hi.astype(jnp.int32)
    lo_out[:] = lo.astype(jnp.int32)
    pos_out[:] = pos


# VMEM budget: idx + syms are (N, Tpad) i32 each (N pads to the sublane
# tile); the packed table is (K, 2L + 128) bf16. Larger jobs fall back to
# the lax.scan path.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_pallas(n, t, k, l, w_max) -> bool:
    if not _HAS_PALLAS:
        return False
    n_pad = -(-n // 8) * 8
    t_pad = -(-t // _BLK) * _BLK
    w_pad = -(-w_max // _BLK) * _BLK
    tensors = 2 * t_pad * n_pad * 4 + k * (2 * l + 128) * 2 + n_pad * w_pad * 4
    return tensors <= _VMEM_BUDGET_BYTES


# The encoder's word emission is a masked read-modify-write of the whole
# (N, cap) buffer per emitted word, so its cost scales with cap — size it
# for the REAL operating rate, not the worst case. 2048 u32 words/stream is
# ~85 kbit/stream, orders of magnitude above the trained model's ~330
# bits/image; finalize_streams still raises on the hypothetical overflow
# (wcount keeps counting past cap), so callers can fall back losslessly.
ENC_CAP_DEFAULT = 2048


def fits_pallas_enc(n, t, k, l, cap) -> bool:
    if not _HAS_PALLAS:
        return False
    n_pad = -(-n // 8) * 8
    t_pad = -(-t // _BLK) * _BLK
    tensors = (
        2 * t_pad * n_pad * 4 + k * (2 * l + 128) * 2 + n_pad * cap * 4
    )
    return tensors <= _VMEM_BUDGET_BYTES


@functools.partial(jax.jit, static_argnames=("l", "t_real", "interpret"))
def _run(idx, words, count, hi, lo, pos, tab, l, t_real, interpret=False):
    n, t_pad = idx.shape
    k = tab.shape[0]
    w_max = words.shape[1]
    kern = functools.partial(
        _kernel, n=n, t_steps=int(t_real), l=int(l), k=k, w_max=w_max
    )
    syms, hi2, lo2, pos2 = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((n, t_pad), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
        interpret=interpret,
    )(idx, words, count, hi, lo, pos, tab)
    return syms, hi2, lo2, pos2


def decode_symbols_pallas(
    words, count, hi, lo, pos, indexes, cdf, cdf_length, offset,
    *, interpret=False,
):
    """Drop-in for device_rans.decode_symbols, running the Pallas kernel.

    Same (words, count, hi, lo, pos) threading contract and byte-exact
    symbol output. `interpret=True` runs the kernel in the Pallas
    interpreter (CPU tests). Tables are packed per call — cache
    `pack_tables` output and call `decode_symbols_pallas_packed` in hot
    loops.
    """
    tab, l = pack_tables(cdf, cdf_length, offset)
    return decode_symbols_pallas_packed(
        words, count, hi, lo, pos, indexes, tab, l, interpret=interpret
    )


def decode_symbols_pallas_packed(
    words, count, hi, lo, pos, indexes, tab, l, *, interpret=False
):
    n, t = indexes.shape
    t_pad = -(-t // _BLK) * _BLK
    idx = jnp.asarray(indexes, jnp.int32)
    if t_pad != t:
        # pad with row 0 — padded steps never run (static tail-block bound),
        # the flush just writes whole tiles
        idx = jnp.pad(idx, ((0, 0), (0, t_pad - t)))
    words2 = jnp.asarray(words).astype(jnp.uint32).view(jnp.int32)
    count2 = jnp.asarray(count, jnp.int32).reshape(n, 1)
    hi2 = jnp.asarray(hi).astype(jnp.uint32).view(jnp.int32).reshape(n, 1)
    lo2 = jnp.asarray(lo).astype(jnp.uint32).view(jnp.int32).reshape(n, 1)
    pos2 = jnp.asarray(pos, jnp.int32).reshape(n, 1)
    syms, hi3, lo3, pos3 = _run(
        idx, words2, count2, hi2, lo2, pos2, tab, int(l), int(t),
        interpret=interpret,
    )
    return (
        syms[:, :t],
        hi3.view(jnp.uint32).reshape(n),
        lo3.view(jnp.uint32).reshape(n),
        pos3.reshape(n),
    )


# ---------------------------------------------------------------------------
# Encoder kernel: the same rans64 stream format, produced in one Mosaic
# program (mirrors device_rans.encode_symbols' reverse-op scan)
# ---------------------------------------------------------------------------
def _enc_kernel(sym_ref, idx_ref, tab_ref, words_ref, wpos_out, hi_out,
                lo_out, *, n, t_steps, l, k, cap):
    u16 = jnp.uint32(_U16)
    tab = tab_ref[:]  # (K, 2L + 128) bf16
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (n, k), 1)
    blk_iota = jax.lax.broadcasted_iota(jnp.int32, (n, _BLK), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (n, l), 1)
    cap_iota = jax.lax.broadcasted_iota(jnp.int32, (n, cap), 1)

    def _divmod(hi, lo, f):
        # base-2^16 long division (device_rans._divmod_u64_u32; Mosaic
        # supports vector u32 div/mod)
        q3 = (hi >> 16) // f
        r = (hi >> 16) % f
        t = (r << 16) | (hi & u16)
        q2 = t // f
        t = ((t % f) << 16) | (lo >> 16)
        q1 = t // f
        t = ((t % f) << 16) | (lo & u16)
        q0 = t // f
        return (q3 << 16) | q2, (q1 << 16) | q0, t % f

    def emit(hi, lo, wpos, start, freq, bits, active):
        # renorm first (one word push suffices), then
        # x = ((x // freq) << bits) + x % freq + start
        on = active.astype(jnp.uint32)
        thresh = freq << (31 - bits)
        # hi >= thresh, UNSIGNED (thresh reaches 2^31; Mosaic compares sign)
        need = on * (jnp.uint32(1) - _u32_lt(hi, thresh))
        # masked merge of lo into the word buffer at per-stream wpos; the
        # whole-buffer read-modify-write only runs on steps where some lane
        # actually renormalizes (rare at real operating rates)
        @pl.when((need != 0).any())
        def _():
            m = (cap_iota == wpos).astype(jnp.int32) * need.astype(jnp.int32)
            lo_b = jnp.broadcast_to(lo.astype(jnp.int32), (n, cap))
            words_ref[:, :] = lo_b * m + words_ref[:, :] * (1 - m)

        wpos = wpos + need.astype(jnp.int32)
        lo1 = _mux(need, hi, lo)
        hi1 = _mux(need, hi ^ hi, hi)
        qhi, qlo, rem = _divmod(hi1, lo1, freq)
        shi = (qhi << bits) | (qlo >> (32 - bits))
        slo = qlo << bits
        add = rem + start
        lo2 = slo + add
        hi2 = shi + _u32_lt(lo2, slo)
        hi = _mux(on, hi2, hi)
        lo = _mux(on, lo2, lo)
        return hi, lo, wpos

    def step_factory():
        def step_at(hi, lo, wpos, sym_blk, idx_blk, jlane):
            sel = blk_iota == jlane
            c1i = (wpos ^ wpos) + 1
            sym = jnp.sum(jnp.where(sel, sym_blk, 0), axis=1, keepdims=True) * c1i
            idx = jnp.sum(jnp.where(sel, idx_blk, 0), axis=1, keepdims=True) * c1i
            oh = (k_iota == idx).astype(jnp.bfloat16)
            rows = jax.lax.dot_general(
                oh, tab, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            row_f = rows[:, :l] * 256.0 + rows[:, l : 2 * l]
            off = (
                rows[:, 2 * l : 2 * l + 1] * 256.0
                + rows[:, 2 * l + 1 : 2 * l + 2]
            ).astype(jnp.int32) - (1 << 15)
            length = (
                rows[:, 2 * l + 2 : 2 * l + 3] * 256.0
                + rows[:, 2 * l + 3 : 2 * l + 4]
            ).astype(jnp.int32)
            max_bin = length - 2
            value = sym - off
            is_esc = ((value < 0) | (value >= max_bin)).astype(jnp.int32)
            vu = value.astype(jnp.uint32)
            mb_u = max_bin.astype(jnp.uint32)
            raw_hi = (vu - mb_u) << 1
            raw_lo = ((jnp.uint32(0) - vu) << 1) - 1
            raw = _mux((value >= max_bin).astype(jnp.int32), raw_hi, raw_lo)
            raw = raw * is_esc.astype(jnp.uint32)
            # klast: index of last 3-bit chunk = #{k in 1..10 : raw >> 3k != 0}
            klast = sum(
                ((raw // jnp.uint32(1 << (3 * kk))) != 0).astype(jnp.int32)
                for kk in range(1, 11)
            )
            # escape chunks are emitted REVERSED (chunk klast .. 0), each a
            # 4-bit op with freq 1; chunk j = (raw >> 3j) & 7 (+8 if j<klast),
            # realized as division by a carried 8^j divisor
            div0 = jnp.uint32(1)
            for kk in range(10):  # 8^klast, computed without vector shifts
                div0 = div0 * _mux((klast > kk).astype(jnp.uint32),
                                   jnp.uint32(8), jnp.uint32(1))

            def echain_cond(c):
                return (c[-1] != 0).any()

            def echain_body(c):
                hi, lo, wpos, j, div, active = c
                chunk = ((raw // div) & jnp.uint32(7)) | _mux(
                    (j < klast).astype(jnp.uint32), jnp.uint32(8), jnp.uint32(0)
                )
                hi, lo, wpos = emit(hi, lo, wpos, chunk, jnp.uint32(1), 4,
                                    active)
                j = j - 1
                div = _mux(active.astype(jnp.uint32), div // jnp.uint32(8), div)
                active = active & (j >= 0).astype(jnp.int32)
                return hi, lo, wpos, j, div, active

            j0 = klast * is_esc - (1 - is_esc)  # klast when esc else -1
            hi, lo, wpos, *_ = jax.lax.while_loop(
                echain_cond, echain_body,
                (hi, lo, wpos, j0, div0, is_esc * (j0 >= 0).astype(jnp.int32)),
            )
            bin_ = _mux(is_esc, max_bin, value)
            c1f = (wpos ^ wpos).astype(jnp.float32) + 1.0
            s_m = (lane_iota == bin_).astype(jnp.float32)
            n_m = (lane_iota == bin_ + 1).astype(jnp.float32)
            start = (
                (jnp.sum(row_f * s_m, axis=1, keepdims=True) * c1f)
                .astype(jnp.int32).astype(jnp.uint32)
            )
            nxt = (
                (jnp.sum(row_f * n_m, axis=1, keepdims=True) * c1f)
                .astype(jnp.int32).astype(jnp.uint32)
            )
            ones_i = (wpos ^ wpos) + 1
            hi, lo, wpos = emit(hi, lo, wpos, start, nxt - start, 16, ones_i)
            return hi, lo, wpos
        return step_at

    step_at = step_factory()

    def block(bb, carry):
        # FULL blocks processed last-to-first (the partial tail block, if
        # any, was already handled); lanes within a block high-to-low
        hi, lo, wpos = carry
        b = t_steps // _BLK - 1 - bb
        sym_blk = sym_ref[:, pl.ds(b * _BLK, _BLK)]
        idx_blk = idx_ref[:, pl.ds(b * _BLK, _BLK)]

        def inner(jj, c):
            hi, lo, wpos = c
            jlane = _BLK - 1 - jj
            return step_at(hi, lo, wpos, sym_blk, idx_blk, jlane)

        hi, lo, wpos = jax.lax.fori_loop(0, _BLK, inner, (hi, lo, wpos))
        return hi, lo, wpos

    zero = jnp.zeros((n, 1), jnp.uint32)
    hi = zero
    lo = zero + jnp.uint32(_HALF)  # x = _RANS_L
    wpos = jnp.zeros((n, 1), jnp.int32)

    n_blocks, rem = divmod(t_steps, _BLK)
    if rem:  # partial LAST block first (reverse order): lanes rem-1 .. 0
        sym_blk = sym_ref[:, pl.ds(n_blocks * _BLK, _BLK)]
        idx_blk = idx_ref[:, pl.ds(n_blocks * _BLK, _BLK)]

        def inner0(jj, c):
            hi, lo, wpos = c
            jlane = rem - 1 - jj
            return step_at(hi, lo, wpos, sym_blk, idx_blk, jlane)

        hi, lo, wpos = jax.lax.fori_loop(0, rem, inner0, (hi, lo, wpos))
    hi, lo, wpos = jax.lax.fori_loop(0, n_blocks, block, (hi, lo, wpos))
    wpos_out[:] = wpos
    hi_out[:] = hi.astype(jnp.int32)
    lo_out[:] = lo.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("l", "t_real", "cap", "interpret"))
def _run_enc(sym, idx, tab, l, t_real, cap, interpret=False):
    n, t_pad = idx.shape
    k = tab.shape[0]
    kern = functools.partial(
        _enc_kernel, n=n, t_steps=int(t_real), l=int(l), k=k, cap=int(cap)
    )
    words, wpos, hi, lo = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((n, cap), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
        interpret=interpret,
    )(sym, idx, tab)
    return words, wpos, hi, lo


def encode_symbols_pallas(
    symbols, indexes, cdf, cdf_length, offset, max_words=None, *,
    interpret=False,
):
    """Drop-in for device_rans.encode_symbols via the Pallas kernel.

    Returns (words (N, cap) uint32, wcount (N,), hi (N,), lo (N,)) for
    device_rans.finalize_streams — byte-identical streams by the fuzz
    contract. Words land at the FRONT of the buffer in emission order, the
    same layout encode_symbols produces.
    """
    tab, l = pack_tables(cdf, cdf_length, offset)
    return encode_symbols_pallas_packed(
        symbols, indexes, tab, l, max_words=max_words, interpret=interpret
    )


def encode_symbols_pallas_packed(
    symbols, indexes, tab, l, max_words=None, *, interpret=False
):
    n, t = indexes.shape
    t_pad = -(-t // _BLK) * _BLK
    cap = int(max_words) if max_words is not None else 12 * t + 2
    sym = jnp.asarray(symbols, jnp.int32)
    idx = jnp.asarray(indexes, jnp.int32)
    if t_pad != t:
        sym = jnp.pad(sym, ((0, 0), (0, t_pad - t)))
        idx = jnp.pad(idx, ((0, 0), (0, t_pad - t)))
    words, wpos, hi, lo = _run_enc(
        sym, idx, tab, int(l), int(t), cap, interpret=interpret
    )
    return (
        words.view(jnp.uint32),
        wpos.reshape(n),
        hi.view(jnp.uint32).reshape(n),
        lo.view(jnp.uint32).reshape(n),
    )
