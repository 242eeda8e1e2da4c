"""Pallas rANS decode kernel (coding/pallas_rans.py): byte-exact agreement
with the lax.scan decoder and the host coders, in interpret mode (CPU).

The on-chip compile path is exercised by examples/decode_bench.py and the
codec's device chain on TPU; these tests pin the algorithm (bin search,
boundary reductions, escape chunks, state threading, tail-block padding)
against the same fuzz contract as tests/test_coding.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textmae_tpu.coding.device_rans import decode_symbols, init_states
from textmae_tpu.coding.pallas_rans import (
    decode_symbols_pallas,
    fits_pallas,
    pack_tables,
)
from textmae_tpu.coding.rans import RansEncoder


def make_tables(rng, K=8, max_bins=12):
    rows, lens, offs = [], [], []
    for _ in range(K):
        nb = int(rng.integers(2, max_bins))
        pmf = rng.integers(1, 100, nb).astype(np.float64)
        pmf = pmf / pmf.sum() * (65536 - nb - 1)
        q = np.floor(pmf).astype(np.int64) + 1
        q = np.append(q, 65536 - q.sum())
        assert q.sum() == 65536 and (q > 0).all()
        rows.append(np.concatenate([[0], np.cumsum(q)]))
        lens.append(len(rows[-1]))
        offs.append(int(rng.integers(-20, 20)))
    L = max(lens)
    cdf = np.zeros((K, L), np.int32)
    for k, r in enumerate(rows):
        cdf[k, : len(r)] = r
    return cdf, np.array(lens, np.int32), np.array(offs, np.int32)


def roundtrip(rng, cdf, lens, offs, N, T, esc_lo=-4, esc_hi=30):
    K = cdf.shape[0]
    idxs = rng.integers(0, K, (N, T)).astype(np.int32)
    syms = np.empty((N, T), np.int32)
    streams = []
    for i in range(N):
        syms[i] = offs[idxs[i]] + rng.integers(esc_lo, esc_hi, T)
        e = RansEncoder()
        e.encode_with_indexes(syms[i], idxs[i], cdf, lens, offs)
        streams.append(e.flush())
    return idxs, syms, streams


@pytest.mark.parametrize("N,T", [(5, 73), (3, 257), (8, 128), (4, 129)])
def test_pallas_decode_matches_scan_and_truth(N, T):
    rng = np.random.default_rng(N * 1000 + T)
    cdf, lens, offs = make_tables(rng)
    idxs, syms, streams = roundtrip(rng, cdf, lens, offs, N, T)
    init = [jnp.asarray(a) for a in init_states(streams)]
    ref, rhi, rlo, rpos = decode_symbols(*init, jnp.asarray(idxs), cdf, lens, offs)
    out, hi, lo, pos = decode_symbols_pallas(
        *init, jnp.asarray(idxs), cdf, lens, offs, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), syms)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # decoder state threads identically (callers chain slice decodes)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(rhi))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(rlo))
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(rpos))


def test_pallas_decode_state_threading_across_calls():
    """Two chained pallas calls == one scan call over the concatenation."""
    rng = np.random.default_rng(7)
    cdf, lens, offs = make_tables(rng)
    idxs, syms, streams = roundtrip(rng, cdf, lens, offs, 4, 200)
    init = [jnp.asarray(a) for a in init_states(streams)]
    from textmae_tpu.coding.pallas_rans import decode_symbols_pallas_packed

    tab, l = pack_tables(cdf, lens, offs)
    words, count, hi, lo, pos = init
    out1, hi, lo, pos = decode_symbols_pallas_packed(
        words, count, hi, lo, pos, jnp.asarray(idxs[:, :77]), tab, l,
        interpret=True,
    )
    out2, hi, lo, pos = decode_symbols_pallas_packed(
        words, count, hi, lo, pos, jnp.asarray(idxs[:, 77:]), tab, l,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(out1), np.asarray(out2)], axis=1), syms
    )


def test_pallas_decode_heavy_escapes():
    """Deep escape chains (multi-chunk, both signs) stay byte-exact."""
    rng = np.random.default_rng(11)
    cdf, lens, offs = make_tables(rng, K=4, max_bins=4)
    idxs, syms, streams = roundtrip(
        rng, cdf, lens, offs, 3, 150, esc_lo=-100000, esc_hi=100000
    )
    init = [jnp.asarray(a) for a in init_states(streams)]
    out, *_ = decode_symbols_pallas(
        *init, jnp.asarray(idxs), cdf, lens, offs, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), syms)


def test_pack_tables_exactness():
    rng = np.random.default_rng(3)
    cdf, lens, offs = make_tables(rng, K=16, max_bins=40)
    tab, l = pack_tables(cdf, lens, offs)
    assert l == cdf.shape[1]
    t = np.asarray(tab, np.float32)
    rec = (t[:, :l] * 256 + t[:, l : 2 * l]).astype(np.int64)
    lanes = np.arange(l)
    doctored = np.where(lanes[None, :] < lens[:, None], cdf, (1 << 16) + 1)
    np.testing.assert_array_equal(rec, doctored)
    rec_off = (t[:, 2 * l] * 256 + t[:, 2 * l + 1]).astype(np.int64) - (1 << 15)
    np.testing.assert_array_equal(rec_off, offs)


def test_fits_pallas_budget():
    # production shapes fit; absurd ones do not
    assert fits_pallas(24, 27648, 64, 3133, 64)
    assert not fits_pallas(24, 10_000_000, 64, 3133, 64)


# ---------------------------------------------------------------------------
# Encoder kernel
# ---------------------------------------------------------------------------
from textmae_tpu.coding.device_rans import finalize_streams
from textmae_tpu.coding.pallas_rans import encode_symbols_pallas


@pytest.mark.parametrize(
    "N,T,esc",
    [(5, 73, (-4, 30)), (3, 257, (-100000, 100000)), (4, 128, (0, 3)),
     (2, 129, (-50, 50))],
)
def test_pallas_encode_byte_identical(N, T, esc):
    rng = np.random.default_rng(N * 7919 + T)
    cdf, lens, offs = make_tables(rng)
    idxs, syms, streams = roundtrip(
        rng, cdf, lens, offs, N, T, esc_lo=esc[0], esc_hi=esc[1]
    )
    ws, wc, hi, lo = encode_symbols_pallas(
        syms, idxs, cdf, lens, offs, max_words=12 * T + 2, interpret=True
    )
    outs = finalize_streams(np.asarray(ws), np.asarray(wc), np.asarray(hi),
                            np.asarray(lo))
    assert all(a == b for a, b in zip(outs, streams))


def test_pallas_encode_overflow_counts_past_cap():
    """A too-small word buffer must surface as wcount > cap (raised by
    finalize_streams), never a silently truncated stream."""
    rng = np.random.default_rng(5)
    cdf, lens, offs = make_tables(rng)
    idxs, syms, _ = roundtrip(rng, cdf, lens, offs, 2, 256)
    ws, wc, hi, lo = encode_symbols_pallas(
        syms, idxs, cdf, lens, offs, max_words=2, interpret=True
    )
    with pytest.raises(ValueError, match="overflow"):
        finalize_streams(np.asarray(ws), np.asarray(wc), np.asarray(hi),
                         np.asarray(lo))


def test_pallas_encode_decode_roundtrip():
    """pallas encode -> pallas decode, no host coder involved."""
    rng = np.random.default_rng(13)
    cdf, lens, offs = make_tables(rng)
    N, T = 4, 200
    idxs, syms, _ = roundtrip(rng, cdf, lens, offs, N, T)
    ws, wc, hi, lo = encode_symbols_pallas(
        syms, idxs, cdf, lens, offs, max_words=12 * T + 2, interpret=True
    )
    streams = finalize_streams(np.asarray(ws), np.asarray(wc),
                               np.asarray(hi), np.asarray(lo))
    init = [jnp.asarray(a) for a in init_states(streams)]
    out, *_ = decode_symbols_pallas(
        *init, jnp.asarray(idxs), cdf, lens, offs, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), syms)
