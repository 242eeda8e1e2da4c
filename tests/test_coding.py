"""Coding runtime tests: rANS round-trips (C++ and Python, cross-format),
pmf_to_quantized_cdf C++/numpy equivalence, Huffman round-trip."""
import numpy as np
import pytest

from textmae_tpu.coding import (
    HuffmanCoder,
    RansDecoder,
    RansEncoder,
    native_available,
    pmf_to_quantized_cdf_native,
)
from textmae_tpu.entropy.tables import pmf_to_quantized_cdf
from textmae_tpu.entropy.gaussian import build_gaussian_tables, get_scale_table

NATIVE = native_available()


def _random_tables(rng, ncdfs=8, max_syms=24):
    cdfs, lengths, offsets = [], [], []
    for _ in range(ncdfs):
        n = int(rng.integers(2, max_syms))
        pmf = rng.random(n) + 1e-4
        cdf = pmf_to_quantized_cdf(np.append(pmf, 1e-4))
        cdfs.append(cdf)
        lengths.append(len(cdf))
        offsets.append(int(rng.integers(-10, 10)))
    stride = max(lengths)
    table = np.zeros((ncdfs, stride), np.int32)
    for i, c in enumerate(cdfs):
        table[i, : len(c)] = c
    return table, np.array(lengths, np.int32), np.array(offsets, np.int32)


def _random_payload(rng, table, lengths, offsets, n=5000, escape_frac=0.05):
    ncdfs = len(lengths)
    indexes = rng.integers(0, ncdfs, n).astype(np.int32)
    max_bins = lengths[indexes] - 2
    symbols = (rng.random(n) * max_bins).astype(np.int32) + offsets[indexes]
    # sprinkle out-of-range symbols to exercise escape/bypass coding
    esc = rng.random(n) < escape_frac
    symbols[esc] = (rng.integers(-2000, 2000, esc.sum())).astype(np.int32)
    return symbols, indexes


@pytest.mark.parametrize("force_python", [False, True])
def test_rans_roundtrip(rng, force_python):
    if force_python is False and not NATIVE:
        pytest.skip("native codec unavailable")
    table, lengths, offsets = _random_tables(rng)
    symbols, indexes = _random_payload(rng, table, lengths, offsets)
    enc = RansEncoder(force_python=force_python)
    enc.encode_with_indexes(symbols, indexes, table, lengths, offsets)
    stream = enc.flush()
    assert len(stream) > 0
    dec = RansDecoder(force_python=force_python)
    dec.set_stream(stream)
    out = dec.decode_stream(indexes, table, lengths, offsets)
    np.testing.assert_array_equal(out, symbols)


@pytest.mark.skipif(not NATIVE, reason="native codec unavailable")
def test_rans_cross_implementation(rng):
    """C++ and Python produce byte-identical streams; each decodes the other."""
    table, lengths, offsets = _random_tables(rng)
    symbols, indexes = _random_payload(rng, table, lengths, offsets, n=800)
    streams = {}
    for force_python in (False, True):
        enc = RansEncoder(force_python=force_python)
        enc.encode_with_indexes(symbols, indexes, table, lengths, offsets)
        streams[force_python] = enc.flush()
    assert streams[False] == streams[True]
    dec = RansDecoder(force_python=True)
    dec.set_stream(streams[False])
    np.testing.assert_array_equal(
        dec.decode_stream(indexes, table, lengths, offsets), symbols
    )


@pytest.mark.parametrize("force_python", [False, True])
def test_rans_multicall_stream(rng, force_python):
    """Buffered encode across calls + streaming decode (the 12-slice pattern)."""
    if force_python is False and not NATIVE:
        pytest.skip("native codec unavailable")
    table, lengths, offsets = _random_tables(rng)
    chunks = [_random_payload(rng, table, lengths, offsets, n=300) for _ in range(12)]
    enc = RansEncoder(force_python=force_python)
    for symbols, indexes in chunks:
        enc.encode_with_indexes(symbols, indexes, table, lengths, offsets)
    stream = enc.flush()
    dec = RansDecoder(force_python=force_python)
    dec.set_stream(stream)
    for symbols, indexes in chunks:
        out = dec.decode_stream(indexes, table, lengths, offsets)
        np.testing.assert_array_equal(out, symbols)


def test_rans_compression_efficiency(rng):
    """Near-deterministic PMFs must code close to entropy, not at 16 bits/sym."""
    n_sym = 16
    pmf = np.full(n_sym, 1e-4)
    pmf[0] = 1.0
    cdf = pmf_to_quantized_cdf(np.append(pmf / pmf.sum(), 1e-6))
    table = cdf[None].astype(np.int32)
    lengths = np.array([len(cdf)], np.int32)
    offsets = np.array([0], np.int32)
    n = 20000
    symbols = np.zeros(n, np.int32)
    indexes = np.zeros(n, np.int32)
    enc = RansEncoder()
    enc.encode_with_indexes(symbols, indexes, table, lengths, offsets)
    stream = enc.flush()
    bits_per_symbol = len(stream) * 8 / n
    assert bits_per_symbol < 0.05  # entropy ~0.002 bits/sym


@pytest.mark.skipif(not NATIVE, reason="native codec unavailable")
def test_pmf_to_quantized_cdf_native_matches_numpy(rng):
    for _ in range(50):
        n = int(rng.integers(2, 300))
        pmf = rng.random(n) ** 4  # spiky, many near-zero entries
        np.testing.assert_array_equal(
            pmf_to_quantized_cdf_native(pmf), pmf_to_quantized_cdf(pmf)
        )


def test_gaussian_tables_roundtrip(rng):
    """Symbols drawn near the table scales round-trip through real coding."""
    table = build_gaussian_tables(get_scale_table())
    n = 4000
    indexes = rng.integers(0, len(table.cdf_length), n).astype(np.int32)
    scales = get_scale_table()[indexes]
    symbols = np.round(rng.normal(0, scales)).astype(np.int32)
    enc = RansEncoder()
    enc.encode_with_indexes(
        symbols, indexes, table.quantized_cdf, table.cdf_length, table.offset
    )
    stream = enc.flush()
    dec = RansDecoder()
    dec.set_stream(stream)
    out = dec.decode_stream(
        indexes, table.quantized_cdf, table.cdf_length, table.offset
    )
    np.testing.assert_array_equal(out, symbols)


def test_permutation_coder_roundtrip(rng):
    from textmae_tpu.coding.permutation import PermutationCoder

    for L in (4, 36, 196):
        coder = PermutationCoder(L)
        for _ in range(3):
            perm = rng.permutation(L)
            data = coder.compress(perm)
            np.testing.assert_array_equal(coder.decompress(data), perm)


def test_permutation_coder_near_optimal(rng):
    """Coded size ~ log2(L!) + rANS flush overhead, beating Huffman."""
    from textmae_tpu.coding.permutation import PermutationCoder
    from scipy.special import gammaln

    L = 196
    coder = PermutationCoder(L)
    bits = len(coder.compress(rng.permutation(L))) * 8
    optimal = gammaln(L + 1) / np.log(2)  # log2(196!) ~ 1243 bits
    assert bits <= optimal + 96 + 8  # flush state + padding slack
    huff_bits = HuffmanCoder().compress(rng.permutation(L)).num_bits()
    assert bits < huff_bits


def test_permutation_coder_rejects_non_permutation():
    from textmae_tpu.coding.permutation import PermutationCoder

    with pytest.raises(ValueError):
        PermutationCoder(4).compress(np.array([0, 1, 1, 3]))


@pytest.mark.parametrize("force_python", [False, True])
def test_corrupted_stream_does_not_crash(rng, force_python):
    """Decoding garbage must return garbage or raise — never hang or segfault."""
    if force_python is False and not NATIVE:
        pytest.skip("native codec unavailable")
    table, lengths, offsets = _random_tables(rng)
    indexes = rng.integers(0, len(lengths), 200).astype(np.int32)
    garbage = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    dec = RansDecoder(force_python=force_python)
    dec.set_stream(garbage)
    try:
        out = dec.decode_stream(indexes, table, lengths, offsets)
        assert out.shape == (200,)  # decoded garbage is fine
    except ValueError:
        pass  # explicit decode error is fine too


def test_decoder_rejects_short_stream():
    dec = RansDecoder()
    with pytest.raises(ValueError):
        dec.set_stream(b"abc")  # < 8 bytes, no valid state


# ---------------------------------------------------------------------------
# On-device (jit) rANS decoder: bit-exact vs the host coders
# ---------------------------------------------------------------------------
def test_device_rans_matches_host(rng):
    """The jit device decoder reproduces the host decode exactly — batched
    unequal-length streams, escapes included (VERDICT r2 Next #6: the decode
    chain's host alternations replaced by in-jit symbol decode)."""
    import jax

    from textmae_tpu.coding.device_rans import decode_symbols, init_states

    table, lengths, offsets = _random_tables(rng)
    n_streams, T = 5, 400
    streams, all_syms, all_idx = [], [], []
    for _ in range(n_streams):
        symbols, indexes = _random_payload(
            rng, table, lengths, offsets, n=T, escape_frac=0.08
        )
        enc = RansEncoder()
        enc.encode_with_indexes(symbols, indexes, table, lengths, offsets)
        streams.append(enc.flush())
        all_syms.append(symbols)
        all_idx.append(indexes)
    # host reference
    for s, syms, idx in zip(streams, all_syms, all_idx):
        dec = RansDecoder()
        dec.set_stream(s)
        np.testing.assert_array_equal(
            dec.decode_stream(idx, table, lengths, offsets), syms
        )
    # device decode, all streams at once
    words, count, hi, lo, pos = init_states(streams)
    out, _, _, _ = jax.jit(decode_symbols)(
        words, count, hi, lo, pos, np.stack(all_idx), table, lengths, offsets
    )
    np.testing.assert_array_equal(np.asarray(out), np.stack(all_syms))


def test_device_rans_state_threads_across_calls(rng):
    """Decoder state (hi, lo, pos) carries across decode_symbols calls the
    way RansDecoder state persists across decode_stream calls — the slice
    chain decodes one slice per call against device-computed indexes."""
    import jax

    from textmae_tpu.coding.device_rans import decode_symbols, init_states

    table, lengths, offsets = _random_tables(rng)
    chunks = [
        _random_payload(rng, table, lengths, offsets, n=120, escape_frac=0.1)
        for _ in range(6)
    ]
    enc = RansEncoder()
    for syms, idx in chunks:
        enc.encode_with_indexes(syms, idx, table, lengths, offsets)
    stream = enc.flush()
    words, count, hi, lo, pos = init_states([stream])
    dec = jax.jit(decode_symbols)
    for syms, idx in chunks:
        out, hi, lo, pos = dec(
            words, count, hi, lo, pos, idx[None], table, lengths, offsets
        )
        np.testing.assert_array_equal(np.asarray(out)[0], syms)


def test_device_rans_gaussian_tables(rng):
    """Same check against the REAL Gaussian scale tables the codec uses
    (64 scales, long CDF rows — the production decode path's table shape)."""
    import jax

    from textmae_tpu.coding.device_rans import decode_symbols, init_states

    gt = build_gaussian_tables(get_scale_table())
    n = 1500
    indexes = rng.integers(0, len(gt.cdf_length), n).astype(np.int32)
    max_bins = gt.cdf_length[indexes] - 2
    symbols = (rng.random(n) * max_bins).astype(np.int32) + gt.offset[indexes]
    enc = RansEncoder()
    enc.encode_with_indexes(
        symbols, indexes, gt.quantized_cdf, gt.cdf_length, gt.offset
    )
    stream = enc.flush()
    words, count, hi, lo, pos = init_states([stream])
    out, _, _, _ = jax.jit(decode_symbols)(
        words, count, hi, lo, pos, indexes[None],
        gt.quantized_cdf, gt.cdf_length, gt.offset,
    )
    np.testing.assert_array_equal(np.asarray(out)[0], symbols)


def test_device_rans_encode_matches_host(rng):
    """The jit device ENCODER emits byte-for-byte the host coders' streams —
    batched unequal payloads, escapes included (the compress-side counterpart
    of the device decode chain: symbols never have to visit the host)."""
    import jax

    from textmae_tpu.coding.device_rans import encode_symbols, finalize_streams

    table, lengths, offsets = _random_tables(rng)
    n_streams, t = 5, 400
    all_syms, all_idx, host_streams = [], [], []
    for _ in range(n_streams):
        symbols, indexes = _random_payload(
            rng, table, lengths, offsets, n=t, escape_frac=0.15
        )
        enc = RansEncoder()
        enc.encode_with_indexes(symbols, indexes, table, lengths, offsets)
        host_streams.append(enc.flush())
        all_syms.append(symbols)
        all_idx.append(indexes)
    words, wcount, hi, lo = jax.jit(encode_symbols)(
        np.stack(all_syms), np.stack(all_idx), table, lengths, offsets
    )
    assert finalize_streams(words, wcount, hi, lo) == host_streams


def test_device_rans_encode_escape_extremes():
    """Large escape magnitudes (up to the documented raw < 2^31 device
    domain) match the host encoder and round-trip through both decoders."""
    import jax

    from textmae_tpu.coding.device_rans import (
        decode_symbols,
        encode_symbols,
        finalize_streams,
        init_states,
    )

    table = np.array([[0, 30000, 65536, 0]], np.int32)
    lengths = np.array([3], np.int32)
    offsets = np.array([-1], np.int32)
    syms = np.array([[2**29, -(2**29), -1, 0, 5000, -70000, 2, 1]], np.int32)
    idx = np.zeros_like(syms)
    enc = RansEncoder()
    enc.encode_with_indexes(syms[0], idx[0], table, lengths, offsets)
    host = enc.flush()
    w, c, hi, lo = jax.jit(encode_symbols)(syms, idx, table, lengths, offsets)
    (dev,) = finalize_streams(w, c, hi, lo)
    assert dev == host
    dec = RansDecoder()
    dec.set_stream(dev)
    np.testing.assert_array_equal(
        dec.decode_stream(idx[0], table, lengths, offsets), syms[0]
    )
    words, count, h2, l2, pos = init_states([dev])
    out, _, _, _ = jax.jit(decode_symbols)(
        words, count, h2, l2, pos, idx, table, lengths, offsets
    )
    np.testing.assert_array_equal(np.asarray(out)[0], syms[0])


def test_device_rans_encode_overflow_detected(rng):
    """A too-small max_words raises instead of shipping a truncated stream
    (dropped scatter lanes are still counted, so wcount exposes the need)."""
    import jax

    from textmae_tpu.coding.device_rans import encode_symbols, finalize_streams

    table, lengths, offsets = _random_tables(rng)
    symbols, indexes = _random_payload(rng, table, lengths, offsets, n=200)
    w, c, hi, lo = jax.jit(
        lambda s, i: encode_symbols(s, i, table, lengths, offsets, max_words=2)
    )(symbols[None], indexes[None])
    with pytest.raises(ValueError, match="overflow"):
        finalize_streams(w, c, hi, lo)


def test_device_rans_encode_gaussian_roundtrip(rng):
    """Production Gaussian tables: device encode == host encode byte-for-byte
    and the streams round-trip through BOTH decoders (the full on-device
    codec loop the compress/decompress paths rely on)."""
    import jax

    from textmae_tpu.coding.device_rans import (
        decode_symbols,
        encode_symbols,
        finalize_streams,
        init_states,
    )

    gt = build_gaussian_tables(get_scale_table())
    n, t = 3, 1500
    indexes = rng.integers(0, len(gt.cdf_length), (n, t)).astype(np.int32)
    max_bins = gt.cdf_length[indexes] - 2
    symbols = ((rng.random((n, t)) * (max_bins + 6)) - 3).astype(
        np.int32
    ) + gt.offset[indexes]
    w, c, hi, lo = jax.jit(encode_symbols)(
        symbols, indexes, gt.quantized_cdf, gt.cdf_length, gt.offset
    )
    streams = finalize_streams(w, c, hi, lo)
    for i in range(n):
        enc = RansEncoder()
        enc.encode_with_indexes(
            symbols[i], indexes[i], gt.quantized_cdf, gt.cdf_length, gt.offset
        )
        assert enc.flush() == streams[i]
        dec = RansDecoder()
        dec.set_stream(streams[i])
        np.testing.assert_array_equal(
            dec.decode_stream(indexes[i], gt.quantized_cdf, gt.cdf_length, gt.offset),
            symbols[i],
        )
    words, count, h2, l2, pos = init_states(streams)
    out, _, _, _ = jax.jit(decode_symbols)(
        words, count, h2, l2, pos, indexes, gt.quantized_cdf, gt.cdf_length, gt.offset
    )
    np.testing.assert_array_equal(np.asarray(out), symbols)


def test_huffman_roundtrip(rng):
    coder = HuffmanCoder()
    for shape in [(196,), (1, 196), (5, 5)]:
        values = rng.integers(0, 196, shape)
        payload = coder.compress(values)
        np.testing.assert_array_equal(coder.decompress(payload), values)
        assert payload.num_bits() > 0


def test_huffman_single_symbol():
    coder = HuffmanCoder()
    values = np.full((10,), 7)
    payload = coder.compress(values)
    np.testing.assert_array_equal(coder.decompress(payload), values)


def test_huffman_beats_raw(rng):
    """Skewed data must compress below the raw 8-bit encoding."""
    coder = HuffmanCoder()
    values = np.clip(rng.geometric(0.5, 2000) - 1, 0, 255)
    payload = coder.compress(values)
    assert payload.num_bits() < 8 * len(values)


def test_permutation_coder_large_and_odd(rng):
    from textmae_tpu.coding.permutation import PermutationCoder

    for L in (197, 1024):
        coder = PermutationCoder(L)
        perm = rng.permutation(L)
        np.testing.assert_array_equal(coder.decompress(coder.compress(perm)), perm)


def test_entropy_coder_registry():
    """set_entropy_coder switches the process default backend; the python
    mirror produces byte-identical streams (testing.py:176-179 parity)."""
    import numpy as np

    from textmae_tpu.coding import (
        RansDecoder,
        RansEncoder,
        available_entropy_coders,
        get_entropy_coder,
        set_entropy_coder,
    )
    from textmae_tpu.entropy.gaussian import build_gaussian_tables, get_scale_table

    assert "rans" in available_entropy_coders()
    t = build_gaussian_tables(get_scale_table()[:8])
    r = np.random.default_rng(0)
    sym = r.integers(-20, 20, 256).astype(np.int32)
    idx = r.integers(0, 8, 256).astype(np.int32)

    def encode():
        enc = RansEncoder()
        enc.encode_with_indexes(sym, idx, t.quantized_cdf, t.cdf_length, t.offset)
        return enc.flush()

    default = encode()
    try:
        set_entropy_coder("rans-python")
        assert get_entropy_coder() == "rans-python"
        py_stream = encode()
        assert py_stream == default  # same wire format either way
        dec = RansDecoder()  # python-backed under the current default
        dec.set_stream(default)
        out = dec.decode_stream(idx, t.quantized_cdf, t.cdf_length, t.offset)
        np.testing.assert_array_equal(out, sym)
    finally:
        set_entropy_coder("rans")

    import pytest

    with pytest.raises(ValueError):
        set_entropy_coder("nope")


def test_huffman_negative_and_sparse_symbols():
    """Negative symbols must not alias positive ones (value-indexed table
    bug): [5,-1,5,-1,3] used to round-trip as [-1,-1,-1,-1,3]."""
    from textmae_tpu.coding.huffman import HuffmanCoder

    h = HuffmanCoder()
    for vals in (
        np.array([5, -1, 5, -1, 3]),
        np.array([-1000000, 1000000, 0, -1]),
        np.array([], np.int64),
        np.array([[7]]),
    ):
        out = h.decompress(h.compress(vals))
        np.testing.assert_array_equal(out, vals.reshape(out.shape))


def test_escape_payload_full_int32_range():
    """|symbol - offset| up to 2^32-1 must round-trip identically through
    every encoder/decoder backend combination (the native coder used to
    wrap the escape payload in uint32)."""
    from textmae_tpu.coding import RansDecoder, RansEncoder

    cdf = np.array([[0, 32768, 65534, 65536]], np.int32)
    cl = np.array([4], np.int32)
    cases = [
        (np.int32(2**31 - 1), np.int32(-(2**31))),  # raw = 2^32-1
        (np.int32(-(2**31)), np.int32(2**31 - 1)),  # raw negative extreme
        (np.int32(12345), np.int32(0)),
        (np.int32(-7), np.int32(3)),
    ]
    idx = np.zeros(len(cases), np.int32)
    sym = np.array([c[0] for c in cases], np.int32)
    off_full = np.array([c[1] for c in cases], np.int32)
    # per-symbol offsets need per-symbol rows; use one row, vary via indexes
    cdfs = np.repeat(cdf, len(cases), 0)
    cls = np.repeat(cl, len(cases), 0)
    idx = np.arange(len(cases), dtype=np.int32)
    streams = []
    for ep in (False, True):
        enc = RansEncoder(force_python=ep)
        enc.encode_with_indexes(sym, idx, cdfs, cls, off_full)
        streams.append(enc.flush())
    assert streams[0] == streams[1]  # backend-identical bytes
    for dp in (False, True):
        dec = RansDecoder(force_python=dp)
        dec.set_stream(streams[0])
        got = dec.decode_stream(idx, cdfs, cls, off_full)
        np.testing.assert_array_equal(got, sym)
