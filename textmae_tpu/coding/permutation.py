"""Optimal permutation coder for the ids_restore side info.

The reference Huffman-codes the raw ids_restore values
(/root/reference/testing.py:73-76) paying >= L*log2(L) payload bits plus a
code table. But ids_restore is a *permutation* of 0..L-1: its exact
information content is log2(L!) bits (~1243 bits for L=196 vs ~1570+ for
Huffman). This coder hits that bound (+rANS flush overhead) by encoding the
Lehmer code — digit i uniform over L-i symbols — through the same rANS
runtime, with no table in the stream (both sides derive the uniform CDFs from
L alone).

HuffmanCoder remains available for generic side info; this is the default for
permutations in the eval harness (deliberate improvement, documented).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from textmae_tpu.coding.rans import RansDecoder, RansEncoder

_PRECISION = 16


def _uniform_tables(n: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CDF rows for uniform alphabets of size 1..n.

    Row m-1 codes digits in [0, m): m bins spread over 2^16 - 1 slots plus a
    1-slot escape bin (required by the row convention, never hit).
    """
    one = 1 << _PRECISION
    max_len = n + 2  # m bins + escape bin -> m+2 cdf entries
    cdfs = np.zeros((n, max_len), np.int32)
    lengths = np.empty(n, np.int32)
    offsets = np.zeros(n, np.int32)
    for m in range(1, n + 1):
        ks = np.arange(m + 1, dtype=np.int64)
        cdf = (ks * (one - 1)) // m  # strictly increasing for m <= 2^16 - 1
        row = np.concatenate([cdf, [one]])  # escape bin gets the last slot
        cdfs[m - 1, : m + 2] = row
        lengths[m - 1] = m + 2
    return cdfs, lengths, offsets


class PermutationCoder:
    """Encode/decode permutations of 0..L-1 at ~log2(L!) bits."""

    def __init__(self, length: int):
        self.length = length
        self._cdfs, self._lengths, self._offsets = _uniform_tables(length)

    def _lehmer(self, perm: np.ndarray) -> np.ndarray:
        """perm -> digits d_i in [0, L-i): rank among remaining symbols.

        d_i = perm[i] - |{j < i : perm[j] < perm[i]}|, vectorized O(L^2) bools.
        """
        lt = perm[None, :] < perm[:, None]  # lt[i, j] = perm[j] < perm[i]
        used_smaller = np.tril(lt, -1).sum(axis=1)
        return (perm - used_smaller).astype(np.int32)

    def _unlehmer(self, digits: np.ndarray) -> np.ndarray:
        remaining = list(range(self.length))
        out = np.empty(self.length, np.int64)
        for i, d in enumerate(digits):
            out[i] = remaining.pop(int(d))
        return out

    def compress(self, perm: np.ndarray) -> bytes:
        perm = np.asarray(perm).reshape(-1)
        if len(perm) != self.length or sorted(perm.tolist()) != list(range(self.length)):
            raise ValueError(f"not a permutation of 0..{self.length - 1}")
        digits = self._lehmer(perm)
        # digit i has alphabet size L-i -> table row (L-i) - 1
        indexes = (self.length - np.arange(self.length) - 1).astype(np.int32)
        enc = RansEncoder()
        enc.encode_with_indexes(digits, indexes, self._cdfs, self._lengths, self._offsets)
        return enc.flush()

    def decompress(self, data: bytes) -> np.ndarray:
        indexes = (self.length - np.arange(self.length) - 1).astype(np.int32)
        dec = RansDecoder()
        dec.set_stream(data)
        digits = dec.decode_stream(indexes, self._cdfs, self._lengths, self._offsets)
        return self._unlehmer(digits)
