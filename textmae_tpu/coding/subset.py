"""Optimal K-of-L subset coder for the canonical-order ids_restore side info.

When the MCM keeps tokens in canonical (ascending-index) order
(masking.get_ids_shuffle canonical=True), the ids_restore permutation is a
pure function of the kept SET, whose exact information content is
log2(C(L, K)) bits — ~164 bits for 196/144 vs ~1243 for the raw permutation
(PermutationCoder) and ~1570+ for the reference's Huffman
(/root/reference/utils/huffman.py via testing.py:73-76).

Coding: walk indices 0..L-1; at each step the membership flag is Bernoulli
with exact probability k_remaining / total_remaining, known identically to
encoder and decoder. Each reachable (k_rem, t_rem) state gets its own 2-bin
quantized CDF row through the same rANS runtime; positions where k_rem == 0
or k_rem == t_rem are deterministic and coded for free (skipped).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from textmae_tpu.coding.rans import RansDecoder, RansEncoder

_ONE = 1 << 16


class SubsetCoder:
    """Encode/decode sorted K-element subsets of 0..L-1 at ~log2(C(L,K)) bits."""

    def __init__(self, length: int, k: int):
        if not 0 <= k <= length:
            raise ValueError("k must be in [0, length]")
        self.length = length
        self.k = k
        self._state_row: Dict[Tuple[int, int], int] = {}
        rows = []
        # reachable states: t_rem in [1, L], k_rem in [1, t_rem-1] bounded by K
        for t_rem in range(1, length + 1):
            for k_rem in range(max(1, k - (length - t_rem)), min(k, t_rem - 1) + 1):
                f1 = int(round(_ONE * k_rem / t_rem))
                f1 = min(max(f1, 1), _ONE - 2)  # leave >=1 slot for bin0 + escape
                f0 = _ONE - 1 - f1
                rows.append((0, f0, f0 + f1, _ONE))  # bins: 0, 1, escape(1 slot)
                self._state_row[(k_rem, t_rem)] = len(rows) - 1
        self._cdfs = np.asarray(rows, np.int32) if rows else np.zeros((1, 4), np.int32)
        self._lengths = np.full(len(self._cdfs), 4, np.int32)
        self._offsets = np.zeros(len(self._cdfs), np.int32)

    def _walk(self):
        """Yield (position, row_id) for every non-deterministic position;
        the caller send()s each membership flag back to advance the state."""
        k_rem, t_rem = self.k, self.length
        for i in range(self.length):
            if 0 < k_rem < t_rem:
                flag = yield i, self._state_row[(k_rem, t_rem)]
                if flag:
                    k_rem -= 1
            t_rem -= 1

    def compress(self, kept: np.ndarray) -> bytes:
        kept = np.asarray(kept).reshape(-1)
        if len(kept) != self.k or len(np.unique(kept)) != self.k or (
            self.k and (kept.min() < 0 or kept.max() >= self.length)
        ):
            raise ValueError(f"not a {self.k}-subset of 0..{self.length - 1}")
        member = np.zeros(self.length, bool)
        member[kept] = True
        symbols, indexes = [], []
        walker = self._walk()
        try:
            i, row = next(walker)
            while True:
                symbols.append(int(member[i]))
                indexes.append(row)
                i, row = walker.send(bool(member[i]))
        except StopIteration:
            pass
        enc = RansEncoder()
        if symbols:
            enc.encode_with_indexes(
                np.asarray(symbols, np.int32), np.asarray(indexes, np.int32),
                self._cdfs, self._lengths, self._offsets,
            )
        return enc.flush()

    def decompress(self, data: bytes) -> np.ndarray:
        dec = RansDecoder()
        dec.set_stream(data)
        member = np.zeros(self.length, bool)
        k_rem, t_rem = self.k, self.length
        for i in range(self.length):
            if k_rem == t_rem:  # everything remaining is kept
                member[i:] = True
                break
            if k_rem > 0:
                row = self._state_row[(k_rem, t_rem)]
                flag = int(
                    dec.decode_stream(
                        np.asarray([row], np.int32),
                        self._cdfs, self._lengths, self._offsets,
                    )[0]
                )
                if flag:
                    member[i] = True
                    k_rem -= 1
            t_rem -= 1
        return np.nonzero(member)[0].astype(np.int64)


def ids_restore_from_kept(kept: np.ndarray, length: int) -> np.ndarray:
    """Canonical ids_restore from the kept set: ids_shuffle = sorted(kept) ++
    sorted(complement); ids_restore = argsort(ids_shuffle)."""
    kept = np.sort(np.asarray(kept).reshape(-1))
    member = np.zeros(length, bool)
    member[kept] = True
    ids_shuffle = np.concatenate([np.nonzero(member)[0], np.nonzero(~member)[0]])
    return np.argsort(ids_shuffle).astype(np.int64)
