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

Hot paths: encode computes all state rows with vectorized numpy and issues
ONE encode call; decode runs the whole sequential walk inside the C++ runtime
(tm_dec_decode_subset) — one ctypes call per subset (the naive per-flag loop
costs a tunnel-visible ~50us round trip per position). A Python walk remains
as the no-toolchain fallback.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from textmae_tpu.coding.rans import RansDecoder, RansEncoder, _load_lib

_ONE = 1 << 16


class SubsetCoder:
    """Encode/decode sorted K-element subsets of 0..L-1 at ~log2(C(L,K)) bits."""

    def __init__(self, length: int, k: int):
        if not 0 <= k <= length:
            raise ValueError("k must be in [0, length]")
        self.length = length
        self.k = k
        # row_map[k_rem, t_rem] -> CDF row id (-1 unreachable/deterministic)
        self.row_map = np.full((k + 1, length + 1), -1, np.int32)
        rows = []
        for t_rem in range(1, length + 1):
            for k_rem in range(max(1, k - (length - t_rem)), min(k, t_rem - 1) + 1):
                f1 = int(round(_ONE * k_rem / t_rem))
                f1 = min(max(f1, 1), _ONE - 2)  # leave >=1 slot for bin0 + escape
                f0 = _ONE - 1 - f1
                rows.append((0, f0, f0 + f1, _ONE))  # bins: 0, 1, escape(1 slot)
                self.row_map[k_rem, t_rem] = len(rows) - 1
        self._cdfs = np.asarray(rows, np.int32) if rows else np.zeros((1, 4), np.int32)
        self._lengths = np.full(len(self._cdfs), 4, np.int32)
        self._offsets = np.zeros(len(self._cdfs), np.int32)

    def _states(self, member: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized walk: (flags, row ids) for non-deterministic positions."""
        L = self.length
        kept_before = np.concatenate([[0], np.cumsum(member[:-1])])
        k_rem = self.k - kept_before
        t_rem = L - np.arange(L)
        active = (k_rem > 0) & (k_rem < t_rem)
        rows = self.row_map[k_rem[active], t_rem[active]]
        return member[active].astype(np.int32), rows.astype(np.int32)

    def compress(self, kept: np.ndarray) -> bytes:
        kept = np.asarray(kept).reshape(-1)
        if len(kept) != self.k or len(np.unique(kept)) != self.k or (
            self.k and (kept.min() < 0 or kept.max() >= self.length)
        ):
            raise ValueError(f"not a {self.k}-subset of 0..{self.length - 1}")
        member = np.zeros(self.length, bool)
        member[kept] = True
        symbols, indexes = self._states(member)
        enc = RansEncoder()
        if len(symbols):
            enc.encode_with_indexes(
                symbols, indexes, self._cdfs, self._lengths, self._offsets
            )
        return enc.flush()

    def decompress(self, data: bytes) -> np.ndarray:
        dec = RansDecoder()
        dec.set_stream(data)
        lib = _load_lib()
        if getattr(dec, "_native", False) and lib and hasattr(lib, "tm_dec_decode_subset"):
            import ctypes

            member = np.zeros(self.length, np.uint8)
            rc = lib.tm_dec_decode_subset(
                dec._dec, self.length, self.k,
                np.ascontiguousarray(self.row_map),
                self._cdfs, len(self._cdfs), self._cdfs.shape[1],
                self._lengths,
                member.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if rc != 0:
                raise ValueError(f"subset decode failed (rc={rc})")
            return np.nonzero(member)[0].astype(np.int64)
        # Python fallback: per-flag walk
        member_b = np.zeros(self.length, bool)
        k_rem, t_rem = self.k, self.length
        for i in range(self.length):
            if k_rem == t_rem:
                member_b[i:] = True
                break
            if k_rem > 0:
                row = int(self.row_map[k_rem, t_rem])
                flag = int(
                    dec.decode_stream(
                        np.asarray([row], np.int32),
                        self._cdfs, self._lengths, self._offsets,
                    )[0]
                )
                if flag:
                    member_b[i] = True
                    k_rem -= 1
            t_rem -= 1
        return np.nonzero(member_b)[0].astype(np.int64)


def ids_restore_from_kept(kept: np.ndarray, length: int) -> np.ndarray:
    """Canonical ids_restore from the kept set: ids_shuffle = sorted(kept) ++
    sorted(complement); ids_restore = argsort(ids_shuffle)."""
    kept = np.sort(np.asarray(kept).reshape(-1))
    member = np.zeros(length, bool)
    member[kept] = True
    ids_shuffle = np.concatenate([np.nonzero(member)[0], np.nonzero(~member)[0]])
    return np.argsort(ids_shuffle).astype(np.int64)
