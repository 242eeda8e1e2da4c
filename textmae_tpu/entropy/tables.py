"""Quantized-CDF table construction for range coding.

Reimplements the semantics of compressai's C++ `pmf_to_quantized_cdf`
(referenced indirectly via model.update(force=True) at
/root/reference/testing.py:223): float PMF -> 16-bit integer CDF summing to
2^16, with zero-frequency slots "stealing" one probability slot from the
poorest symbol that still has more than one (compressai's donor choice —
bit-identical tables require copying it exactly) so every symbol stays
codable.

This module is the host-side reference implementation (numpy); the C++
extension in `textmae_tpu.coding` exposes a bit-identical fast path and is
cross-checked against this in tests.
"""
from __future__ import annotations

import dataclasses

import numpy as np


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """Convert a float PMF (tail mass included as the last entry) to an integer CDF.

    Returns an int32 array of length len(pmf) + 1 with cdf[0] == 0 and
    cdf[-1] == 2**precision, strictly increasing (every symbol gets >= 1 slot).
    """
    pmf = np.asarray(pmf, dtype=np.float64)
    if np.any(pmf < 0) or not np.all(np.isfinite(pmf)):
        raise ValueError("pmf must be finite and non-negative")
    total = pmf.sum()
    if total <= 0:
        raise ValueError("pmf must have positive mass")
    n = pmf.shape[0]
    freqs = np.round(pmf * (1 << precision) / total).astype(np.int64)
    # Absorb the rounding residual into the richest symbol so frequencies sum
    # exactly to 2**precision. (Deliberate divergence from compressai's C++,
    # which forces cdf[-1] after the fact and can silently produce a
    # non-monotone CDF when rounding overshoots by one.)
    freqs[freqs.argmax()] += (1 << precision) - freqs.sum()
    cdf = np.zeros(n + 1, dtype=np.int64)
    cdf[1:] = np.cumsum(freqs)

    # Steal slots for zero-frequency symbols from the POOREST symbol with
    # freq > 1 (compressai's donor choice; do not "fix" to the richest —
    # the C++ cross-check and compressai table parity depend on it).
    for i in range(n):
        if cdf[i] == cdf[i + 1]:
            best_freq = np.iinfo(np.int64).max
            best_steal = -1
            for j in range(n):
                freq = cdf[j + 1] - cdf[j]
                if 1 < freq < best_freq:
                    best_freq = freq
                    best_steal = j
            if best_steal == -1:
                raise ValueError("no probability mass to redistribute")
            if best_steal < i:
                cdf[best_steal + 1 : i + 1] -= 1
            else:
                cdf[i + 1 : best_steal + 1] += 1

    if not (np.all(np.diff(cdf) > 0) and cdf[0] == 0 and cdf[-1] == (1 << precision)):
        raise AssertionError("quantized CDF is not a valid strictly-increasing CDF")
    return cdf.astype(np.int32)


@dataclasses.dataclass(frozen=True)
class CdfTable:
    """Per-index quantized CDFs in the layout the rANS codec consumes.

    quantized_cdf: (num_indexes, max_cdf_length) int32, rows zero-padded
    cdf_length:    (num_indexes,) int32 — valid row lengths (pmf_length + 2)
    offset:        (num_indexes,) int32 — symbol value of CDF slot 0
    """

    quantized_cdf: np.ndarray
    cdf_length: np.ndarray
    offset: np.ndarray

    def __post_init__(self):
        assert self.quantized_cdf.ndim == 2
        assert self.cdf_length.shape[0] == self.quantized_cdf.shape[0]
        assert self.offset.shape[0] == self.quantized_cdf.shape[0]


def pmfs_to_cdf_table(
    pmf: np.ndarray, tail_mass: np.ndarray, pmf_length: np.ndarray, offset: np.ndarray
) -> CdfTable:
    """Stack per-index PMFs (+tail mass appended) into a padded CdfTable."""
    num = pmf.shape[0]
    max_length = int(pmf_length.max()) + 2
    cdfs = np.zeros((num, max_length), dtype=np.int32)
    for i in range(num):
        length = int(pmf_length[i])
        prob = np.concatenate([pmf[i, :length], tail_mass[i : i + 1]])
        cdfs[i, : length + 2] = pmf_to_quantized_cdf(prob)
    return CdfTable(
        quantized_cdf=cdfs,
        cdf_length=(pmf_length + 2).astype(np.int32),
        offset=offset.astype(np.int32),
    )
