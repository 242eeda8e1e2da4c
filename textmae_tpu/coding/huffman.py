"""Canonical Huffman coder for small integer side-info arrays.

Role parity with the reference's host Huffman (used only to entropy-code the
`ids_restore` permutation, /root/reference/utils/huffman.py:6-171 via
testing.py:73-76). Differences by design: codes are canonical (decode needs
only code lengths), the bitstream is packed bytes rather than a Python "0101"
string, and encode/decode are numpy-vectorized.
"""
from __future__ import annotations

import heapq
from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np


def _code_lengths(values: np.ndarray) -> Dict[int, int]:
    symbols, counts = np.unique(values, return_counts=True)
    if len(symbols) == 1:
        return {int(symbols[0]): 1}
    heap = [(int(c), i, (int(s),)) for i, (s, c) in enumerate(zip(symbols, counts))]
    heapq.heapify(heap)
    lengths = {int(s): 0 for s in symbols}
    uid = len(heap)
    while len(heap) > 1:
        c1, _, s1 = heapq.heappop(heap)
        c2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (c1 + c2, uid, s1 + s2))
        uid += 1
    return lengths


def _canonical_codes(lengths: Dict[int, int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length), canonical order (length, then symbol)."""
    items = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
    codes, code, prev_len = {}, 0, 0
    for sym, length in items:
        code <<= length - prev_len
        codes[sym] = (code, length)
        code += 1
        prev_len = length
    return codes


@dataclass
class HuffmanPayload:
    data: bytes          # packed code bits
    nbits: int           # valid bit count in data
    symbols: np.ndarray  # table symbols in canonical order
    lengths: np.ndarray  # their code lengths
    shape: Tuple[int, ...]

    def num_bits(self) -> int:
        """Total side-info cost in bits (payload + table), for bpp accounting."""
        table_bits = 8 * (2 + len(self.symbols) * 3)  # symbol u16 + length u8
        return self.nbits + table_bits


class HuffmanCoder:
    def compress(self, values: np.ndarray) -> HuffmanPayload:
        values = np.asarray(values)
        flat = values.reshape(-1).astype(np.int64)
        lengths = _code_lengths(flat)
        codes = _canonical_codes(lengths)
        # dict lookup, not value-indexed arrays: symbols may be negative or
        # sparse, and a raw values-as-indices table would alias them
        bits = []
        for v in flat:  # small arrays (196 entries); loop is fine
            c, l = codes[int(v)]
            bits.append(np.binary_repr(c, width=l))
        bitstring = "".join(bits)
        nbits = len(bitstring)
        pad = (-nbits) % 8
        packed = int(bitstring + "0" * pad or "0", 2).to_bytes((nbits + pad) // 8 or 1, "big")
        items = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
        return HuffmanPayload(
            data=packed,
            nbits=nbits,
            symbols=np.array([s for s, _ in items], np.int64),
            lengths=np.array([l for _, l in items], np.int64),
            shape=values.shape,
        )

    def decompress(self, payload: HuffmanPayload) -> np.ndarray:
        codes = _canonical_codes(
            {int(s): int(l) for s, l in zip(payload.symbols, payload.lengths)}
        )
        decode = {(c, l): s for s, (c, l) in codes.items()}
        out = []
        acc, acc_len = 0, 0
        n_expected = int(np.prod(payload.shape)) if payload.shape else 1
        bitint = int.from_bytes(payload.data, "big")
        total_bits = len(payload.data) * 8
        pos = 0
        while len(out) < n_expected and pos < payload.nbits:
            bit = (bitint >> (total_bits - 1 - pos)) & 1
            pos += 1
            acc = (acc << 1) | bit
            acc_len += 1
            sym = decode.get((acc, acc_len))
            if sym is not None:
                out.append(sym)
                acc, acc_len = 0, 0
        if len(out) != n_expected:
            raise ValueError("truncated Huffman stream")
        return np.array(out, np.int64).reshape(payload.shape)
