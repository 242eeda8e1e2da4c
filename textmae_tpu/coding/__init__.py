"""Bitstream coding runtime: C++ rANS codec, CDF builder, Huffman side-info.

The hot path (per-symbol range coding) is native C++ (csrc/rans.cpp, C ABI via
ctypes); a bit-exact pure-Python mirror keeps the package importable where the
toolchain is unavailable.
"""
from textmae_tpu.coding.rans import (
    RansDecoder,
    RansEncoder,
    available_entropy_coders,
    get_entropy_coder,
    native_available,
    pmf_to_quantized_cdf_native,
    set_entropy_coder,
)
from textmae_tpu.coding.huffman import HuffmanCoder, HuffmanPayload
from textmae_tpu.coding.permutation import PermutationCoder

__all__ = [
    "RansEncoder",
    "RansDecoder",
    "available_entropy_coders",
    "get_entropy_coder",
    "set_entropy_coder",
    "native_available",
    "pmf_to_quantized_cdf_native",
    "HuffmanCoder",
    "HuffmanPayload",
    "PermutationCoder",
]
