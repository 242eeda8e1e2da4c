from textmae_tpu.entropy.entropy_bottleneck import EntropyBottleneck, build_eb_tables
from textmae_tpu.entropy.gaussian import (
    build_gaussian_tables,
    gaussian_build_indexes,
    gaussian_likelihood,
    get_scale_table,
)
from textmae_tpu.entropy.tables import CdfTable, pmf_to_quantized_cdf

__all__ = [
    "EntropyBottleneck",
    "build_eb_tables",
    "gaussian_likelihood",
    "gaussian_build_indexes",
    "build_gaussian_tables",
    "get_scale_table",
    "CdfTable",
    "pmf_to_quantized_cdf",
]
