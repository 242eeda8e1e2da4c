"""Cross-cutting utilities: profiling, smoke checks."""
from textmae_tpu.utils.flops import chip_peak_flops, compiled_flops, mfu
from textmae_tpu.utils.profiling import StepTimer, enable_compile_cache, profile_trace

__all__ = ["profile_trace", "StepTimer", "enable_compile_cache", "chip_peak_flops", "compiled_flops", "mfu"]
