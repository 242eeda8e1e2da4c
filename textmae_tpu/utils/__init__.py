"""Cross-cutting utilities: profiling, smoke checks."""
from textmae_tpu.utils.profiling import StepTimer, enable_compile_cache, profile_trace

__all__ = ["profile_trace", "StepTimer", "enable_compile_cache"]
