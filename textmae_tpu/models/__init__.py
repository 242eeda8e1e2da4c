from textmae_tpu.models.mcm import MCM, MCMConfig

__all__ = ["MCM", "MCMConfig"]
