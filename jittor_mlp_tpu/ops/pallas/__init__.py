from .mixer_block import fused_mixer_block

__all__ = ["fused_mixer_block"]
