"""Model layer: Mamba mixers, blocks, sequence models, video backbones."""

from .mamba import (
    MambaVim,
    MambaDBM,
    MambaScanNorm,
    MambaCausal,
    Block,
    make_block,
)
from .mixer_seq import MixerModel, MambaLMHeadModel

__all__ = [
    "MambaVim",
    "MambaDBM",
    "MambaScanNorm",
    "MambaCausal",
    "Block",
    "make_block",
    "MixerModel",
    "MambaLMHeadModel",
]
