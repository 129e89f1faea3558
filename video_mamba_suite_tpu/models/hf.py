"""HF-hub checkpoint loading for MambaLMHeadModel.

Capability match for /root/reference/mamba/mamba_ssm/utils/hf.py:9-23
(load_config_hf / load_state_dict_hf via transformers' cached_file) and the
`MambaLMHeadModel.from_pretrained` entry (models/mixer_seq_simple.py:222-227).

Works offline-first: a local directory (or file) takes precedence; the hub
path is import-guarded (huggingface_hub is optional in this environment).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

from .convert import convert_mamba_lm, load_torch_checkpoint
from .mixer_seq import MambaLMHeadModel

_CONFIG_NAME = "config.json"
_WEIGHTS_NAMES = ("pytorch_model.bin", "model.pt", "checkpoint.pt")


def _resolve_file(name_or_path: str, filename: str) -> Optional[str]:
    """Local dir → join; else try the HF hub cache (optional dependency)."""
    if os.path.isdir(name_or_path):
        p = os.path.join(name_or_path, filename)
        return p if os.path.exists(p) else None
    try:  # hub fallback (offline environments skip this cleanly)
        from huggingface_hub import hf_hub_download  # type: ignore

        return hf_hub_download(name_or_path, filename)
    except Exception:
        return None


def load_config_hf(name_or_path: str) -> Dict[str, Any]:
    p = _resolve_file(name_or_path, _CONFIG_NAME)
    if p is None:
        raise FileNotFoundError(
            f"no {_CONFIG_NAME} for {name_or_path!r} (offline and not a "
            "local directory?)")
    with open(p) as f:
        return json.load(f)


def load_state_dict_hf(name_or_path: str) -> Dict[str, Any]:
    if os.path.isfile(name_or_path):  # direct checkpoint file
        return load_torch_checkpoint(name_or_path)
    for fname in _WEIGHTS_NAMES:
        p = _resolve_file(name_or_path, fname)
        if p is not None:
            return load_torch_checkpoint(p)
    raise FileNotFoundError(f"no weights file for {name_or_path!r}")


def from_pretrained(
    name_or_path: str,
    config: Optional[Dict[str, Any]] = None,
) -> Tuple[MambaLMHeadModel, Dict[str, Any]]:
    """Build (model, params) from an upstream state-spaces/mamba-* layout.

    `config` overrides/bypasses config.json (handy for a bare .pt file).
    Accepts both the old flat config keys and the HF MambaConfig-style
    names (hidden_size/num_hidden_layers).
    """
    cfg = dict(config) if config is not None else load_config_hf(name_or_path)
    d_model = cfg.get("d_model", cfg.get("hidden_size"))
    n_layer = cfg.get("n_layer", cfg.get("num_hidden_layers"))
    vocab_size = cfg["vocab_size"]
    ssm_cfg = cfg.get("ssm_cfg", {}) or {}
    model = MambaLMHeadModel(
        d_model=int(d_model),
        n_layer=int(n_layer),
        vocab_size=int(vocab_size),
        d_state=int(ssm_cfg.get("d_state", 16)),
        d_conv=int(ssm_cfg.get("d_conv", 4)),
        expand=int(ssm_cfg.get("expand", 2)),
        rms_norm=bool(cfg.get("rms_norm", True)),
        pad_vocab_size_multiple=int(cfg.get("pad_vocab_size_multiple", 8)),
    )
    sd = load_state_dict_hf(name_or_path)
    params = convert_mamba_lm(sd, n_layer=int(n_layer))
    return model, params
