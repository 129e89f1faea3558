"""TPU-native op layer: selective scan, causal conv1d, norms, decode-step ops.

Equivalent surface to the reference op layer
(`mamba/mamba_ssm/ops/selective_scan_interface.py`,
`causal-conv1d/causal_conv1d/causal_conv1d_interface.py`,
`mamba/mamba_ssm/ops/triton/{layernorm,selective_state_update}.py`),
re-designed for JAX/XLA/Pallas with a time-major (batch, seqlen, dim) layout
so that `dim` rides the TPU lane dimension.
"""

from .selective_scan import (
    selective_scan,
    selective_scan_ref,
    selective_scan_assoc,
)
from .causal_conv1d import (
    causal_conv1d,
    causal_conv1d_ref,
    causal_conv1d_update,
)
from .selective_state_update import selective_state_update, selective_state_update_ref
from .norms import layer_norm, rms_norm, fused_add_norm
from .mamba_inner import mamba_inner

__all__ = [
    "selective_scan",
    "selective_scan_ref",
    "selective_scan_assoc",
    "causal_conv1d",
    "causal_conv1d_ref",
    "causal_conv1d_update",
    "selective_state_update",
    "selective_state_update_ref",
    "layer_norm",
    "rms_norm",
    "fused_add_norm",
    "mamba_inner",
]
