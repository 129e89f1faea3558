"""Bindings for the native (C++) components in csrc/.

- `selective_scan_cpu`: XLA FFI custom call running the exact sequential
  recurrence on CPU — the native-reference execution path (the Pallas kernel
  is the TPU production path); counterpart of the reference CUDA dispatcher
  (/root/reference/mamba/csrc/selective_scan/selective_scan.cpp:227-497).
- `nms_1d_native` / `soft_nms_1d_native`: ctypes bindings of csrc/nms_1d.cc
  (counterpart of TAL's nms_cpu.cpp op).
- `read_files_parallel`: threaded raw-file reader (csrc/feature_loader.cc).

All loaders build on demand via csrc/Makefile and gate gracefully: callers
fall back to the pure-Python implementations when the toolchain is absent.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _ensure_built(lib: str) -> Optional[str]:
    path = os.path.join(_CSRC, lib)
    if os.path.exists(path):
        return path
    try:
        subprocess.run(["make", "-C", _CSRC, lib], check=True,
                       capture_output=True)
        return path if os.path.exists(path) else None
    except Exception:
        return None


@functools.lru_cache()
def _nms_lib():
    path = _ensure_built("libnms_1d.so")
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.nms_1d.restype = ctypes.c_int64
    lib.soft_nms_1d.restype = ctypes.c_int64
    return lib


def nms_1d_native(segs: np.ndarray, scores: np.ndarray,
                  iou_threshold: float) -> Optional[np.ndarray]:
    lib = _nms_lib()
    if lib is None:
        return None
    segs = np.ascontiguousarray(segs, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(scores)
    keep = np.empty(n, np.int64)
    kept = lib.nms_1d(
        segs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_float(iou_threshold),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return keep[:kept]


def soft_nms_1d_native(segs: np.ndarray, scores: np.ndarray,
                       iou_threshold: float = 0.1, sigma: float = 0.5,
                       min_score: float = 0.001, method: int = 2
                       ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = _nms_lib()
    if lib is None:
        return None
    segs_c = np.ascontiguousarray(segs, np.float32).copy()
    scores_c = np.ascontiguousarray(scores, np.float32).copy()
    n = len(scores_c)
    inds = np.empty(n, np.int64)
    kept = lib.soft_nms_1d(
        segs_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_float(iou_threshold),
        ctypes.c_float(sigma), ctypes.c_float(min_score),
        ctypes.c_int64(method),
        inds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    kept_inds = inds[:kept]
    return segs[kept_inds].astype(np.float64), scores_c[kept_inds].astype(
        np.float64
    ), kept_inds


@functools.lru_cache()
def _register_selective_scan_ffi() -> bool:
    path = _ensure_built("libselective_scan_cpu.so")
    if path is None:
        return False
    try:
        import jax.ffi

        lib = ctypes.CDLL(path)
        jax.ffi.register_ffi_target(
            "vms_selective_scan_fwd",
            jax.ffi.pycapsule(lib.SelectiveScanFwd),
            platform="cpu",
        )
        return True
    except Exception:
        return False


def selective_scan_cpu(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                       delta_softplus: bool = False,
                       return_last_state: bool = False):
    """Run the native CPU selective scan via XLA FFI. f32, variable B/C.

    Raises RuntimeError when the native library can't be built.
    """
    import jax
    import jax.numpy as jnp

    if not _register_selective_scan_ffi():
        raise RuntimeError("native selective_scan_cpu unavailable")

    b, l, d = u.shape
    n = A.shape[1]
    flags = (
        (1 if D is not None else 0)
        | (2 if z is not None else 0)
        | (4 if delta_bias is not None else 0)
        | (8 if delta_softplus else 0)
    )
    f32 = jnp.float32
    args = (
        u.astype(f32), delta.astype(f32), A.astype(f32),
        B.astype(f32), C.astype(f32),
        (D if D is not None else jnp.zeros((d,), f32)).astype(f32),
        (z if z is not None else jnp.zeros((b, l, d), f32)).astype(f32),
        (delta_bias if delta_bias is not None else jnp.zeros((d,), f32)).astype(f32),
    )
    call = jax.ffi.ffi_call(
        "vms_selective_scan_fwd",
        (
            jax.ShapeDtypeStruct((b, l, d), f32),
            jax.ShapeDtypeStruct((b, d, n), f32),
        ),
    )
    out, last = call(*args, flags=np.int64(flags))
    if return_last_state:
        return out, last
    return out
