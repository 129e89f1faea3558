"""Torch-free reader for PyTorch ``.pt``/``.pth`` files (zip format).

The reference's TAL datasets ship per-video features as ``torch.save``-d
tensors (temporal-action-localization/libs/datasets/*.py); reading them
back was this package's only torch dependency on the serving path. A
modern ``.pt`` file is just a zip archive::

    <name>/data.pkl      pickle of the object graph; tensors are
                         rebuilt via torch._utils._rebuild_tensor_v2 from
                         persistent-id storage references
    <name>/data/<key>    raw little-endian storage bytes, one per storage
    <name>/version, <name>/byteorder

so a restricted unpickler that resolves the handful of torch rebuild
symbols to numpy constructors loads the same tensors with zero torch.
Covers: tensors (incl. non-contiguous strides + storage offsets, via
as-strided views copied to owned memory), parameters, dicts/lists/tuples
of them, all fixed-size dtypes incl. bfloat16 (ml_dtypes). Falls back
with a clear error for the pre-1.6 legacy (non-zip) format — use
``torch.load`` for those.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

__all__ = ["load_pt", "is_zip_pt"]


def _np_dtype(name: str):
    if name in ("BFloat16", "bfloat16"):
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype({
        "Double": "<f8", "Float": "<f4", "Half": "<f2",
        "Long": "<i8", "Int": "<i4", "Short": "<i2", "Char": "i1",
        "Byte": "u1", "Bool": "?",
        "ComplexDouble": "<c16", "ComplexFloat": "<c8",
        # torch.<dtype> object names (appear in some payloads)
        "float64": "<f8", "float32": "<f4", "float16": "<f2",
        "int64": "<i8", "int32": "<i4", "int16": "<i2", "int8": "i1",
        "uint8": "u1", "bool": "?",
        "complex128": "<c16", "complex64": "<c8",
    }[name])


class _StorageType:
    """Stand-in for torch.FloatStorage & friends: carries only the dtype."""

    def __init__(self, dtype_name: str):
        self.dtype = _np_dtype(dtype_name)


class _Storage:
    """One resolved storage: raw bytes + element dtype."""

    def __init__(self, data: bytes, dtype: np.dtype):
        self.data = data
        self.dtype = dtype


def _rebuild_tensor(storage: _Storage, storage_offset, size, stride,
                    *unused) -> np.ndarray:
    """torch._utils._rebuild_tensor(_v2) → owned numpy array. Handles
    storage offsets and arbitrary (non-contiguous) strides by viewing the
    buffer as-strided, then copying to C-contiguous owned memory."""
    itemsize = storage.dtype.itemsize
    if not size:  # 0-d tensor
        flat = np.frombuffer(storage.data, dtype=storage.dtype,
                             count=1, offset=storage_offset * itemsize)
        return flat.copy().reshape(())
    view = np.ndarray(
        shape=tuple(size),
        dtype=storage.dtype,
        buffer=storage.data,
        offset=storage_offset * itemsize,
        strides=tuple(s * itemsize for s in stride),
    )
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, requires_grad=True, *unused) -> np.ndarray:
    return data


def _rebuild_from_type_v2(func, new_type, args, state):
    return func(*args)


class _Unpickler(pickle.Unpickler):
    """Restricted: only the torch rebuild symbols + benign containers."""

    def __init__(self, file, storages: Dict[str, _Storage]):
        super().__init__(file)
        self._storages = storages

    def find_class(self, module: str, name: str) -> Any:  # noqa: D102
        if module == "torch._utils":
            if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                return _rebuild_tensor
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if (module, name) == ("torch._tensor", "_rebuild_from_type_v2"):
            return _rebuild_from_type_v2
        if module == "torch":
            if name.endswith("Storage"):
                return _StorageType(name[:-len("Storage")] or "Byte")
            if name in ("Tensor",):
                return np.ndarray
            # torch.float32-style dtype objects
            try:
                return _np_dtype(name)
            except KeyError:
                pass
        if (module, name) == ("collections", "OrderedDict"):
            return OrderedDict
        if module == "builtins" and name in (
                "dict", "list", "tuple", "set", "int", "float", "str",
                "bytes", "bool", "complex"):
            import builtins

            return getattr(builtins, name)
        raise pickle.UnpicklingError(
            f"torch-free .pt reader: refusing {module}.{name} "
            f"(only tensor/container payloads are supported)")

    def persistent_load(self, pid) -> _Storage:  # noqa: D102
        # ('storage', storage_type, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        _, storage_type, key, _location, _numel = pid
        data = self._storages[str(key)]
        dtype = (storage_type.dtype if isinstance(storage_type, _StorageType)
                 else np.dtype("u1"))
        return _Storage(data, dtype)


def is_zip_pt(path: str) -> bool:
    return zipfile.is_zipfile(path)


def load_pt(path: str) -> Any:
    """Load a zip-format ``.pt`` file without torch. Returns numpy arrays
    in place of tensors (nesting structure preserved)."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if not pkl:
            raise ValueError(
                f"{path}: no data.pkl — pre-1.6 legacy torch format; "
                f"re-save with a modern torch.save or load via torch")
        prefix = pkl[0][: -len("data.pkl")]
        byteorder = prefix + "byteorder"
        if byteorder in names:
            order = zf.read(byteorder).decode().strip()
            if order != "little":
                raise ValueError(f"{path}: {order}-endian .pt unsupported")
        storages = {
            n[len(prefix) + len("data/"):]: zf.read(n)
            for n in names
            if n.startswith(prefix + "data/") and not n.endswith("/")
        }
        up = _Unpickler(io.BytesIO(zf.read(pkl[0])), storages)
        return up.load()
