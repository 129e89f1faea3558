"""Torch-free .pt reading (data/pt_reader.py): parity with torch.load on
fixtures written by torch.save, verified with the torch import blocked.

Reference format producer: the TAL suite's per-video feature files
(temporal-action-localization/libs/datasets/ load torch.save-d tensors).
"""

import builtins
import pickle
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from video_mamba_suite_tpu.data.features import FeatureReader
from video_mamba_suite_tpu.data.pt_reader import is_zip_pt, load_pt


def _save(tmp_path, name, obj):
    p = tmp_path / name
    torch.save(obj, str(p))
    return str(p)


import contextlib


@contextlib.contextmanager
def no_torch():
    """Make any `import torch` an ImportError for the enclosed block
    (applied AFTER the torch.save fixture writes, since torch.save itself
    imports torch submodules lazily)."""
    real_import = builtins.__import__

    def guarded(name, *a, **k):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch is blocked for this test")
        return real_import(name, *a, **k)

    builtins.__import__ = guarded
    try:
        yield
    finally:
        builtins.__import__ = real_import


@pytest.mark.parametrize("dtype", [
    torch.float32, torch.float64, torch.float16, torch.bfloat16,
    torch.int64, torch.int32, torch.int16, torch.int8, torch.uint8,
    torch.bool,
])
def test_all_dtypes_roundtrip(tmp_path, dtype):
    t = (torch.arange(24).reshape(2, 3, 4) % 2).to(dtype)
    want = (t.float().numpy() if dtype == torch.bfloat16
            else t.numpy())
    path = _save(tmp_path, f"x_{str(dtype).split('.')[-1]}.pt", t)
    with no_torch():
        assert is_zip_pt(path)
        got = load_pt(path)
    assert got.shape == (2, 3, 4)
    got_cmp = (np.asarray(got, dtype=np.float32)
               if dtype == torch.bfloat16 else got)
    np.testing.assert_array_equal(got_cmp, want)


def test_noncontiguous_and_offset_views(tmp_path):
    base = torch.arange(60, dtype=torch.float32).reshape(3, 4, 5)
    views = {
        "transposed": base.permute(2, 0, 1),
        "strided": base[:, ::2],
        "offset": base[1:],
        "scalar": torch.tensor(7.5),
    }
    path = _save(tmp_path, "views.pt", views)
    with no_torch():
        got = load_pt(path)
    for k, v in views.items():
        np.testing.assert_array_equal(got[k], v.numpy()), k


def test_nested_containers_and_state_dict(tmp_path):
    lin = torch.nn.Linear(4, 3)
    obj = {
        "state": lin.state_dict(),          # OrderedDict of Parameters
        "meta": {"epoch": 3, "lr": 0.1, "name": "run1",
                 "shapes": [(4, 3), (3,)]},
        "arrs": [torch.ones(2, 2), torch.zeros(3)],
    }
    path = _save(tmp_path, "ckpt.pt", obj)
    with no_torch():
        got = load_pt(path)
    np.testing.assert_allclose(got["state"]["weight"],
                               lin.weight.detach().numpy())
    np.testing.assert_allclose(got["state"]["bias"],
                               lin.bias.detach().numpy())
    assert got["meta"] == obj["meta"]
    np.testing.assert_array_equal(got["arrs"][0], np.ones((2, 2)))


def test_feature_reader_pt_without_torch(tmp_path):
    feats = torch.randn(128, 32)
    torch.save(feats, str(tmp_path / "video_001.pt"))
    reader = FeatureReader(str(tmp_path), ext=".pt")
    with no_torch():
        got = reader("video_001")
    np.testing.assert_allclose(got, feats.numpy())


def test_refuses_arbitrary_globals(tmp_path):
    """The restricted unpickler must reject non-tensor payloads instead of
    executing them (os.system-style pickle gadgets)."""
    import zipfile

    evil = pickle.dumps({"f": print})  # any non-allowlisted global
    p = tmp_path / "evil.pt"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("evil/data.pkl", evil)
    with pytest.raises(pickle.UnpicklingError):
        load_pt(str(p))
