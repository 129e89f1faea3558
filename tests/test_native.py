"""Native (C++) components vs their Python oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.ops.native import (
    nms_1d_native,
    selective_scan_cpu,
    soft_nms_1d_native,
    _nms_lib,
    _register_selective_scan_ffi,
)
from video_mamba_suite_tpu.ops import selective_scan_ref
from video_mamba_suite_tpu.tasks.tal.nms import nms_1d, soft_nms_1d

native_nms = pytest.mark.skipif(_nms_lib() is None, reason="no C++ toolchain")


@native_nms
def test_native_nms_matches_numpy():
    rng = np.random.default_rng(0)
    starts = rng.uniform(0, 50, 40)
    segs = np.stack([starts, starts + rng.uniform(1, 20, 40)], 1)
    scores = rng.uniform(0, 1, 40)
    keep_c = nms_1d_native(segs, scores, 0.5)
    keep_py = nms_1d(segs, scores.astype(np.float64), 0.5)
    np.testing.assert_array_equal(np.sort(keep_c), np.sort(keep_py))


@native_nms
def test_native_soft_nms_matches_numpy():
    rng = np.random.default_rng(1)
    starts = rng.uniform(0, 50, 30)
    segs = np.stack([starts, starts + rng.uniform(1, 20, 30)], 1)
    scores = rng.uniform(0.1, 1, 30).astype(np.float64)
    s_c, sc_c, i_c = soft_nms_1d_native(segs, scores, 0.1, 0.5, 0.01, 2)
    s_p, sc_p, i_p = soft_nms_1d(segs, scores, 0.1, 0.5, 0.01, 2)
    np.testing.assert_array_equal(i_c, i_p)
    np.testing.assert_allclose(sc_c, sc_p, rtol=1e-4)


@pytest.mark.skipif(not _register_selective_scan_ffi(),
                    reason="FFI lib unavailable")
def test_native_selective_scan_matches_ref():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    b, l, d, n = 2, 96, 16, 8
    u = jax.random.normal(ks[0], (b, l, d))
    delta = 0.5 * jax.random.uniform(ks[1], (b, l, d))
    A = -0.5 * jax.random.uniform(ks[2], (d, n))
    B = jax.random.normal(ks[3], (b, l, n))
    C = jax.random.normal(ks[4], (b, l, n))
    D = jax.random.normal(ks[5], (d,))
    z = jax.random.normal(ks[6], (b, l, d))
    bias = 0.5 * jax.random.uniform(ks[7], (d,))
    kw = dict(D=D, z=z, delta_bias=bias, delta_softplus=True,
              return_last_state=True)
    out_ref, last_ref = selective_scan_ref(u, delta, A, B, C, **kw)
    out_c, last_c = selective_scan_cpu(u, delta, A, B, C, **kw)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(last_c), np.asarray(last_ref),
                               rtol=1e-4, atol=1e-4)


def test_parallel_file_reader(tmp_path):
    from video_mamba_suite_tpu.ops.native import _ensure_built
    import ctypes

    path = _ensure_built("libfeature_loader.so")
    if path is None:
        pytest.skip("no C++ toolchain")
    lib = ctypes.CDLL(path)
    lib.read_files_parallel.restype = ctypes.c_int64

    datas = [np.arange(i + 4, dtype=np.float32).tobytes() for i in range(5)]
    paths = []
    for i, d in enumerate(datas):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(d)
        paths.append(str(p))
    blob = b"".join(p.encode() + b"\0" for p in paths)
    path_offsets = np.zeros(5, np.int64)
    off = 0
    for i, p in enumerate(paths):
        path_offsets[i] = off
        off += len(p) + 1
    sizes = np.array([len(d) for d in datas], np.int64)
    dst_offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    dst = np.zeros(int(sizes.sum()), np.uint8)
    rc = lib.read_files_parallel(
        blob, path_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(5),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_char)),
        dst_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(0), ctypes.c_int64(3),
    )
    assert rc == 0
    got = np.frombuffer(dst[dst_offsets[2]:dst_offsets[2] + sizes[2]].tobytes(),
                        np.float32)
    np.testing.assert_array_equal(got, np.arange(6, dtype=np.float32))
