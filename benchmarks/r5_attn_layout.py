"""r5: can the spatial-attention sandwich keep the (B, n, t, D) layout?

The xplane profile of the TimeMamba-B fwd shows ~4 ms/iter of pure layout
copies (copy.96-99, (128,197,768) {2,0,1}<->{1,2,0}) plus transpose fusions
(fusion.286) around the spatial attention: the block transposes
(B, n, t, D) -> (B·t, 1+n, D) for attention and back. Variant B below runs
the SAME math with attention einsums batched over (b, t, h) directly on the
patch-major tensor — no reshape/transpose on the data path, XLA's dot
layout assignment absorbs the layout work.

Run on the chip: python benchmarks/r5_attn_layout.py
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

B, N, T, D, H = 8, 196, 16, 768, 12
DH = D // H
LAYERS = 12
BF = jnp.bfloat16


def _fetch(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def time_alt(f, a0, a1, iters=100):
    _fetch(f(*a0)); _fetch(f(*a1))
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(*(a0 if i % 2 == 0 else a1))
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def make_params(key):
    ks = jax.random.split(key, 6)
    s = 0.02
    return dict(
        ln_w=jnp.ones((D,), jnp.float32), ln_b=jnp.zeros((D,), jnp.float32),
        qkv_w=s * jax.random.normal(ks[0], (D, 3 * D), jnp.float32),
        qkv_b=jnp.zeros((3 * D,), jnp.float32),
        out_w=s * jax.random.normal(ks[1], (D, D), jnp.float32),
        out_b=jnp.zeros((D,), jnp.float32),
    )


def ln(x, w, b):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * w + b).astype(x.dtype)


def sandwich_a(p, cls, tr):
    """Current SpaceTimeBlock path: flatten to (B·t, 1+n, D)."""
    cls_rep = jnp.broadcast_to(cls.astype(tr.dtype)[:, None],
                               (B, T, 1, D)).reshape(B * T, 1, D)
    xs = tr.transpose(0, 2, 1, 3).reshape(B * T, N, D)
    xs = jnp.concatenate([cls_rep, xs], axis=1)
    xs = ln(xs, p["ln_w"], p["ln_b"])
    qkv = (xs @ p["qkv_w"].astype(xs.dtype)) + p["qkv_b"].astype(xs.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B * T, N + 1, H, DH)
    k = k.reshape(B * T, N + 1, H, DH)
    v = v.reshape(B * T, N + 1, H, DH)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (1.0 / math.sqrt(DH))
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B * T, N + 1, D)
    out = (out @ p["out_w"].astype(out.dtype)) + p["out_b"].astype(out.dtype)
    cls_out = out[:, 0].reshape(B, T, D).mean(axis=1, keepdims=True)
    patch_out = out[:, 1:].reshape(B, T, N, D).transpose(0, 2, 1, 3)
    return cls_out, patch_out


def sandwich_b(p, cls, tr):
    """Layout-preserving: attention batched over (b, t, h) on (B,n,t,D)."""
    cls4 = jnp.broadcast_to(cls.astype(tr.dtype)[:, :, None], (B, 1, T, D))
    xs = jnp.concatenate([cls4, tr], axis=1)          # (B, 1+n, t, D)
    xs = ln(xs, p["ln_w"], p["ln_b"])
    qkv = (xs @ p["qkv_w"].astype(xs.dtype)) + p["qkv_b"].astype(xs.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, N + 1, T, H, DH)
    k = k.reshape(B, N + 1, T, H, DH)
    v = v.reshape(B, N + 1, T, H, DH)
    scores = jnp.einsum("bqthd,bkthd->bthqk", q, k) * (1.0 / math.sqrt(DH))
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bthqk,bkthd->bqthd", w, v).reshape(B, N + 1, T, D)
    out = (out @ p["out_w"].astype(out.dtype)) + p["out_b"].astype(out.dtype)
    cls_out = out[:, 0].mean(axis=1)[:, None]          # (B, 1, D)
    patch_out = out[:, 1:]                             # (B, n, t, D) already
    return cls_out, patch_out


def stack(fn, p, cls, tr):
    """12 chained layers so inter-layer layout choices are realistic."""
    for _ in range(LAYERS):
        c, o = fn(p, cls, tr)
        cls = cls + c.astype(cls.dtype)
        tr = tr + o
    return cls, tr


def main():
    key = jax.random.PRNGKey(0)
    p = make_params(key)
    args0 = (jax.random.normal(jax.random.PRNGKey(1), (B, 1, D), BF),
             jax.random.normal(jax.random.PRNGKey(2), (B, N, T, D), BF))
    args1 = (jax.random.normal(jax.random.PRNGKey(3), (B, 1, D), BF),
             jax.random.normal(jax.random.PRNGKey(4), (B, N, T, D), BF))

    fa = jax.jit(lambda c, t: stack(sandwich_a, p, c, t))
    fb = jax.jit(lambda c, t: stack(sandwich_b, p, c, t))

    # numerical parity first
    ca, ta = fa(*args0)
    cb, tb = fb(*args0)
    err_c = float(jnp.max(jnp.abs(ca.astype(jnp.float32) - cb.astype(jnp.float32))))
    err_t = float(jnp.max(jnp.abs(ta.astype(jnp.float32) - tb.astype(jnp.float32))))
    print(f"parity: cls {err_c:.2e} patches {err_t:.2e}")

    t_a = time_alt(fa, args0, args1)
    t_b = time_alt(fb, args0, args1)
    print(f"A (flattened, current): {t_a*1e3:.2f} ms / {LAYERS} layers "
          f"({t_a/LAYERS*1e3:.3f} ms/layer)")
    print(f"B (layout-preserving):  {t_b*1e3:.2f} ms / {LAYERS} layers "
          f"({t_b/LAYERS*1e3:.3f} ms/layer)")
    print(f"B/A = {t_b/t_a:.3f}")


if __name__ == "__main__":
    main()
