"""Patch-embed lowering A/B: stride-p conv vs im2col reshape+matmul.

Hypothesis (round-7): the train xplane attributes ~30 ms/step to
patch-embed fwd+bwd at TimeMamba-B scale (128 frames of 224², bf16),
while the op's matmul floor is ~0.45 ms (3×29.6 GF at 197 TFLOPS).
A stride-16 `nn.Conv` with C=3 input channels lowers to an XLA
convolution whose input layout (3 channels → padded lanes) starves the
MXU, and whose filter-gradient pass is worse still. The same math as an
im2col: reshape (BT,14,16,14,16,3) → transpose → (BT·196, 768) matmul
against the conv kernel flattened to (p·p·C, D) — all MXU, one cheap
HBM shuffle.

Run on the TPU chip: python benchmarks/r7_patch_embed.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def timeit(f, *args, iters=50, warmup=3):
    for _ in range(warmup):
        _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    BT, H, W, C, p, D = 128, 224, 224, 3, 16, 768
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BT, H, W, C), jnp.bfloat16)
    kern = jax.random.normal(jax.random.PRNGKey(1), (p, p, C, D),
                             jnp.float32) * 0.02

    def conv_form(k, x):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def matmul_form(k, x):
        hh, ww = H // p, W // p
        cols = x.reshape(BT, hh, p, ww, p, C).transpose(0, 1, 3, 2, 4, 5)
        cols = cols.reshape(BT, hh * ww, p * p * C)
        return cols @ k.astype(x.dtype).reshape(p * p * C, D)

    gf = 2 * BT * (H // p) * (W // p) * (p * p * C) * D / 1e9

    for name, f in (("conv", conv_form), ("matmul", matmul_form)):
        fwd = jax.jit(f)
        t = timeit(fwd, kern, x)
        print(f"{name:8s} fwd      {t:7.2f} ms  ({gf / t:6.1f} TF/s)")

        def loss(k, x):
            out = f(k, x)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t = timeit(grad, kern, x)
        print(f"{name:8s} fwd+bwd  {t:7.2f} ms  ({3 * gf / t:6.1f} TF/s)")

    # sanity: identical math (fp32, same kernel)
    a = jax.jit(conv_form)(kern, x.astype(jnp.float32))
    b = jax.jit(matmul_form)(kern, x.astype(jnp.float32))
    b = b.reshape(a.shape)
    print("max |conv-matmul| =", float(jnp.max(jnp.abs(a - b))))


if __name__ == "__main__":
    main()
