"""Probe raw VPU op costs on the chip: exp vs mul vs fused scan step shapes.

Measures, via tiny Pallas kernels that loop K times over a VMEM-resident
block, the per-element cost of: multiply-add, exp (fp32), exp (bf16 in/out),
and a full short-scan step body. Grounds kernel-design choices (is the short
scan exp-bound?) in measured numbers rather than guesses.

Usage: python benchmarks/probe_vpu.py
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fetch(out):
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def _time(f, *args, iters=30, warmup=3):
    for _ in range(warmup):
        _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def _loop_kernel(x_ref, o_ref, *, k: int, op: str):
    x = x_ref[...]
    acc = x
    for _ in range(k):
        if op == "mul":
            acc = acc * x + x
        elif op == "exp":
            acc = jnp.exp(acc * 1e-6)  # keep values bounded
        elif op == "exp_bf16":
            acc = jnp.exp((acc * 1e-6).astype(jnp.bfloat16)).astype(jnp.float32)
        elif op == "sigmoid":
            acc = jax.nn.sigmoid(acc)
        elif op == "tanh":
            acc = jnp.tanh(acc)
        else:
            raise ValueError(op)
    o_ref[...] = acc


def probe(op: str, shape=(32, 16, 256), k: int = 64, grid: int = 64):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    kern = functools.partial(_loop_kernel, k=k, op=op)
    f = jax.jit(
        lambda x: pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x)
    )
    t = _time(f, x)
    n_elem = 1
    for s in shape:
        n_elem *= s
    total_ops = n_elem * k * grid
    print(f"{op:10s} shape={shape} k={k} grid={grid}: {t*1e3:7.3f} ms "
          f"→ {total_ops / t / 1e12:6.2f} Tops/s", flush=True)
    return total_ops / t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=str, default="32,16,256")
    args = ap.parse_args()
    shape = tuple(map(int, args.shape.split(",")))
    r_mul = probe("mul", shape)       # 2 flops per elem per k
    r_exp = probe("exp", shape)
    probe("exp_bf16", shape)
    probe("sigmoid", shape)
    print(f"[probe] exp costs ~{2 * r_mul / r_exp:.1f} mul-add-equivalents",
          flush=True)


if __name__ == "__main__":
    main()
