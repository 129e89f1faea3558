"""Benchmark: Pallas chunked selective scan throughput on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured op is the innermost hot op of every suite model (SURVEY.md §3):
a full fused Mamba-scale selective scan (delta-softplus + discretize + scan +
C-projection + D-skip + SiLU(z) gating) at ActionMamba-like shapes.
`vs_baseline` is the speedup over the pure-XLA associative-scan fallback on
the same chip — the best non-Pallas TPU implementation (the reference's CUDA
kernel throughput is unpublished, SURVEY.md §6).
"""

import json
import time

import jax
import jax.numpy as jnp


def _make_inputs(b, l, d, n, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    return dict(
        u=jax.random.normal(ks[0], (b, l, d), dtype),
        delta=0.5 * jax.random.uniform(ks[1], (b, l, d), dtype),
        A=-0.5 * jax.random.uniform(ks[2], (d, n), jnp.float32),
        B=jax.random.normal(ks[3], (b, l, n), dtype),
        C=jax.random.normal(ks[4], (b, l, n), dtype),
        D=jax.random.normal(ks[5], (d,), jnp.float32),
        z=jax.random.normal(ks[6], (b, l, d), dtype),
        bias=0.5 * jax.random.uniform(ks[7], (d,), jnp.float32),
    )


def _time_fn(f, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from video_mamba_suite_tpu.ops.selective_scan import selective_scan_assoc
    from video_mamba_suite_tpu.ops.selective_scan_pallas import selective_scan_pallas

    # ActionMamba-scale: batch 8, seqlen 2048, d_inner 1024, d_state 16
    b, l, d, n = 8, 2048, 1024, 16
    inp = _make_inputs(b, l, d, n)
    args = (inp["u"], inp["delta"], inp["A"], inp["B"], inp["C"])
    kw = dict(D=inp["D"], z=inp["z"], delta_bias=inp["bias"], delta_softplus=True)

    on_tpu = jax.default_backend() == "tpu"
    pallas_fn = jax.jit(lambda *a: selective_scan_pallas(*a, **kw))
    assoc_fn = jax.jit(lambda *a: selective_scan_assoc(*a, **kw))

    if not on_tpu:
        # CPU fallback: bench the associative-scan path only (tiny shapes)
        b2, l2 = 2, 256
        inp = _make_inputs(b2, l2, d, n)
        args = (inp["u"], inp["delta"], inp["A"], inp["B"], inp["C"])
        kw2 = dict(D=inp["D"], z=inp["z"], delta_bias=inp["bias"], delta_softplus=True)
        assoc_fn = jax.jit(lambda *a: selective_scan_assoc(*a, **kw2))
        t = _time_fn(assoc_fn, *args, iters=5)
        print(json.dumps({
            "metric": "selective_scan_assoc_tokens_per_sec_cpu",
            "value": round(b2 * l2 / t, 1),
            "unit": "tokens/s",
            "vs_baseline": 1.0,
        }))
        return

    t_pallas = _time_fn(pallas_fn, *args)
    t_assoc = _time_fn(assoc_fn, *args)
    tokens_per_sec = b * l / t_pallas
    print(json.dumps({
        "metric": "selective_scan_pallas_tokens_per_sec",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s (b8 l2048 d1024 n16, fused gate+skip)",
        "vs_baseline": round(t_assoc / t_pallas, 3),
    }))


if __name__ == "__main__":
    main()
