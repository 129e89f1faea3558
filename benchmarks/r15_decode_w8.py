"""r15: int8 weight-streaming probe + end-to-end w8 decode A/B.

The decode step is weight-streaming-bound (BASELINE.md decode section:
bf16 b8 at 67% of a 0.234 ms floor dominated by ~160 MB of bf16 params).
int8 weights halve the stream — IF the int8→bf16 dequant fuses into the
dot's operand read. If XLA materializes the dequantized weight instead,
traffic becomes read-i8 + write-bf16 + read-bf16 ≈ 2.5× the int8 bytes
and the variant LOSES. This probe measures that directly, plus the w8a8
(int8×int8 MXU dot) alternative:

  probe  — lax.scan over L stacked (d,d) weights (each iteration reads a
           FRESH weight slice = layer streaming), M=8 activations:
             bf16    : y @ w
             w8a16   : y @ (w_i8 * scale)        (dequant-into-dot?)
             w8a8    : quant(y) int8-dot w_i8    (native MXU s8 path)
  decode — end-to-end generate() with offline-quantized params
           (models/quant_decode.py) vs bf16, chained timing.

Run on the chip: python benchmarks/r15_decode_w8.py [probe|decode|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np
from jax import lax

HBM_GBS = 819e9


def _host(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run_probe(m=8, d=768, layers=96, iters=30):
    print(f"== probe: streaming {layers} fresh ({d},{d}) weights, M={m} ==",
          flush=True)
    kw = jax.random.split(jax.random.PRNGKey(0), 3)
    w = 0.02 * jax.random.normal(kw[0], (layers, d, d), jnp.float32)
    w_bf = w.astype(jnp.bfloat16)
    scale = jnp.max(jnp.abs(w), axis=1) / 127.0          # (L, d) per-out-col
    w_i8 = jnp.round(w / scale[:, None]).astype(jnp.int8)
    y0 = jax.random.normal(kw[1], (m, d), jnp.bfloat16)

    def mk(variant):
        def body(y, ws):
            if variant == "bf16":
                y = y @ ws[0]
            elif variant == "w8a16":
                wi, s = ws
                y = y @ (wi.astype(jnp.bfloat16) * s.astype(jnp.bfloat16))
            else:  # w8a8
                wi, s = ws
                ascale = jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0
                yi = jnp.round(y / ascale).astype(jnp.int8)
                acc = lax.dot_general(
                    yi, wi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = (acc.astype(jnp.float32) * ascale
                     * s[None]).astype(jnp.bfloat16)
            # keep magnitudes bounded so the chain never overflows
            return y / (1.0 + jnp.max(jnp.abs(y)) / 64.0), None

        if variant == "bf16":
            xs = (w_bf,)
        else:
            xs = (w_i8, scale)

        @jax.jit
        def run(y):
            out, _ = lax.scan(body, y, xs)
            return out

        return run

    bytes_per = {
        "bf16": layers * d * d * 2,
        "w8a16": layers * d * (d + 4),
        "w8a8": layers * d * (d + 4),
    }
    for variant in ("bf16", "w8a16", "w8a8"):
        f = mk(variant)
        y = f(y0)
        _host(y)
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(y)          # chained: y feeds back
        _host(y)
        t = (time.perf_counter() - t0) / iters
        fl = bytes_per[variant] / HBM_GBS * 1e3
        print(f"  {variant:6s}: {t*1e3:7.3f} ms  (weight-stream floor "
              f"{fl:.3f} ms, {100*fl/t/1e3:3.0f}% of floor)", flush=True)


def run_decode(d_model=768, n_layer=12, vocab=50277, promptlen=16,
               genlen=128, batch=8, repeats=5):
    from video_mamba_suite_tpu.models import MambaLMHeadModel
    from video_mamba_suite_tpu.models.generation import (
        GenerationConfig,
        generate,
    )
    from video_mamba_suite_tpu.models.quant_decode import (
        quantize_lm_for_decode,
    )

    print(f"== decode: Mamba-{d_model} x{n_layer} b{batch}, "
          f"prompt {promptlen} + gen {genlen} ==", flush=True)
    model = MambaLMHeadModel(d_model=d_model, n_layer=n_layer,
                             vocab_size=vocab)
    ids = jax.random.randint(jax.random.PRNGKey(0), (batch, promptlen),
                             0, vocab)
    params = model.init(jax.random.PRNGKey(1), ids)
    cfg = GenerationConfig(max_length=promptlen + genlen, top_k=1)
    steps = promptlen + genlen

    p_bf = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                        if x.dtype == jnp.float32 else x, params)
    p_w8 = quantize_lm_for_decode(params)

    outs = {}
    for tag, p in (("bf16", p_bf), ("w8", p_w8)):
        pbytes = sum(l.size * l.dtype.itemsize
                     for l in jax.tree_util.tree_leaves(p))
        gen = jax.jit(lambda pp, ii: generate(model, pp, ii, cfg))
        out = gen(p, ids)
        _host(out)
        cur = ids
        t0 = time.perf_counter()
        for _ in range(repeats):
            cur = out[:, -promptlen:] % vocab    # chained
            out = gen(p, cur)
        _host(out)
        dt = (time.perf_counter() - t0) / repeats
        floor = pbytes / HBM_GBS * 1e3
        print(f"  {tag:4s}: {batch*steps/dt:8.0f} tok/s, "
              f"{dt/steps*1e3:6.3f} ms/step (streamed {pbytes/1e6:6.1f} MB "
              f"-> floor {floor:.3f} ms, {100*floor/(dt/steps)/1e3:3.0f}% "
              f"of floor)", flush=True)
        outs[tag] = np.asarray(gen(p, ids))
    agree = float((outs["bf16"] == outs["w8"]).mean())
    print(f"  w8-vs-bf16 greedy token agreement (random-init model — see "
          f"r12's caveat): {100*agree:.1f}%", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("probe", "all"):
        run_probe()
    if which in ("decode", "all"):
        run_decode()
