"""Component-level timing of TimeMamba-B on the chip: where do the ms go?

Times, separately: full model; the model with the temporal Mamba replaced by
identity (isolating attention+MLP+patch-embed); a standalone stack of the 12
temporal ViM adapters at TimeMamba's adapter shape (B·n=1568, T=16, D=768);
one adapter per scan impl (pallas / assoc). Prints a table with per-clip ms
and derived MFU.

Usage: python benchmarks/profile_timemamba.py [--batch 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _fetch(out):
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def _time(f, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def timemamba_flops(batch, frames=16, size=224, depth=12, d=768, heads=12,
                    mlp_ratio=4.0, d_state=16, with_mamba=True):
    """Analytic fwd FLOPs (2·MACs) for TimeMamba-B."""
    p = 16
    n = (size // p) ** 2                      # 196 patches
    tok_s = n + 1                             # tokens per frame (spatial attn)
    tok = n * frames                          # patch tokens per clip
    fl = 0.0
    # patch embed
    fl += tok * (3 * p * p) * d * 2
    per_block = 0.0
    if with_mamba:
        d_in = d                              # expand=1
        dt_rank = -(-d // 16)
        # in_proj + out_proj + 2×(x_proj+dt_proj) + conv + scan(2 dirs)
        per_block += tok * d * (2 * d_in) * 2
        per_block += tok * d_in * d * 2
        per_block += 2 * (tok * d_in * (dt_rank + 2 * d_state) * 2
                          + tok * dt_rank * d_in * 2)
        per_block += 2 * tok * 4 * d_in * 2              # conv taps
        per_block += 2 * tok * d_in * d_state * 9        # scan arithmetic
    # spatial MHA per frame (tok_s tokens, frames times)
    per_block += frames * tok_s * d * (4 * d) * 2        # qkvo
    per_block += frames * 2 * tok_s * tok_s * d * 2      # scores + av
    # MLP
    per_block += (tok + 1) * 2 * d * int(d * mlp_ratio) * 2
    fl += depth * per_block
    fl += d * 512 * 2                                    # output projection
    return fl * batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from flax import linen as nn

    from video_mamba_suite_tpu.models.mamba import MambaVim
    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    B, T, S, D = args.batch, 16, 224, 768
    peak = 197e12  # v5e bf16 peak FLOP/s
    rows = []

    def run(name, model_fn, x, flops=None):
        model, feed = model_fn
        params = model.init({"params": jax.random.PRNGKey(1)}, *feed(x[:1]))
        f = jax.jit(lambda p, x: model.apply(p, *feed(x)))
        t = _time(f, params, x, iters=args.iters)
        mfu = (flops / t / peak) if flops else float("nan")
        rows.append((name, t * 1e3, B / t, 100 * mfu))
        print(f"{name:34s} {t*1e3:9.2f} ms  {B/t:8.1f} clips/s  "
              f"MFU {100*mfu:5.1f}%", flush=True)

    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, S, S, 3), jnp.bfloat16)

    # 1. full model (pallas scan)
    tm = dict(img_size=S, patch_size=16, embed_dim=D, depth=12, num_heads=12,
              num_frames=T, ln_pre=True, output_dim=512, scan_blocks=True,
              dtype=jnp.bfloat16)
    run("TimeMamba-B full (pallas)",
        (TimeMamba(impl="pallas", **tm), lambda v: (v,)), x,
        timemamba_flops(B))
    run("TimeMamba-B full (assoc)",
        (TimeMamba(impl="assoc", **tm), lambda v: (v,)), x,
        timemamba_flops(B))

    # 2. adapter stack alone: 12 × (LN + MambaVim) at (B·n, T, D)
    class AdapterStack(nn.Module):
        impl: str = "pallas"
        fuse: bool = False

        @nn.compact
        def __call__(self, h):
            for i in range(12):
                hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln{i}")(h)
                h = h + MambaVim(d_model=D, expand=1, impl=self.impl,
                                 fuse_scan=self.fuse, dtype=jnp.bfloat16,
                                 name=f"m{i}")(hn)
            return h

    ha = jax.random.normal(jax.random.PRNGKey(2), (B * 196, T, D), jnp.bfloat16)
    n_tok = B * 196 * T
    dt_rank = 48
    ad_fl = 12 * (n_tok * D * 2 * D * 2 + n_tok * D * D * 2
                  + 2 * (n_tok * D * (dt_rank + 32) * 2 + n_tok * dt_rank * D * 2)
                  + 2 * n_tok * 4 * D * 2 + 2 * n_tok * D * 16 * 9)
    run("12x adapters (pallas)",
        (AdapterStack(impl="pallas"), lambda v: (v,)), ha, ad_fl)
    run("12x adapters (pallas fused-bidir)",
        (AdapterStack(impl="pallas", fuse=True), lambda v: (v,)), ha, ad_fl)
    run("12x adapters (assoc)",
        (AdapterStack(impl="assoc"), lambda v: (v,)), ha, ad_fl)

    # 3. attention+MLP only (mamba off) — via a plain ViT-ish block stack
    class SpatialOnly(nn.Module):
        @nn.compact
        def __call__(self, h):
            # h: (B·T, n+1, D) per-frame tokens
            for i in range(12):
                hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln1_{i}")(h)
                h = h + nn.MultiHeadDotProductAttention(
                    num_heads=12, dtype=jnp.bfloat16, name=f"attn{i}")(hn, hn)
                hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln2_{i}")(h)
                m = nn.Dense(D * 4, dtype=jnp.bfloat16, name=f"fc1_{i}")(hn)
                m = nn.gelu(m, approximate=False)
                h = h + nn.Dense(D, dtype=jnp.bfloat16, name=f"fc2_{i}")(m)
            return h

    hs = jax.random.normal(jax.random.PRNGKey(3), (B * T, 197, D), jnp.bfloat16)
    sp_fl = 12 * (B * T * 197 * D * 4 * D * 2 + B * T * 2 * 197 * 197 * D * 2
                  + B * T * 197 * 2 * D * D * 4 * 2)
    run("12x spatial attn+MLP", (SpatialOnly(), lambda v: (v,)), hs, sp_fl)


if __name__ == "__main__":
    main()
