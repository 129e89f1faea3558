"""Round-3 experiment: amortize the nn.scan while-loop carry copies.

Times TimeMamba-B fwd with: fully unrolled blocks (may exceed the remote-
compile service's program-size limit → caught), scan_group 6/4/2, and the
round-2 baseline group=1.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time(f, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    B, T, S, D = 8, 16, 224, 768
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, S, S, 3), jnp.bfloat16)
    base = dict(img_size=S, patch_size=16, embed_dim=D, depth=12,
                num_heads=12, num_frames=T, ln_pre=True, output_dim=512,
                dtype=jnp.bfloat16, impl="pallas")

    variants = [
        ("group=2", dict(scan_blocks=True, scan_group=2)),
        ("group=4", dict(scan_blocks=True, scan_group=4)),
        ("group=6", dict(scan_blocks=True, scan_group=6)),
        ("unrolled", dict(scan_blocks=False)),
    ]
    if os.environ.get("R3_BASELINE"):
        variants.insert(0, ("group=1 (r2 baseline)",
                            dict(scan_blocks=True, scan_group=1)))
    for name, kw in variants:
        try:
            model = TimeMamba(**base, **kw)
            params = model.init({"params": jax.random.PRNGKey(1)}, x[:1])
            f = jax.jit(lambda p, v, m=model: m.apply(p, v))
            t = _time(f, params, x)
            print(f"{name:24s} {t*1e3:8.2f} ms  {B/t:7.1f} clips/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — survive 413s
            print(f"{name:24s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
