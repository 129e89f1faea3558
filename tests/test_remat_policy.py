"""Targeted remat policy (save_scan): gradient equivalence.

jax.checkpoint policies must be value-preserving; this pins that the
named-checkpoint plumbing (ops/mamba_inner.py checkpoint_name +
TimeMamba remat_policy='save_scan') changes scheduling only, not math.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from video_mamba_suite_tpu.models.timemamba import TimeMamba


def _grads(policy):
    kw = dict(img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
              num_frames=4, ln_pre=True, output_dim=32, scan_blocks=True,
              remat=True, remat_policy=policy, impl="ref")
    m = TimeMamba(**kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
    p = m.init({"params": jax.random.PRNGKey(1)}, x)
    return jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(p)


def test_save_scan_grads_match_whole_block():
    ga = _grads(None)
    gb = _grads("save_scan")
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        # identical math, different schedule: only fp32 reassociation noise
        scale = float(jnp.abs(a).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / scale < 1e-5
