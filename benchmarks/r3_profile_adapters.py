"""xplane profile of the 12x temporal-adapter stack (B·n=1568, T=16, D=768):
where do the non-kernel milliseconds go?

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python benchmarks/r3_profile_adapters.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
from flax import linen as nn

from benchmarks.xplane_top import profile_fn
from video_mamba_suite_tpu.models.mamba import MambaVim

D = 768


class AdapterStack(nn.Module):
    @nn.compact
    def __call__(self, h):
        for i in range(12):
            hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln{i}")(h)
            h = h + MambaVim(d_model=D, expand=1, impl="pallas",
                             dtype=jnp.bfloat16, name=f"m{i}")(hn)
        return h


def main():
    ha = jax.random.normal(jax.random.PRNGKey(2), (8 * 196, 16, D),
                           jnp.bfloat16)
    m = AdapterStack()
    p = m.init({"params": jax.random.PRNGKey(1)}, ha[:196])
    fwd = jax.jit(lambda p, v: m.apply(p, v))
    profile_fn(fwd, p, ha, iters=5, top=30)


if __name__ == "__main__":
    main()
