"""Mamba LM decode throughput.

Capability match for /root/reference/mamba/benchmarks/
benchmark_generation_mamba_simple.py: time prompt→generation with the cached
state decode loop. Here the whole loop is one compiled lax.scan, so the
measured number is steady-state tokens/sec including sampling.

Usage: python benchmarks/benchmark_generation.py [--d-model 768]
       [--n-layer 12] [--genlen 128] [--batch 8] [--topk 1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--d-model", type=int, default=768)
    p.add_argument("--n-layer", type=int, default=12)
    p.add_argument("--vocab", type=int, default=50277)
    p.add_argument("--promptlen", type=int, default=16)
    p.add_argument("--genlen", type=int, default=128)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--topk", type=int, default=1)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    from video_mamba_suite_tpu.models import MambaLMHeadModel
    from video_mamba_suite_tpu.models.generation import (
        GenerationConfig,
        generate,
    )

    model = MambaLMHeadModel(
        d_model=args.d_model, n_layer=args.n_layer, vocab_size=args.vocab
    )
    ids = jax.random.randint(
        jax.random.PRNGKey(0), (args.batch, args.promptlen), 0, args.vocab
    )
    params = model.init(jax.random.PRNGKey(1), ids)
    cfg = GenerationConfig(
        max_length=args.promptlen + args.genlen, top_k=args.topk
    )

    import numpy as np

    gen = jax.jit(lambda p, i: generate(model, p, i, cfg))
    np.asarray(gen(params, ids))  # compile + sync

    t0 = time.perf_counter()
    for _ in range(args.repeats):
        out = gen(params, ids)
    np.asarray(out)  # host fetch = reliable sync under axon
    dt = (time.perf_counter() - t0) / args.repeats
    total_tokens = args.batch * (args.promptlen + args.genlen)
    print(
        f"prompt {args.promptlen} + gen {args.genlen}, batch {args.batch}: "
        f"{dt * 1e3:.1f} ms/seq-batch, {total_tokens / dt:.0f} tokens/s"
    )


if __name__ == "__main__":
    main()
