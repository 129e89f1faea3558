"""Capture a jax.profiler trace of a model forward on the chip and print the
per-op time budget — no TensorBoard needed (parses the xplane.pb directly
via TF's bundled proto; found the fp32-residual-stream bug that cost
TimeMamba ~20 ms/fwd).

Usage: python benchmarks/trace_model.py [--model timemamba|vivim] [--top 25]
"""

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np


def build(model_name: str):
    if model_name == "timemamba":
        from video_mamba_suite_tpu.models.timemamba import TimeMamba

        model = TimeMamba(img_size=224, patch_size=16, embed_dim=768,
                          depth=12, num_heads=12, num_frames=16, ln_pre=True,
                          output_dim=512, impl="pallas", scan_blocks=True,
                          dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 224, 224, 3),
                              jnp.bfloat16)
    elif model_name == "vivim":
        from video_mamba_suite_tpu.models.vivim import ViViM

        model = ViViM(img_size=224, patch_size=16, num_frames=16, depth=24,
                      embed_dim=192, num_classes=400, scan_blocks=True,
                      impl="pallas")
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 224, 224, 3),
                              jnp.bfloat16)
    else:
        raise SystemExit(f"unknown model {model_name}")
    params = model.init({"params": jax.random.PRNGKey(1)}, x[:1])
    return jax.jit(lambda p, v: model.apply(p, v)), params, x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="timemamba")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    fwd, params, x = build(args.model)
    for _ in range(3):
        np.asarray(fwd(params, x).ravel()[0])

    logdir = tempfile.mkdtemp(prefix="trace_")
    with jax.profiler.trace(logdir):
        for _ in range(args.iters):
            out = fwd(params, x)
        np.asarray(out.ravel()[0])

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(paths[-1], "rb").read())
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        evmeta = {k: v.name for k, v in plane.event_metadata.items()}
        agg = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                agg[evmeta.get(ev.metadata_id, "?")] += ev.duration_ps
        print(f"== {plane.name} (per-iter ms; NB async copy/slice-start "
              f"durations span until done — they overlap compute)")
        for name, ps in agg.most_common(args.top):
            print(f"  {ps/1e9/args.iters:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
