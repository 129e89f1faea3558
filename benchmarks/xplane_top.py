"""Trace a jitted TimeMamba-B forward and print the top HLO ops by device
time, parsed straight out of the .xplane.pb (no tensorboard needed —
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python + the tsl xplane proto).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python benchmarks/xplane_top.py
"""

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


def profile_fn(fn, *args, iters=3, top=40):
    """Run fn under jax.profiler.trace and aggregate device-side op times."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    logdir = tempfile.mkdtemp(prefix="xplane_")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())
    dur = collections.Counter()
    total = 0
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        stats_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur[name] += ev.duration_ps
                total += ev.duration_ps
    # async spans (DMA start/done pairs, prefetch slices) OVERLAP compute:
    # their durations are wait windows, not exclusive device time — summing
    # them with compute ops double-counts massively (a 352 ms train step
    # reads as ~2 s of "op time"). Rank them separately.
    def is_async(name):
        return any(t in name for t in
                   ("copy-start", "slice-start", "copy-done", "slice-done",
                    "async-start", "async-done", "-start.", "all-reduce-start"))

    sync = collections.Counter(
        {n: p for n, p in dur.items() if not is_async(n)})
    sync_total = sum(sync.values())
    print(f"total device op time: {total/1e9/iters:.3f} ms/iter over "
          f"{iters} iters — SYNC (exclusive compute) "
          f"{sync_total/1e9/iters:.3f} ms/iter; async DMA spans overlap "
          "and are ranked below the compute table")
    for name, ps in sync.most_common(top):
        print(f"  {ps/1e9/iters:9.3f} ms  {100*ps/max(sync_total,1):5.1f}%  "
              f"{name[:110]}")
    print("  --- top async (overlapped DMA wait windows) ---")
    for name, ps in (dur - sync).most_common(8):
        print(f"  {ps/1e9/iters:9.3f} ms  {name[:110]}")
    return dur, total


def main():
    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    B, T, S, D = 8, 16, 224, 768
    model = TimeMamba(img_size=S, patch_size=16, embed_dim=D, depth=12,
                      num_heads=12, num_frames=T, ln_pre=True, output_dim=512,
                      scan_blocks=True, dtype=jnp.bfloat16, impl="pallas")
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, S, S, 3), jnp.bfloat16)
    params = model.init({"params": jax.random.PRNGKey(1)}, x[:1])
    fwd = jax.jit(lambda p, v: model.apply(p, v))
    profile_fn(fwd, params, x)


if __name__ == "__main__":
    main()
