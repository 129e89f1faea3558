"""r11: the dual-stream experiment — can MXU and VPU phases overlap?

BASELINE.md's ceiling table is a SERIAL SUM of per-unit floors (MXU matmuls
29.1 ms + scan VPU 23.3 ms + ...). If the chip can execute independent MXU
and VPU work concurrently, the true ceiling is closer to max() than sum(),
and phase-shifting two half-batch streams (stream A's Mamba scan under
stream B's matmuls) would beat the 57 ms "physical floor".

Three levels, cheapest physics first:

1. `probe`  — a Pallas kernel timing K chained-dependency VPU passes, M
   chained MXU dot passes, and both interleaved (the two chains mutually
   independent). t(both) ~ max(vpu, mxu)  => in-kernel dual-issue is real;
   t(both) ~ sum                          => the core serializes units.
2. `fused`  — same question at real shapes: the production selective-scan
   kernel body + an MLP-sized dot in one kernel vs the two ops separately.
3. `model`  — program-level A/B: TimeMamba-B batch 8 single-stream vs
   dual_stream=True (two half-batches interleaved per block inside the
   nn.scan body, so every MXU phase of one stream is program-adjacent to
   an independent VPU phase of the other). Inference AND train step.

Run on the chip: python benchmarks/r11_dual_stream.py [probe|fused|model|all]
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _host(x):
    """Timing barrier: materialize a host scalar (block_until_ready alone
    can return early on the tunneled chip — BASELINE.md methodology)."""
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


# ---------------------------------------------------------------- 1. probe
# VPU pass: x = x*x*0.9 + 0.05 over a (512, 1024) fp32 block — 2 op-slots
# per element (vpu_op_cost.py calibration: ~1.9 T slots/s) ≈ 0.55 us/pass.
# MXU pass: (256, 512) @ (512, 512) bf16 dot ≈ 134 MFLOP ≈ 0.68 us/pass at
# peak. The chains are each self-dependent but mutually independent.

PROBE_ROWS, PROBE_COLS = 512, 1024
MM_M, MM_K = 256, 512
PROBE_BLOCKS = 32


def _probe_kernel(x_ref, a_ref, w_ref, ox_ref, oa_ref, *, k: int, mode: str):
    x = x_ref[...]
    a = a_ref[...]
    w = w_ref[...]
    for _ in range(k):
        if mode in ("vpu", "both"):
            x = x * x * 0.9 + 0.05
        if mode in ("mxu", "both"):
            a = jnp.dot(a, w, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16) * 0.03
    ox_ref[...] = x
    oa_ref[...] = a


def _probe_timed(mode, k, iters=200):
    f = pl.pallas_call(
        functools.partial(_probe_kernel, k=k, mode=mode),
        grid=(PROBE_BLOCKS,),
        in_specs=[
            pl.BlockSpec((PROBE_ROWS, PROBE_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MM_M, MM_K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MM_K, MM_K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((PROBE_ROWS, PROBE_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MM_M, MM_K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((PROBE_ROWS * PROBE_BLOCKS, PROBE_COLS),
                                 jnp.float32),
            jax.ShapeDtypeStruct((MM_M * PROBE_BLOCKS, MM_K), jnp.bfloat16),
        ],
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (PROBE_ROWS * PROBE_BLOCKS, PROBE_COLS),
                          jnp.float32)
    a = jax.random.normal(key, (MM_M * PROBE_BLOCKS, MM_K), jnp.bfloat16)
    w = jax.random.normal(key, (MM_K, MM_K), jnp.bfloat16) * 0.04
    g = jax.jit(lambda x, a: f(x, a, w))
    rx, ra = g(x, a)
    _host(rx)
    t0 = time.perf_counter()
    for _ in range(iters):
        rx, ra = g(rx, ra)   # chained: defeats pipelining/dedup artifacts
    _host(rx)
    return (time.perf_counter() - t0) / iters


def run_probe():
    print("== probe: in-kernel VPU/MXU dual-issue ==", flush=True)
    slopes = {}
    for mode in ("vpu", "mxu", "both"):
        t1, t2 = _probe_timed(mode, 1), _probe_timed(mode, 17)
        slope = (t2 - t1) / 16
        slopes[mode] = slope
        print(f"  {mode:4s}: K=1 {t1*1e3:7.3f} ms  K=17 {t2*1e3:7.3f} ms  "
              f"slope {slope*1e6:8.2f} us/pass", flush=True)
    s, v, m = slopes["both"], slopes["vpu"], slopes["mxu"]
    overlap = (v + m - s) / min(v, m) if min(v, m) > 0 else 0.0
    print(f"  both = {s*1e6:.2f} us vs sum {1e6*(v+m):.2f} / "
          f"max {1e6*max(v, m):.2f} -> overlap efficiency "
          f"{100*overlap:.0f}% (100% = perfect dual-issue, 0% = serial)",
          flush=True)
    return overlap


# ---------------------------------------------------------------- 2. fused
# Real-shape version: one kernel running the selective-scan recurrence body
# (the production kernel's inner loop shape: fused-bidir at the TimeMamba
# adapter shape, half batch) AND an MLP-fc1-sized dot, grid-partitioned the
# same way, vs the two ops in separate kernels.

SC_BT, SC_T, SC_D, SC_N = 784, 8, 768, 16    # adapter shape at T=8 (the
                                             # production frame count is 16;
                                             # T=16 bodies sent the Mosaic
                                             # scheduler into a >35-min
                                             # compile — the dual-issue
                                             # physics question tolerates
                                             # the halved unroll)
SC_TILE = 28                                 # instances per grid step (28
                                             # steps); the T-unrolled fp32
                                             # intermediates blow the 16M
                                             # scoped stack limit at fatter
                                             # tiles even with the raised
                                             # vmem_limit_bytes


def _row1(x, t: int):
    """x[:, t] for static t (Mosaic-safe static slice; Mosaic's lax.scan
    lowering rejects extensive outputs, so the T=16 loop unrolls with
    static slices exactly like the production short kernel)."""
    return jax.lax.squeeze(jax.lax.slice_in_dim(x, t, t + 1, axis=1), (1,))


def _scan_body(u, dt, a_row, b, c):
    """Production recurrence semantics at probe fidelity: per step
    h = h*exp(dt*A) + dt*B*u ; y = sum_n C*h. Shapes per tile:
    u/dt (tile, T, D), a_row (N, D) broadcast, b/c (tile, T, N)."""
    h = jnp.zeros((u.shape[0], SC_N, SC_D), jnp.float32)
    ys = []
    for t in range(SC_T):
        dt_t = _row1(dt, t)                                   # (tile, D)
        decay = jnp.exp(dt_t[:, None, :] * a_row[None])       # (tile, N, D)
        h = h * decay + (dt_t * _row1(u, t))[:, None, :] \
            * _row1(b, t)[:, :, None]
        ys.append(jnp.sum(h * _row1(c, t)[:, :, None], axis=1)[:, None])
    return jnp.concatenate(ys, axis=1)                        # (tile, T, D)


def _fused_kernel(u_ref, dt_ref, a_ref, b_ref, c_ref, xm_ref, wm_ref,
                  oy_ref, om_ref, *, mode: str):
    if mode in ("scan", "both"):
        oy_ref[...] = _scan_body(
            u_ref[...].astype(jnp.float32), dt_ref[...].astype(jnp.float32),
            a_ref[...], b_ref[...].astype(jnp.float32),
            c_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
    else:
        oy_ref[...] = jnp.zeros_like(oy_ref)
    if mode in ("mm", "both"):
        om_ref[...] = jnp.dot(
            xm_ref[...], wm_ref[...],
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    else:
        om_ref[...] = jnp.zeros_like(om_ref)


def _fused_timed(mode, iters=50):
    # matmul side: fc1-like (tokens, 768) @ (768, 3072), tokens split over
    # the same grid as the scan tiles -> per-step (tokens/steps, 768)@(768,3072)
    steps = SC_BT // SC_TILE          # grid length
    mm_rows_total = 12608             # 4 clips * 197 tokens * 16 frames
    mm_rows = mm_rows_total // steps + (mm_rows_total % steps > 0)
    mm_rows = ((mm_rows + 127) // 128) * 128
    D2 = 3072
    f = pl.pallas_call(
        functools.partial(_fused_kernel, mode=mode),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((SC_TILE, SC_T, SC_D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SC_TILE, SC_T, SC_D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SC_N, SC_D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SC_TILE, SC_T, SC_N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SC_TILE, SC_T, SC_N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mm_rows, SC_D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SC_D, D2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SC_TILE, SC_T, SC_D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mm_rows, D2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((SC_BT, SC_T, SC_D), jnp.bfloat16),
            jax.ShapeDtypeStruct((mm_rows * steps, D2), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (SC_BT, SC_T, SC_D), jnp.bfloat16)
    dt = jax.nn.softplus(
        jax.random.normal(key, (SC_BT, SC_T, SC_D), jnp.bfloat16) - 4)
    a_row = -jnp.exp(jax.random.normal(key, (SC_N, SC_D), jnp.float32))
    b = jax.random.normal(key, (SC_BT, SC_T, SC_N), jnp.bfloat16)
    c = jax.random.normal(key, (SC_BT, SC_T, SC_N), jnp.bfloat16)
    xm = jax.random.normal(key, (mm_rows * steps, SC_D), jnp.bfloat16)
    wm = jax.random.normal(key, (SC_D, D2), jnp.bfloat16) * 0.02

    g = jax.jit(lambda u, xm: f(u, dt, a_row, b, c, xm, wm))
    oy, om = g(u, xm)
    _host(oy)
    t0 = time.perf_counter()
    for i in range(iters):
        # chain: feed outputs back as inputs (shapes match for u; om -> xm
        # via slice) to defeat dedup/pipelining
        oy, om = g(oy, om[:, :SC_D] * 0.5 + xm)
    _host(oy)
    return (time.perf_counter() - t0) / iters


def run_fused():
    print("== fused: scan body + fc1-dot in one kernel (half-batch adapter "
          "shape) ==", flush=True)
    ts = {}
    for mode in ("scan", "mm", "both"):
        ts[mode] = _fused_timed(mode)
        print(f"  {mode:4s}: {ts[mode]*1e3:7.3f} ms", flush=True)
    v, m, s = ts["scan"], ts["mm"], ts["both"]
    overlap = (v + m - s) / min(v, m) if min(v, m) > 0 else 0.0
    print(f"  both = {s*1e3:.3f} ms vs sum {1e3*(v+m):.3f} / max "
          f"{1e3*max(v, m):.3f} -> overlap efficiency {100*overlap:.0f}%",
          flush=True)
    return overlap


# ---------------------------------------------------------------- 3. model
def run_model(batch: int = 8, duals=(False, True, 4)):
    print(f"== model: TimeMamba-B b{batch} stream sweep {duals} ==",
          flush=True)
    import optax

    from benchmarks.profile_timemamba import timemamba_flops
    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    frames, size = 16, 224
    x0 = jax.random.normal(
        jax.random.PRNGKey(0), (batch, frames, size, size, 3), jnp.bfloat16)
    x1 = jax.random.normal(
        jax.random.PRNGKey(5), (batch, frames, size, size, 3), jnp.bfloat16)
    y = jax.random.normal(jax.random.PRNGKey(2), (batch, 512), jnp.float32)

    for dual in duals:
        model = TimeMamba(
            img_size=size, patch_size=16, embed_dim=768, depth=12,
            num_heads=12, num_frames=frames, ln_pre=True, output_dim=512,
            impl="pallas", scan_blocks=True, dual_stream=dual,
            dtype=jnp.bfloat16)
        ninit = 4 if dual == 4 else 2  # init batch must divide by streams
        params = model.init({"params": jax.random.PRNGKey(1)}, x0[:ninit])
        fwd = jax.jit(lambda p, x, m=model: m.apply(p, x))
        _host(fwd(params, x0)); _host(fwd(params, x1))
        iters = 40
        t0 = time.perf_counter()
        for i in range(iters):
            out = fwd(params, x0 if i % 2 == 0 else x1)
        _host(out)
        t = (time.perf_counter() - t0) / iters
        print(f"  dual={dual}: inference {t*1e3:.1f} ms = {batch/t:.1f} "
              f"clips/s", flush=True)

        tmodel = TimeMamba(
            img_size=size, patch_size=16, embed_dim=768, depth=12,
            num_heads=12, num_frames=frames, ln_pre=True, output_dim=512,
            impl="pallas", scan_blocks=True, remat=True,
            remat_policy="save_scan", dual_stream=dual, dtype=jnp.bfloat16)
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, x, y, m=tmodel):
            def loss_fn(p):
                out = m.apply(p, x).astype(jnp.float32)
                return jnp.mean((out - y) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        p2, o2, loss = step(params, opt_state, x0, y)
        _host(loss)
        t0 = time.perf_counter()
        for i in range(8):
            p2, o2, loss = step(p2, o2, x0 if i % 2 == 0 else x1, y)
        _host(loss)
        t = (time.perf_counter() - t0) / 8
        flops = 3 * timemamba_flops(batch)
        print(f"  dual={dual}: train step {t*1e3:.0f} ms = {batch/t:.1f} "
              f"clips/s, {100*flops/t/197e12:.1f}% MFU", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("probe", "all"):
        run_probe()
    if which in ("fused", "all"):
        run_fused()
    if which in ("model", "all"):
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        duals = (
            tuple(False if d == "1" else (True if d == "2" else int(d))
                  for d in sys.argv[3].split(","))
            if len(sys.argv) > 3 else (False, True, 4))
        run_model(batch, duals)
