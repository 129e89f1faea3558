"""Benchmark on the TPU chip. Prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}.

Primary metric (BASELINE.json north star): TimeMamba-B Kinetics-400-style
inference clips/sec/chip (16 frames, 224², bf16) — the flagship video
encoder running its Mamba temporal adapters through the Pallas scan kernels.

`vs_baseline` is clips/s divided by a DOCUMENTED A100 estimate (the
reference publishes no kernel/throughput numbers, SURVEY.md §6):
TimeMamba-B fwd ≈ 0.72 TFLOP/clip (counted analytically in
benchmarks/profile_timemamba.py: ViT-B/16 ≈ 35 GF/frame × 16 frames ≈
560 GF + 12 ViM expand=1 temporal adapters ≈ 155 GF); an A100-SXM at
312 TFLOPS bf16 running a ViT-class encoder at a typical 35–40% inference
MFU ⇒ ~165 clips/s. vs_baseline = 1.0 therefore means true A100 parity —
see BASELINE.md:30-33.

Stderr extras (tracking, not part of the JSON contract): achieved MFU on
the v5e chip (197 TFLOPS bf16 peak), the assoc-path speedup, and the
selective-scan microbench with its HBM-roofline fraction.
"""

import json
import sys
import time

import jax

# Persistent compilation cache: the axon PJRT supports serialized
# executables, so repeat benches skip the multi-minute remote compiles.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Regression gates (VERDICT r4 weak-#4): every chip surface asserts a minimum
# against its round-4 BENCH value, with floors slack enough for the DOCUMENTED
# tunnel-load variance (scan has read 72% of its healthy value under load;
# clips/s swings ±5%; CLI trajectories are deterministic converged metrics so
# their floors are tight). A regression (or a trajectory that stops
# converging, or a print-format drift that parses as nan) flips the process
# exit code to 1 — the driver's BENCH_r*.json records rc — while the primary
# JSON line still prints for tracking.
_GATE_RESULTS = []  # (name, value, lo, hi, ok)


def _gate(name, value, lo=None, hi=None):
    """Record a floor/ceiling check. nan (a parse failure upstream) fails."""
    import math

    ok = (value is not None and not math.isnan(value)
          and (lo is None or value >= lo) and (hi is None or value <= hi))
    _GATE_RESULTS.append((name, value, lo, hi, bool(ok)))
    return ok


# every gate that must have been recorded by the end of a full TPU bench —
# a section that died in _safe() and never gated counts as a failure
_EXPECTED_GATES = (
    "scan_mtok_s", "train_step_ms", "decode_tok_s", "tal_step_ms",
    "long_mtok_s", "vtg_r1_05", "vtg_map_avg", "mir_avg_map", "tas_f1_50",
    "cap_cider", "cap_meteor", "ant_mean_ap", "rec_top1", "clips_per_sec",
)


def gate_summary(expected=_EXPECTED_GATES):
    """Print per-gate lines; return process exit code (0 ok, 1 regression)."""
    seen = {r[0] for r in _GATE_RESULTS}
    failures = [r for r in _GATE_RESULTS if not r[4]]
    for name, value, lo, hi, ok in _GATE_RESULTS:
        bound = " ".join(
            ([f">={lo:g}"] if lo is not None else [])
            + ([f"<={hi:g}"] if hi is not None else []))
        print(f"[gate] {'PASS' if ok else 'FAIL'} {name} = "
              f"{value if value is None else round(value, 3)} (want {bound})",
              file=sys.stderr)
    missing = [n for n in expected if n not in seen]
    for n in missing:
        print(f"[gate] FAIL {n} NOT RECORDED (section crashed or was "
              f"skipped)", file=sys.stderr)
    n_bad = len(failures) + len(missing)
    print(f"[gate] {len(_GATE_RESULTS) - len(failures)}/"
          f"{len(_GATE_RESULTS)} recorded gates pass"
          + (f", {n_bad} FAILURE(S) -> rc=1" if n_bad else " -> rc=0"),
          file=sys.stderr)
    return 1 if n_bad else 0


def _fetch(out):
    """Force completion with a host fetch — jax.block_until_ready has been
    observed NOT to block under the tunneled axon platform for large
    outputs; transferring a scalar is a reliable sync point."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def _time_fn(f, *args, iters=10, warmup=2):
    for _ in range(warmup):
        _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def bench_timemamba(impl: str, batch: int = 8, frames: int = 16,
                    size: int = 224, iters: int = 20,
                    dual_stream=4):
    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    model = TimeMamba(
        img_size=size, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        num_frames=frames, ln_pre=True, output_dim=512, impl=impl,
        scan_blocks=True,  # keep the HLO O(1) in depth (remote-compile limit)
        dual_stream=dual_stream,  # phase-shifted 4-stream schedule: each
        # stream's VPU scan overlaps the others' MXU matmuls — measured
        # 80.1 (1-stream) → 77.2 (2) → 74.8 ms (4) on the chip
        # (benchmarks/r11_dual_stream.py model sweep, /tmp/r11_model.log
        # round 5); numerically identical to single-stream (1e-6 parity)
        dtype=jnp.bfloat16,  # true bf16 matmuls (params stay fp32)
    )
    x = jax.random.normal(
        jax.random.PRNGKey(0), (batch, frames, size, size, 3), jnp.bfloat16
    )
    params = model.init({"params": jax.random.PRNGKey(1)}, x[:1])

    # params must be ARGUMENTS: closed-over arrays become HLO constants and
    # the axon remote-compile service rejects the oversized program body
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    t = _time_fn(fwd, params, x, iters=iters)
    return batch / t  # clips/sec


def bench_scan():
    from video_mamba_suite_tpu.ops.selective_scan import selective_scan_assoc
    from video_mamba_suite_tpu.ops.selective_scan_pallas import (
        selective_scan_pallas,
    )

    b, l, d, n = 8, 2048, 1024, 16
    bf = jnp.bfloat16  # the dtype the models actually feed the kernel

    def mkargs(seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 8)
        args = (
            jax.random.normal(ks[0], (b, l, d), bf),
            0.5 * jax.random.uniform(ks[1], (b, l, d), bf),
            -0.5 * jax.random.uniform(ks[2], (d, n)),
            jax.random.normal(ks[3], (b, l, n), bf),
            jax.random.normal(ks[4], (b, l, n), bf),
        )
        kw = dict(
            D=jax.random.normal(ks[5], (d,)),
            z=jax.random.normal(ks[6], (b, l, d), bf),
            delta_bias=0.5 * jax.random.uniform(ks[7], (d,)),
            delta_softplus=True,
        )
        return args, kw

    # ms-scale kernels need MANY iters (the tunneled axon dispatch adds a
    # fixed ~40 ms sync per timing loop) AND alternating input sets:
    # loops of repeated identical dispatches measured with run-to-run
    # swings of ±40%; 200 iters over two arg sets reproduces to ±2%.
    (args0, kw), (args1, _) = mkargs(0), mkargs(1)

    def time_alternating(f, iters):
        _fetch(f(*args0))
        _fetch(f(*args1))
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(*(args0 if i % 2 == 0 else args1))
        _fetch(out)
        return (time.perf_counter() - t0) / iters

    t_p = time_alternating(
        jax.jit(lambda *a: selective_scan_pallas(*a, **kw)), 200)
    t_a = time_alternating(
        jax.jit(lambda *a: selective_scan_assoc(*a, **kw)), 20)
    # HBM roofline: bf16 u/dt/z in + out (4·b·l·d·2B), B/C (2·b·l·n·2B);
    # the inference fwd writes no chunk-state checkpoints. v5e ≈ 819 GB/s.
    bytes_moved = (4 * b * l * d + 2 * b * l * n) * 2
    t_hbm = bytes_moved / 819e9
    # VPU (compute) roofline, calibrated on this chip by
    # benchmarks/vpu_op_cost.py: sustained elementwise throughput ≈ 1.9 T
    # op-slots/s (≈ 2048 lanes × 940 MHz) and exp ≈ 1-2 slots (hardware
    # transcendental path — NOT a polynomial expansion). The recurrence
    # does ~6 slots per (b·l·n·d) state element: dt·A mul, exp, B·dtu
    # mul, state FMA, C-reduce FMA, + amortized dtu/mask/gate shares.
    # For this op the COMPUTE roofline, not HBM, is binding: each streamed
    # (b,l,d) element (~10 bytes across u/dt/z/out) carries n·6 ≈ 96 VPU
    # ops — an arithmetic intensity of ~9.6 op/B against the machine
    # balance of 1.9T/819GB ≈ 2.3 op/B, i.e. the compute floor is ~5x the
    # streaming time. Measured: dtile 256/512/1024 and decay-variant
    # rewrites all plateau within ±8% of this floor (r3_exp9).
    t_vpu = b * l * n * d * 6 / 1.9e12
    t_roof = max(t_hbm, t_vpu)
    print(
        f"[bench] selective_scan pallas (b{b} l{l} d{d} n{n} bf16): "
        f"{b * l / t_p / 1e6:.2f} Mtok/s ({t_a / t_p:.2f}x vs assoc, "
        f"{100 * t_roof / t_p:.0f}% of roofline — "
        f"{'VPU' if t_vpu > t_hbm else 'HBM'}-bound: "
        f"vpu {t_vpu*1e3:.2f} ms vs hbm {t_hbm*1e3:.2f} ms)",
        file=sys.stderr,
    )
    # round-4 healthy point 17.47 Mtok/s; documented loaded-tunnel low 12.6
    _gate("scan_mtok_s", b * l / t_p / 1e6, lo=12.0)


def bench_train_step(batch: int = 8, frames: int = 16, size: int = 224,
                     iters: int = 8):
    """Flagship TRAINING-step throughput (stderr tracking metric, VERDICT r2
    next-#8): TimeMamba-B fwd+bwd+adamw with remat under the bf16 policy —
    the EK100-finetune-shaped hot loop. MFU counts bwd as 2× fwd FLOPs."""
    import optax

    from benchmarks.profile_timemamba import timemamba_flops
    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    model = TimeMamba(
        img_size=size, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        num_frames=frames, ln_pre=True, output_dim=512, impl="pallas",
        scan_blocks=True, remat=True, remat_policy="save_scan",
        dual_stream=4,  # phase-shifted 4-stream schedule: 345 (1-stream) →
        # 323 (2) → 308 ms/step (4) measured, 25.3 → 28.4% MFU
        # (r11_dual_stream model sweep — each stream's remat-recompute +
        # scan-bwd (VPU) overlaps the other streams' matmul-bwd (MXU))
        dtype=jnp.bfloat16,  # save_scan: keep scan outputs across the remat
        # boundary (0.46 GB) so the bwd skips the fwd-scan recompute —
        # measured 371 → 356 ms/step vs whole-block remat (round 4)
    )
    x = jax.random.normal(
        jax.random.PRNGKey(0), (batch, frames, size, size, 3), jnp.bfloat16)
    y = jax.random.normal(jax.random.PRNGKey(2), (batch, 512), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(1)}, x[:1])
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            out = model.apply(p, x).astype(jnp.float32)
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # warmup (compile) + timed loop; state threading keeps it honest
    params, opt_state, loss = step(params, opt_state, x, y)
    _fetch(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, x, y)
    _fetch(loss)
    t = (time.perf_counter() - t0) / iters
    flops = 3 * timemamba_flops(batch)  # fwd + ~2x fwd for bwd
    print(
        f"[bench] TimeMamba-B train step: {t*1e3:.0f} ms = "
        f"{batch/t:.1f} clips/s/chip, {100*flops/t/197e12:.1f}% MFU "
        f"(fwd+bwd+adamw, remat, bf16)",
        file=sys.stderr,
    )
    _gate("train_step_ms", t * 1e3, hi=450.0)  # round-4: 345 ms


def bench_decode(batch: int = 8, promptlen: int = 16, genlen: int = 128,
                 d_model: int = 768, n_layer: int = 12,
                 vocab: int = 50277, repeats: int = 3):
    """Mamba LM decode throughput (stderr tracking, VERDICT r3 next-#7):
    the jitted lax.scan decode loop with cached (conv, ssm) states —
    the benchmark_generation_mamba_simple.py capability on TPU. Tracked
    round-over-round alongside the vision metrics."""
    from video_mamba_suite_tpu.models import MambaLMHeadModel
    from video_mamba_suite_tpu.models.generation import (
        GenerationConfig,
        generate,
    )

    model = MambaLMHeadModel(d_model=d_model, n_layer=n_layer,
                             vocab_size=vocab)
    ids = jax.random.randint(
        jax.random.PRNGKey(0), (batch, promptlen), 0, vocab)
    params = model.init(jax.random.PRNGKey(1), ids)
    # bf16 weights: the protocol-comparable point (the reference's
    # benchmark_generation_mamba_simple.py runs fp16 weights on GPU), and
    # the decode step is weight-streaming-bound so fp32 doubles ms/step.
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    cfg = GenerationConfig(max_length=promptlen + genlen, top_k=1)
    gen = jax.jit(lambda p, i: generate(model, p, i, cfg))
    out = gen(params, ids)
    _fetch(out)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(repeats):
        # chain each call on the previous output: identical-dispatch loops
        # read BELOW the HBM floor on the tunneled chip (the round-4 25.9k
        # tok/s point was this dedup artifact — BASELINE.md decode section)
        ids = out[:, -promptlen:] % vocab
        out = gen(params, ids)
    _fetch(out)
    dt = (time.perf_counter() - t0) / repeats
    toks = batch * (promptlen + genlen)
    print(
        f"[bench] Mamba-{d_model} LM decode (b{batch} prompt{promptlen}"
        f"+gen{genlen}, greedy, bf16 weights, chained): {toks / dt:.0f} "
        f"tok/s, {dt / (promptlen + genlen) * 1e3:.2f} ms/step",
        file=sys.stderr,
    )
    # round-5 honest point: 22.8k tok/s (0.351 ms/step, 67% of the
    # weight-streaming floor — benchmarks/r12_decode.py)
    _gate("decode_tok_s", toks / dt, lo=17000.0)

    # int8 serving mode: offline-quantized weights halve the streamed
    # bytes (models/quant_decode.py). Chip point 60.6k tok/s, 0.132
    # ms/step = 80% of ITS floor — 3.0x the bf16 arm and past the bf16
    # arm's theoretical floor (benchmarks/r15_decode_w8.py).
    from video_mamba_suite_tpu.models.quant_decode import (
        quantize_lm_for_decode,
    )

    p_w8 = quantize_lm_for_decode(
        jax.tree.map(lambda x: x.astype(jnp.float32)
                     if x.dtype == jnp.bfloat16 else x, params))
    gen8 = jax.jit(lambda p, i: generate(model, p, i, cfg))
    out = gen8(p_w8, ids)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        ids = out[:, -promptlen:] % vocab
        out = gen8(p_w8, ids)
    _fetch(out)
    dt = (time.perf_counter() - t0) / repeats
    print(
        f"[bench] Mamba-{d_model} LM decode int8 serving (same shape, "
        f"w8 offline-quantized, chained): {toks / dt:.0f} tok/s, "
        f"{dt / (promptlen + genlen) * 1e3:.2f} ms/step",
        file=sys.stderr,
    )
    _gate("decode_w8_tok_s", toks / dt, lo=42000.0)


def bench_cli_trajectories(vtg_epochs: int = 50, mir_epochs: int = 20,
                           tas_epochs: int = 50, cap_epochs: int = 20,
                           ant_epochs: int = 40, rec_epochs: int = 100):
    """On-chip end-to-end train→eval→metric trajectories through the REAL
    cli.py synthetic paths for VTG-MR, egocentric-MIR, TAS and dense
    captioning (VERDICT r3 next-#5 + weak-#6; TAL's equivalent was
    chip-validated in round 3). Each run is ~200 optimizer steps plus the
    task's full eval stack (span decode + NMS + R1/mAP for VTG-MR;
    retrieval mAP/nDCG for MIR; acc/edit/F1 for TAS; Hungarian matching →
    event decode → protocol-exact dvc CIDEr/METEOR for captioning) —
    proving the train→eval→metric loops on hardware. References:
    video-temporal-grounding/main/train_mr.py:31-198,
    egocentric-understanding/engine/main_lavila_finetune_mir.py,
    temporal-action-segmentation/main.py, video-dense-captioning/train.py."""
    import contextlib
    import io
    import re

    from video_mamba_suite_tpu.cli import main as cli_main

    NAN = float("nan")
    num = r"(?:np\.float64\()?([0-9.eE+-]+)"  # numpy-2 repr wraps values

    def run(argv):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cli_main(argv)
        return buf.getvalue()

    def _f1(pattern, out, group=1):
        """First match as float; nan on no-match (a print-format drift must
        degrade to nan — which FAILS its gate — not crash the whole
        trajectories section, ADVICE r4 #2)."""
        m = re.search(pattern, out)
        try:
            return float(m.group(group)) if m else NAN
        except (ValueError, IndexError):
            return NAN

    def _fends(pattern, out):
        """(first, last) match as floats; (nan, nan) when absent."""
        vals = re.findall(pattern, out)
        try:
            return (float(vals[0]), float(vals[-1])) if vals else (NAN, NAN)
        except ValueError:
            return (NAN, NAN)

    out = run(["vtg", "--synthetic", "--epochs", str(vtg_epochs)])
    l0, l1 = _fends(r"'loss_total': ([0-9.eE+-]+)", out)
    r1 = _f1(r"'R1@0.5': ([0-9.eE+-]+)", out)
    mp = _f1(r"'mAP_avg': ([0-9.eE+-]+)", out)
    print(
        f"[train] VTG-MR synthetic CLI trajectory ({4 * vtg_epochs} steps "
        f"on chip): loss_total {l0:.3f}→{l1:.3f}, eval R1@0.5 {r1:.2f}, "
        f"mAP@avg {mp:.2f}",
        file=sys.stderr,
    )
    _gate("vtg_r1_05", r1, lo=90.0)     # round-4: 100.0
    _gate("vtg_map_avg", mp, lo=80.0)   # round-4: 94.6

    out = run(["egocentric", "--synthetic", "--epochs", str(mir_epochs),
               "--set", "train.mode=mir"])
    s0, _ = _fends(r"step \d+: loss ([0-9.eE+-]+)", out)
    lf = _f1(r"loss ([0-9.eE+-]+), avg_map [0-9.eE+-]+", out)
    amap = _f1(r"avg_map ([0-9.eE+-]+)", out)
    andcg = _f1(r"avg_ndcg ([0-9.eE+-]+)", out)
    print(
        f"[train] ego-MIR synthetic CLI trajectory ({10 * mir_epochs} steps "
        f"on chip): loss {s0:.3f}→{lf:.3f}, avg_mAP {amap:.2f}, "
        f"avg_nDCG {andcg:.2f}",
        file=sys.stderr,
    )
    _gate("mir_avg_map", amap, lo=0.9)  # round-4: 1.00

    out = run(["tas", "--synthetic", "--epochs", str(tas_epochs)])
    l0, l1 = _fends(r"'loss': ([0-9.eE+-]+)", out)
    acc = _f1(r"eval: \{[^}]*'acc': " + num, out)
    f1 = _f1(r"eval: \{[^}]*'F1@50': " + num, out)
    print(
        f"[train] TAS synthetic CLI trajectory ({4 * tas_epochs} steps on "
        f"chip): loss {l0:.3f}→{l1:.3f}, eval acc {acc:.2f}, F1@50 {f1:.2f}",
        file=sys.stderr,
    )
    _gate("tas_f1_50", f1, lo=90.0)     # round-4: 99.0

    out = run(["captioning", "--synthetic", "--epochs", str(cap_epochs)])
    l0, l1 = _fends(r"'loss_total': (?:Array\()?([0-9.eE+-]+)", out)
    cider = _f1(r"eval: \{[^}]*'CIDEr': " + num, out)
    meteor = _f1(r"eval: \{[^}]*'METEOR': " + num, out)
    recall = _f1(r"eval: \{[^}]*'recall': " + num, out)
    print(
        f"[train] dense-captioning synthetic CLI trajectory "
        f"({10 * cap_epochs} steps on chip): loss_total "
        f"{l0:.3f}→{l1:.3f}, dvc eval recall {recall:.2f}, CIDEr "
        f"{cider:.2f}, METEOR {meteor:.2f}",
        file=sys.stderr,
    )
    _gate("cap_cider", cider, lo=200.0)  # round-4: 291.7 (CIDEr unchanged)
    # METEOR floor set under 1.5 semantics (round-4's 47.2 was 1.0-scale;
    # 1.5's beta=0.2 penalty rescales everything ~0.5x)
    _gate("cap_meteor", meteor, lo=10.0)

    out = run(["anticipation", "--synthetic", "--epochs", str(ant_epochs)])
    l0, l1 = _fends(r"loss ([0-9.eE+-]+)", out)
    ap = _f1(r"eval: \{[^}]*'mean_AP': " + num, out)
    rec5 = _f1(r"eval: \{[^}]*'recall@5': " + num, out)
    print(
        f"[train] anticipation synthetic CLI trajectory ({5 * ant_epochs} "
        f"steps on chip): loss {l0:.3f}→{l1:.3f}, eval mean_AP {ap:.2f}, "
        f"recall@5 {rec5:.2f}",
        file=sys.stderr,
    )
    _gate("ant_mean_ap", ap, lo=0.9)    # round-4: 1.00

    out = run(["recognition", "--synthetic", "--epochs", str(rec_epochs)])
    l0, l1 = _fends(r"loss ([0-9.eE+-]+)", out)
    t1 = _f1(r"eval: \{[^}]*'top1': " + num, out)
    print(
        f"[train] recognition synthetic CLI trajectory ({2 * rec_epochs} "
        f"steps on chip): loss {l0:.3f}→{l1:.3f}, eval top1 {t1:.2f} — all "
        f"seven task suites' train→eval→metric loops chip-validated",
        file=sys.stderr,
    )
    _gate("rec_top1", t1, lo=90.0)      # round-4: 100.0


def main():
    if jax.default_backend() != "tpu":
        # CPU fallback: tiny shapes so the line still prints
        from video_mamba_suite_tpu.ops.selective_scan import selective_scan_assoc

        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        b, l, d, n = 2, 256, 256, 16
        f = jax.jit(lambda u, dt, A, B, C: selective_scan_assoc(
            u, dt, A, B, C, delta_softplus=True))
        t = _time_fn(
            f,
            jax.random.normal(ks[0], (b, l, d)),
            0.5 * jax.random.uniform(ks[1], (b, l, d)),
            -0.5 * jax.random.uniform(ks[2], (d, n)),
            jax.random.normal(ks[3], (b, l, n)),
            jax.random.normal(ks[4], (b, l, n)),
            iters=5,
        )
        print(json.dumps({
            "metric": "selective_scan_assoc_tokens_per_sec_cpu",
            "value": round(b * l / t, 1),
            "unit": "tokens/s",
            "vs_baseline": 1.0,
        }))
        return

    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    def _safe(label, fn, *a, **k):
        """Stderr extras must never kill the primary JSON line: the
        tunneled remote-compile service flakes occasionally (HTTP 500/413
        observed); degrade to a SKIPPED note instead."""
        try:
            return fn(*a, **k)
        except Exception as e:  # noqa: BLE001
            print(f"[bench] {label} SKIPPED "
                  f"({type(e).__name__}: {str(e)[:120]})", file=sys.stderr)
            return None

    # Warm-up probe: the tunneled chip intermittently answers
    # FAILED_PRECONDITION to EVERY op for a minute or two (observed round 3:
    # even a PRNGKey transfer failed, then the chip recovered on its own).
    # Spin on a trivial matmul with backoff so a flake window at process
    # start cannot sink the primary metric below.
    _TRANSIENT = ("FAILED_PRECONDITION", "UNAVAILABLE", "DEADLINE",
                  "RESOURCE_EXHAUSTED", "500", "502", "503", "413",
                  "unavailable", "timed out", "timeout")
    for attempt in range(6):
        try:
            x = jnp.ones((8, 8))
            _fetch(jax.jit(lambda a: a @ a)(x))
            break
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {e}"
            if not any(t in msg for t in _TRANSIENT):
                # Deterministic local failure (bad backend/import bug):
                # don't burn ~5 min of backoff; let the primary bench
                # surface the real error immediately.
                print(f"[bench] device probe hit a non-transient error, "
                      f"proceeding without retries ({msg[:160]})",
                      file=sys.stderr)
                break
            if attempt == 5:
                print("[bench] device probe exhausted all retries, "
                      "proceeding anyway", file=sys.stderr)
                break
            print(f"[bench] device probe failed "
                  f"({type(e).__name__}), retry {attempt + 1}/6",
                  file=sys.stderr)
            time.sleep(15 * (attempt + 1))

    _safe("selective_scan microbench", bench_scan)
    clips_pallas = None
    for attempt in range(3):  # retry the PRIMARY metric with backoff
        try:
            clips_pallas = bench_timemamba("pallas")
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"[bench] primary retry after {type(e).__name__}",
                  file=sys.stderr)
            time.sleep(30 * (attempt + 1))
    clips_assoc = _safe("assoc comparison", bench_timemamba, "assoc")
    _safe("train step", bench_train_step)
    _safe("decode", bench_decode)

    def _tal():
        from benchmarks.bench_training import bench_tal_train

        t = bench_tal_train()
        _gate("tal_step_ms", t * 1e3, hi=90.0)  # round-4: 53; loaded: 66

    def _long():
        # the reference's 1M-token self-test, standing chip point
        # (avion/models/timemamba.py:392-400 runs 5000 frames ≈ 1e6 tokens)
        from benchmarks.bench_training import bench_long_context

        t = bench_long_context()
        # r16 chained point: 4.68 Mtok/s (segmented two-pass scan route +
        # flip-free reverse direction; the old 8.9 was the
        # identical-dispatch pipelining artifact — see
        # bench_long_context's docstring). Floor = ~82% of 4.68.
        _gate("long_mtok_s", 1_048_576 / t / 1e6, lo=3.85)

    _safe("TAL train step", _tal)
    _safe("1M-token long context", _long)
    _safe("CLI trajectories", bench_cli_trajectories)

    from benchmarks.profile_timemamba import timemamba_flops

    V5E_PEAK = 197e12
    A100_CLIPS_EST = 165.0  # documented estimate, see module docstring
    flops_per_clip = timemamba_flops(1)
    mfu = clips_pallas * flops_per_clip / V5E_PEAK
    ratio = (f", {clips_pallas / clips_assoc:.1f}x vs XLA assoc path"
             if clips_assoc else "")
    # quantified physical ceiling of this metric on ONE v5e chip: the Mamba
    # adapters are pure VPU work (23.3 ms at the calibrated VPU roofline) on
    # a chip whose VPU:MXU ratio is 1:104 vs the A100's ~1:16 — component
    # floors sum to ~57 ms = 140 clips/s = 0.85x the A100 estimate
    # (BASELINE.md "physical ceiling" table; implementable floor ~66-70 ms)
    CEILING_CLIPS = 140.0
    print(
        f"[bench] TimeMamba-B: {clips_pallas:.1f} clips/s = "
        f"{100 * mfu:.1f}% MFU on v5e "
        f"({flops_per_clip / 1e9:.0f} GF/clip{ratio}, "
        f"{100 * clips_pallas / CEILING_CLIPS:.0f}% of the chip's physical "
        f"ceiling for this op mix — BASELINE.md)",
        file=sys.stderr,
    )
    _gate("clips_per_sec", clips_pallas, lo=84.0)  # round-4: 98.9, ±5% swing
    print(json.dumps({
        "metric": "timemamba_b_clips_per_sec_per_chip",
        "value": round(clips_pallas, 2),
        "unit": "clips/s (16f 224px bf16 fwd, v5e chip; baseline = "
                "documented ~165 clips/s A100 estimate)",
        "vs_baseline": round(clips_pallas / A100_CLIPS_EST, 3),
    }))
    # regression gates: any failed/missing gate exits 1 (JSON already out)
    rc = gate_summary()
    if rc:
        sys.exit(rc)


if __name__ == "__main__":
    main()
