"""Direct coverage for the small surfaces nothing else tests head-on:
the N8 decode-step op (ops/selective_state_update.py), the metric logger,
the step timer / memory meter, and the HF-layout loader (models/hf.py)."""

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_selective_state_update_matches_scan():
    """T chained decode steps == the full selective scan over the same
    sequence (the reference's triton-kernel-vs-ref contract,
    selective_state_update.py:157-192), incl. dt bias/softplus, D skip and
    the silu(z) gate; final state == the scan's last state."""
    from video_mamba_suite_tpu.ops.selective_scan import selective_scan_ref
    from video_mamba_suite_tpu.ops.selective_state_update import (
        selective_state_update_ref,
    )

    rng = jax.random.PRNGKey(0)
    b, l, d, n = 2, 6, 8, 4
    ks = jax.random.split(rng, 8)
    u = jax.random.normal(ks[0], (b, l, d))
    dt = 0.4 * jax.random.uniform(ks[1], (b, l, d))
    A = -0.5 * jax.random.uniform(ks[2], (d, n))
    B = jax.random.normal(ks[3], (b, l, n))
    C = jax.random.normal(ks[4], (b, l, n))
    D = jax.random.normal(ks[5], (d,))
    z = jax.random.normal(ks[6], (b, l, d))
    bias = 0.3 * jax.random.uniform(ks[7], (d,))

    want, last = selective_scan_ref(u, dt, A, B, C, D=D, z=z,
                                    delta_bias=bias, delta_softplus=True,
                                    return_last_state=True)

    state = jnp.zeros((b, d, n))
    ys = []
    for t in range(l):
        y, state = selective_state_update_ref(
            state, u[:, t], dt[:, t], A, B[:, t], C[:, t], D=D, z=z[:, t],
            dt_bias=bias, dt_softplus=True)
        ys.append(y)
    got = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state), np.asarray(last),
                               rtol=1e-5, atol=1e-5)


def test_metric_logger_jsonl(tmp_path):
    from video_mamba_suite_tpu.utils.logging import MetricLogger

    lg = MetricLogger(log_dir=str(tmp_path), name="train")
    lg.log(1, {"loss": jnp.asarray(0.5), "acc": 0.25})
    lg.log(2, {"loss": 0.4})
    lg.close()
    files = [f for f in os.listdir(tmp_path) if f.endswith(".jsonl")]
    assert files
    rows = [json.loads(x) for x in
            open(tmp_path / files[0]).read().splitlines()]
    assert rows[0]["step"] == 1 and abs(rows[0]["loss"] - 0.5) < 1e-6
    assert rows[1]["step"] == 2


def test_step_timer_and_memory_meter():
    from video_mamba_suite_tpu.utils.profiling import (
        StepTimer,
        live_memory_bytes,
    )

    t = StepTimer()
    for _ in range(3):
        t.start()
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        t.stop(x)
    assert t.avg_ms > 0  # property
    mem = live_memory_bytes()
    assert mem is None or mem > 0


def test_hf_from_pretrained_local_dir(tmp_path):
    """from_pretrained over an upstream state-spaces/mamba-* local layout
    (config.json + pytorch_model.bin) builds a working (model, params)
    (mamba_ssm/utils/hf.py:9-23 equivalent, offline-first)."""
    torch = pytest.importorskip("torch")
    from test_convert import _torch_mixer_state

    from video_mamba_suite_tpu.models.hf import from_pretrained

    d_model, n_layer, vocab = 16, 2, 40
    sd = {"backbone.embedding.weight": torch.randn(vocab, d_model),
          "backbone.norm_f.weight": torch.ones(d_model)}
    dt_rank = math.ceil(d_model / 16)
    for i in range(n_layer):
        mix = _torch_mixer_state(d_model, 16, 4, 2, dt_rank, seed=i)
        for k, v in mix.items():
            sd[f"backbone.layers.{i}.mixer.{k}"] = v
        sd[f"backbone.layers.{i}.norm.weight"] = torch.ones(d_model)
    torch.save(sd, tmp_path / "pytorch_model.bin")
    (tmp_path / "config.json").write_text(json.dumps(dict(
        d_model=d_model, n_layer=n_layer, vocab_size=vocab,
        ssm_cfg={"d_state": 16, "d_conv": 4, "expand": 2},
        rms_norm=True, pad_vocab_size_multiple=8)))

    model, params = from_pretrained(str(tmp_path))
    ids = jnp.zeros((1, 4), jnp.int32)
    logits = model.apply(jax.tree_util.tree_map(jnp.asarray, params), ids)
    assert logits.shape[0] == 1 and logits.shape[1] == 4
    assert bool(jnp.all(jnp.isfinite(logits)))

    # HF MambaConfig-style key aliases (hidden_size / num_hidden_layers)
    (tmp_path / "config.json").write_text(json.dumps(dict(
        hidden_size=d_model, num_hidden_layers=n_layer, vocab_size=vocab)))
    model2, params2 = from_pretrained(str(tmp_path))
    logits2 = model2.apply(jax.tree_util.tree_map(jnp.asarray, params2), ids)
    assert bool(jnp.all(jnp.isfinite(logits2)))


def test_fused_add_norm_semantics():
    """N7 contract (the reference layer_norm_fn, triton/layernorm.py:380-478):
    prenorm returns (Norm(x + residual), x + residual) with the residual
    stream in fp32; postnorm returns residual=None; RMS variant has no
    mean subtraction."""
    from video_mamba_suite_tpu.ops.norms import fused_add_norm

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 5, 8), jnp.bfloat16)
    r = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8), jnp.float32)
    w = jnp.linspace(0.5, 1.5, 8)
    b = jnp.linspace(-0.1, 0.1, 8)

    normed, res = fused_add_norm(x, w, b, residual=r, prenorm=True)
    want_res = x.astype(jnp.float32) + r
    np.testing.assert_allclose(np.asarray(res), np.asarray(want_res),
                               rtol=1e-6, atol=1e-6)
    assert res.dtype == jnp.float32 and normed.dtype == x.dtype
    mu = want_res.mean(-1, keepdims=True)
    var = ((want_res - mu) ** 2).mean(-1, keepdims=True)
    want = ((want_res - mu) / jnp.sqrt(var + 1e-5)) * w + b
    np.testing.assert_allclose(np.asarray(normed, dtype=np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)

    # postnorm: no residual returned
    _, res_none = fused_add_norm(x, w, b, residual=r, prenorm=False)
    assert res_none is None

    # RMS: scale-only, no centering — a constant shift changes LN's
    # output but only rescales RMS input
    normed_rms, _ = fused_add_norm(x, w, None, residual=None, prenorm=True,
                                   is_rms_norm=True)
    want_rms = (x.astype(jnp.float32)
                / jnp.sqrt((x.astype(jnp.float32) ** 2).mean(-1, keepdims=True)
                           + 1e-5)) * w
    np.testing.assert_allclose(np.asarray(normed_rms, dtype=np.float32),
                               np.asarray(want_rms), rtol=2e-2, atol=2e-2)
