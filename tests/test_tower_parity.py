"""Full-tower cross-codebase parity: the reference's OWN torch towers
(avion timemamba.py / vimamba.py / transformer.py, run with the torch scan
oracle) vs our flax models with converted weights (VERDICT r2 weak #3).

fp32, CPU, same-device tolerances."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_harness import import_reference_avion  # noqa: E402


@pytest.fixture(scope="module")
def avion():
    return import_reference_avion()


@pytest.mark.parametrize("style", ["frozen-in-time", "timesformer-div",
                                   "frozen-joint"])
def test_spacetime_block_parity(avion, style):
    """One SpaceTimeBlock (timemamba.py:98-178) vs ours, over all three
    attention styles (:168-171): frozen-in-time (space branch residual from
    the block input), timesformer-div (temporal residual stays in the
    stream — the like_timesformer builder's style, model_clip.py:729), and
    frozen-joint (Mamba over the joint (n·t) sequence, :136).

    The reference's non-flash spatial attention instantiates torch
    nn.MultiheadAttention WITHOUT batch_first — as written it would attend
    over the (b·t) axis; the published models train with use_flash_attn=True
    (batch-first). We pin batch_first=True on the oracle to test the trained
    semantics our FusedMHA implements."""
    import jax
    import jax.numpy as jnp

    from video_mamba_suite_tpu.models.convert import (
        convert_attention,
        convert_layernorm,
        convert_mlp,
        convert_vim_mixer,
    )
    from video_mamba_suite_tpu.models.timemamba import SpaceTimeBlock

    tm, _, _ = avion
    torch.manual_seed(0)
    dim, heads, n, t, B = 32, 4, 4, 3, 2
    ref = tm.SpaceTimeBlock(dim=dim, num_heads=heads,
                            attention_style=style,
                            is_tanh_gating=True)
    ref.attn.batch_first = True  # trained (flash) semantics
    ref.eval()
    x = torch.randn(B, 1 + n * t, dim,
                    generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = ref(x, time_n=n, space_f=t).numpy()

    sd = ref.state_dict()
    blk = {
        "norm1": convert_layernorm(sd, "norm1."),
        "norm2": convert_layernorm(sd, "norm2."),
        "norm3": convert_layernorm(sd, "norm3."),
        "attn": convert_attention(sd, "attn.", heads),
        "mlp": convert_mlp(sd, "mlp."),
        "time_mamba": convert_vim_mixer(sd, "time_mamba."),
        "alpha_timeattn": np.asarray(sd["alpha_timeattn"]),
    }
    params = {"params": jax.tree_util.tree_map(jnp.asarray, blk)}

    ours = SpaceTimeBlock(dim=dim, num_heads=heads, is_tanh_gating=True,
                          attention_style=style, impl="ref")
    xj = jnp.asarray(x.numpy())
    cls = xj[:, :1]
    patches = xj[:, 1:].reshape(B, n, t, dim)
    init = ours.init(jax.random.PRNGKey(0), cls, patches)
    assert (jax.tree_util.tree_map(lambda a: a.shape, init["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, params["params"]))
    cls_o, patches_o = ours.apply(params, cls, patches)
    got = np.concatenate(
        [np.asarray(cls_o), np.asarray(patches_o).reshape(B, n * t, dim)],
        axis=1)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_vivim_2layer_parity(avion):
    """2-layer ViViM (vimamba.py:231-489: middle cls token, abs pos embed,
    temporal embed, mean over per-frame cls, projection) vs ours."""
    import jax
    import jax.numpy as jnp

    from video_mamba_suite_tpu.models.convert import convert_vivim
    from video_mamba_suite_tpu.models.vivim import ViViM

    _, vm, _ = avion
    torch.manual_seed(0)
    ref = vm.ViViM(
        img_size=32, patch_size=16, num_frames=2, stride=16, depth=2,
        embed_dim=32, channels=3, num_classes=0, rms_norm=False,
        fused_add_norm=False, residual_in_fp32=True, bimamba_type="v2",
        if_cls_token=True, if_abs_pos_embed=True, if_devide_out=True,
        use_middle_cls_token=True, final_pool_type="mean", output_dim=16,
        drop_path_rate=0.0,
    )
    ref.eval()
    # reference input is (B, C, T, H, W); forward_features transposes itself
    x = torch.randn(2, 3, 2, 32, 32,
                    generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        want = ref.forward_features(x).numpy()

    params = {"params": jax.tree_util.tree_map(
        jnp.asarray, convert_vivim(ref.state_dict(), depth=2))}
    ours = ViViM(img_size=32, patch_size=16, num_frames=2, depth=2,
                 embed_dim=32, num_classes=0, output_dim=16,
                 drop_path_rate=0.0, if_devide_out=True, impl="ref")
    # ours takes (B, T, H, W, C)
    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    init = ours.init(jax.random.PRNGKey(0), xj)
    assert (jax.tree_util.tree_map(lambda a: a.shape, init["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, params["params"]))
    got = np.asarray(ours.apply(params, xj))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_text_transformer_parity(avion):
    """CLIP text tower (transformer.py:378-480: token embed + pos embed +
    causal resblocks + ln_final + eot pooling + projection) vs ours."""
    import jax
    import jax.numpy as jnp

    from video_mamba_suite_tpu.models.clip import TextTransformer
    from video_mamba_suite_tpu.models.convert import convert_text_transformer

    _, _, tr = avion
    torch.manual_seed(0)
    ctx, vocab, width, heads, layers, out_dim = 12, 50, 32, 4, 2, 16
    ref = tr.TextTransformer(context_length=ctx, vocab_size=vocab,
                             width=width, heads=heads, layers=layers,
                             output_dim=out_dim, causal_mask=True)
    ref.eval()
    g = torch.Generator().manual_seed(3)
    # CLIP pools at argmax token id — emulate eot as the max id
    text = torch.randint(1, vocab - 1, (2, ctx), generator=g)
    text[:, -2] = vocab - 1
    with torch.no_grad():
        want = ref(text).numpy()

    params = {"params": jax.tree_util.tree_map(
        jnp.asarray,
        convert_text_transformer(ref.state_dict(), layers=layers,
                                 num_heads=heads, prefix=""))}
    ours = TextTransformer(context_length=ctx, vocab_size=vocab, width=width,
                           heads=heads, layers=layers, output_dim=out_dim,
                           causal_mask=True)
    tj = jnp.asarray(text.numpy().astype(np.int32))
    init = ours.init(jax.random.PRNGKey(0), tj)
    assert (jax.tree_util.tree_map(lambda a: a.shape, init["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, params["params"]))
    got = np.asarray(ours.apply(params, tj))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_spacetime_block_grad_parity(avion):
    """GRADIENT parity of one whole SpaceTimeBlock vs torch autograd through
    the reference's own module: every parameter cotangent (adapter scan,
    patch-major spatial attention, MLP, LNs, tanh gate) plus the input
    cotangent. The convert_* mappers are pure re-layouts, so applying them
    to the torch .grad dict yields the expected grads in our layout."""
    import jax
    import jax.numpy as jnp

    from video_mamba_suite_tpu.models.convert import (
        convert_attention,
        convert_layernorm,
        convert_mlp,
        convert_vim_mixer,
    )
    from video_mamba_suite_tpu.models.timemamba import SpaceTimeBlock

    tm, _, _ = avion
    torch.manual_seed(0)
    dim, heads, n, t, B = 32, 4, 4, 3, 2
    ref = tm.SpaceTimeBlock(dim=dim, num_heads=heads,
                            attention_style="frozen-in-time",
                            is_tanh_gating=True)
    ref.attn.batch_first = True
    ref.eval()
    gen = torch.Generator().manual_seed(5)
    x_t = torch.randn(B, 1 + n * t, dim, generator=gen).requires_grad_(True)
    g = torch.randn(B, 1 + n * t, dim, generator=gen)
    ref(x_t, time_n=n, space_f=t).backward(g)
    want_x_grad = x_t.grad.numpy()

    def convert_block(sd):
        return {
            "norm1": convert_layernorm(sd, "norm1."),
            "norm2": convert_layernorm(sd, "norm2."),
            "norm3": convert_layernorm(sd, "norm3."),
            "attn": convert_attention(sd, "attn.", heads),
            "mlp": convert_mlp(sd, "mlp."),
            "time_mamba": convert_vim_mixer(sd, "time_mamba."),
            "alpha_timeattn": np.asarray(sd["alpha_timeattn"]),
        }

    grads_sd = {name: p.grad.detach().clone()
                for name, p in ref.named_parameters() if p.grad is not None}
    want_param_grads = jax.tree_util.tree_map(
        lambda v: np.asarray(v), convert_block(grads_sd))
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_block(ref.state_dict()))

    ours = SpaceTimeBlock(dim=dim, num_heads=heads, is_tanh_gating=True,
                          attention_style="frozen-in-time", impl="ref")
    gj = jnp.asarray(g.numpy())

    def loss(p, x):
        cls, patches = x[:, :1], x[:, 1:].reshape(B, n, t, dim)
        cls_o, patches_o = ours.apply({"params": p}, cls, patches)
        out = jnp.concatenate(
            [cls_o, patches_o.reshape(B, n * t, dim)], axis=1)
        return jnp.sum(out * gj)

    got_param_grads, got_x_grad = jax.grad(loss, argnums=(0, 1))(
        params, jnp.asarray(x_t.detach().numpy()))

    np.testing.assert_allclose(np.asarray(got_x_grad), want_x_grad,
                               rtol=2e-3, atol=2e-4)
    flat_got = jax.tree_util.tree_leaves_with_path(got_param_grads)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(want_param_grads))
    assert len(flat_got) == len(flat_want)
    for path, leaf in flat_got:
        np.testing.assert_allclose(
            np.asarray(leaf), flat_want[path], rtol=2e-3, atol=2e-4,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}")


def _grad_state_dict(ref):
    """state_dict-shaped dict of gradients: zero-seeded from the weights
    (buffers / unused params → zeros, matching jax's zero cotangents) then
    overwritten with torch autograd's .grad where present."""
    sd = ref.state_dict()
    out = {k: torch.zeros_like(v) for k, v in sd.items()}
    for name, p in ref.named_parameters():
        if p.grad is not None:
            out[name] = p.grad.detach().clone()
    return out


def _assert_tree_close(got_tree, want_tree, rtol, atol):
    import jax

    flat_got = jax.tree_util.tree_leaves_with_path(got_tree)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(want_tree))
    assert len(flat_got) == len(flat_want)
    for path, leaf in flat_got:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_want[path]), rtol=rtol,
            atol=atol, err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_vivim_grad_parity(avion):
    """GRADIENT parity of the 2-layer ViViM tower (patch embed, cls/pos/
    temporal embeds, bidirectional mixers, projection) vs torch autograd."""
    import jax
    import jax.numpy as jnp

    from video_mamba_suite_tpu.models.convert import convert_vivim
    from video_mamba_suite_tpu.models.vivim import ViViM

    _, vm, _ = avion
    torch.manual_seed(0)
    ref = vm.ViViM(
        img_size=32, patch_size=16, num_frames=2, stride=16, depth=2,
        embed_dim=32, channels=3, num_classes=0, rms_norm=False,
        fused_add_norm=False, residual_in_fp32=True, bimamba_type="v2",
        if_cls_token=True, if_abs_pos_embed=True, if_devide_out=True,
        use_middle_cls_token=True, final_pool_type="mean", output_dim=16,
        drop_path_rate=0.0,
    )
    ref.eval()
    gen = torch.Generator().manual_seed(6)
    x_t = torch.randn(2, 3, 2, 32, 32, generator=gen).requires_grad_(True)
    g = torch.randn(2, 16, generator=gen)
    ref.forward_features(x_t).backward(g)
    want_param_grads = jax.tree_util.tree_map(
        lambda v: np.asarray(v), convert_vivim(_grad_state_dict(ref), depth=2))
    want_x_grad = x_t.grad.permute(0, 2, 3, 4, 1).numpy()

    params = jax.tree_util.tree_map(
        jnp.asarray, convert_vivim(ref.state_dict(), depth=2))
    ours = ViViM(img_size=32, patch_size=16, num_frames=2, depth=2,
                 embed_dim=32, num_classes=0, output_dim=16,
                 drop_path_rate=0.0, if_devide_out=True, impl="ref")
    gj = jnp.asarray(g.numpy())

    def loss(p, x):
        return jnp.sum(ours.apply({"params": p}, x) * gj)

    got_param_grads, got_x_grad = jax.grad(loss, argnums=(0, 1))(
        params, jnp.asarray(x_t.detach().permute(0, 2, 3, 4, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got_x_grad), want_x_grad,
                               rtol=2e-3, atol=2e-4)
    _assert_tree_close(got_param_grads, want_param_grads, 2e-3, 2e-4)


def test_text_transformer_grad_parity(avion):
    """GRADIENT parity of the CLIP text tower (token/pos embeds, causal
    resblocks, ln_final, eot pooling, projection) vs torch autograd."""
    import jax
    import jax.numpy as jnp

    from video_mamba_suite_tpu.models.clip import TextTransformer
    from video_mamba_suite_tpu.models.convert import convert_text_transformer

    _, _, tr = avion
    torch.manual_seed(0)
    ctx, vocab, width, heads, layers, out_dim = 12, 50, 32, 4, 2, 16
    ref = tr.TextTransformer(context_length=ctx, vocab_size=vocab,
                             width=width, heads=heads, layers=layers,
                             output_dim=out_dim, causal_mask=True)
    ref.eval()
    gen = torch.Generator().manual_seed(7)
    text = torch.randint(1, vocab - 1, (2, ctx), generator=gen)
    text[:, -2] = vocab - 1
    g = torch.randn(2, out_dim, generator=gen)
    ref(text).backward(g)

    def conv(sd):
        return convert_text_transformer(sd, layers=layers, num_heads=heads,
                                        prefix="")

    want_param_grads = jax.tree_util.tree_map(
        lambda v: np.asarray(v), conv(_grad_state_dict(ref)))
    params = jax.tree_util.tree_map(jnp.asarray, conv(ref.state_dict()))
    ours = TextTransformer(context_length=ctx, vocab_size=vocab, width=width,
                           heads=heads, layers=layers, output_dim=out_dim,
                           causal_mask=True)
    gj = jnp.asarray(g.numpy())
    tj = jnp.asarray(text.numpy().astype(np.int32))

    def loss(p):
        return jnp.sum(ours.apply({"params": p}, tj) * gj)

    got_param_grads = jax.grad(loss)(params)
    _assert_tree_close(got_param_grads, want_param_grads, 2e-3, 2e-4)
