"""SD3 MMDiT + Flux transformer: shapes, conditioning sensitivity, and strict
converter structure/accounting against synthetic diffusers-layout state dicts
(same method as the SD UNet tests — real checkpoints are not downloadable)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.models import (
    FluxConfig,
    FluxTransformer,
    MMDiT,
    MMDiTConfig,
)
from diffusion_uncertainty_tpu.models.convert import convert_flux, convert_sd3_mmdit

rng = np.random.RandomState(0)


def _r(*shape):
    return rng.randn(*shape).astype(np.float32) * 0.05


def _lin(sd, pfx, d_out, d_in):
    sd[f"{pfx}.weight"] = _r(d_out, d_in)
    sd[f"{pfx}.bias"] = _r(d_out)


# ---------------------------------------------------------------------------
# MMDiT
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mmdit_tiny():
    cfg = MMDiTConfig.tiny()
    model = MMDiT(cfg)
    x = jnp.zeros((2, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    t = jnp.asarray(500.0)
    ctx = jnp.ones((2, 6, cfg.joint_attention_dim))
    pooled = jnp.ones((2, cfg.pooled_projection_dim))
    params = model.init(jax.random.key(0), x, t, ctx, pooled)
    return cfg, model, params, x, t, ctx, pooled


def test_mmdit_shapes(mmdit_tiny):
    cfg, model, params, x, t, ctx, pooled = mmdit_tiny
    out = model.apply(params, x + 0.1, t, ctx, pooled)
    assert out.shape == (2, cfg.sample_size, cfg.sample_size, cfg.out_channels)
    assert out.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out)))


def test_mmdit_conditioning_sensitivity(mmdit_tiny):
    cfg, model, params, x, t, ctx, pooled = mmdit_tiny
    x = x + 0.1
    base = model.apply(params, x, t, ctx, pooled)
    a = model.apply(params, x, t, ctx * 2.0, pooled)
    b = model.apply(params, x, t, ctx, pooled * 2.0)
    c = model.apply(params, x, jnp.asarray(10.0), ctx, pooled)
    for other in (a, b, c):
        assert not np.allclose(np.asarray(base), np.asarray(other))


def make_sd3_state_dict(cfg: MMDiTConfig) -> dict:
    d = cfg.dim
    sd = {}
    sd["pos_embed.proj.weight"] = _r(d, cfg.in_channels, cfg.patch_size, cfg.patch_size)
    sd["pos_embed.proj.bias"] = _r(d)
    sd["pos_embed.pos_embed"] = _r(1, cfg.pos_embed_max_size**2, d)
    _lin(sd, "time_text_embed.timestep_embedder.linear_1", d, 256)
    _lin(sd, "time_text_embed.timestep_embedder.linear_2", d, d)
    _lin(sd, "time_text_embed.text_embedder.linear_1", d, cfg.pooled_projection_dim)
    _lin(sd, "time_text_embed.text_embedder.linear_2", d, d)
    _lin(sd, "context_embedder", d, cfg.joint_attention_dim)
    for i in range(cfg.num_layers):
        t = f"transformer_blocks.{i}"
        last = i == cfg.num_layers - 1
        _lin(sd, f"{t}.norm1.linear", 6 * d, d)
        _lin(sd, f"{t}.norm1_context.linear", (2 if last else 6) * d, d)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            _lin(sd, f"{t}.attn.{n}", d, d)
        _lin(sd, f"{t}.attn.to_out.0", d, d)
        _lin(sd, f"{t}.ff.net.0.proj", 4 * d, d)
        _lin(sd, f"{t}.ff.net.2", d, 4 * d)
        if cfg.qk_norm == "rms_norm":
            for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
                sd[f"{t}.attn.{n}.weight"] = _r(cfg.attention_head_dim)
        if not last:
            _lin(sd, f"{t}.attn.to_add_out", d, d)
            _lin(sd, f"{t}.ff_context.net.0.proj", 4 * d, d)
            _lin(sd, f"{t}.ff_context.net.2", d, 4 * d)
    _lin(sd, "norm_out.linear", 2 * d, d)
    _lin(sd, "proj_out", cfg.patch_size**2 * cfg.out_channels, d)
    return sd


@pytest.mark.parametrize("qk_norm", [None, "rms_norm"])
def test_mmdit_converter_structure(qk_norm):
    cfg = dataclasses.replace(MMDiTConfig.tiny(), qk_norm=qk_norm)
    model = MMDiT(cfg)
    sd = make_sd3_state_dict(cfg)
    params = convert_sd3_mmdit(sd, cfg)

    x = jnp.zeros((1, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    ref = model.init(jax.random.key(0), x, jnp.asarray(1.0),
                     jnp.ones((1, 4, cfg.joint_attention_dim)),
                     jnp.ones((1, cfg.pooled_projection_dim)))
    ref_flat = {"/".join(map(str, k)): v.shape for k, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_flat = {"/".join(map(str, k)): np.asarray(v).shape for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_flat == got_flat
    out = model.apply(params, x + 0.2, jnp.asarray(1.0),
                      jnp.ones((1, 4, cfg.joint_attention_dim)),
                      jnp.ones((1, cfg.pooled_projection_dim)))
    assert np.isfinite(np.asarray(out)).all()


def test_mmdit_converter_strict_accounting():
    cfg = MMDiTConfig.tiny()
    sd = make_sd3_state_dict(cfg)
    sd["stray.weight"] = _r(2)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_sd3_mmdit(sd, cfg)
    sd2 = make_sd3_state_dict(cfg)
    del sd2["transformer_blocks.0.attn.to_q.weight"]
    with pytest.raises(KeyError, match="missing"):
        convert_sd3_mmdit(sd2, cfg)


def test_mmdit_sd3_medium_param_count():
    """SD3-medium MMDiT should land at ~2.0B params."""
    cfg = MMDiTConfig.sd3_medium()
    model = MMDiT(cfg)
    shapes = jax.eval_shape(
        lambda k: model.init(
            k,
            jnp.zeros((1, 64, 64, 16)),
            jnp.asarray(1.0),
            jnp.zeros((1, 77, cfg.joint_attention_dim)),
            jnp.zeros((1, cfg.pooled_projection_dim)),
        ),
        jax.random.key(0),
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 1.9e9 < n < 2.2e9, n


# ---------------------------------------------------------------------------
# Flux
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def flux_tiny():
    cfg = FluxConfig.tiny()
    model = FluxTransformer(cfg)
    x = jnp.zeros((2, 8, 8, cfg.in_channels))
    t = jnp.asarray(500.0)
    ctx = jnp.ones((2, 6, cfg.joint_attention_dim))
    pooled = jnp.ones((2, cfg.pooled_projection_dim))
    g = jnp.asarray(3500.0)
    params = model.init(jax.random.key(0), x, t, ctx, pooled, g)
    return cfg, model, params, x, t, ctx, pooled, g


def test_flux_shapes(flux_tiny):
    cfg, model, params, x, t, ctx, pooled, g = flux_tiny
    out = model.apply(params, x + 0.1, t, ctx, pooled, g)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_flux_guidance_required_and_sensitive(flux_tiny):
    cfg, model, params, x, t, ctx, pooled, g = flux_tiny
    with pytest.raises(ValueError):
        model.apply(params, x, t, ctx, pooled, None)
    a = model.apply(params, x + 0.1, t, ctx, pooled, g)
    b = model.apply(params, x + 0.1, t, ctx, pooled, jnp.asarray(1000.0))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_flux_rope_position_sensitivity(flux_tiny):
    """Same content at different grid positions must attend differently."""
    cfg, model, params, x, t, ctx, pooled, g = flux_tiny
    v = jax.random.normal(jax.random.key(7), (1, 2, 2, cfg.in_channels))
    base = jnp.zeros((1, 8, 8, cfg.in_channels))
    x1 = base.at[:, 0:2, 0:2].set(v)
    x2 = base.at[:, 4:6, 4:6].set(v)
    ctx1, pooled1 = ctx[:1], pooled[:1]
    o1 = model.apply(params, x1, t, ctx1, pooled1, g)
    o2 = model.apply(params, x2, t, ctx1, pooled1, g)
    # translated input must NOT produce an exactly translated output
    assert not np.allclose(
        np.asarray(o1[:, 0:2, 0:2]), np.asarray(o2[:, 4:6, 4:6]), atol=1e-6
    )


def make_flux_state_dict(cfg: FluxConfig) -> dict:
    d = cfg.dim
    hd = cfg.attention_head_dim
    sd = {}
    _lin(sd, "x_embedder", d, 4 * cfg.in_channels)
    _lin(sd, "context_embedder", d, cfg.joint_attention_dim)
    _lin(sd, "time_text_embed.timestep_embedder.linear_1", d, 256)
    _lin(sd, "time_text_embed.timestep_embedder.linear_2", d, d)
    if cfg.guidance_embeds:
        _lin(sd, "time_text_embed.guidance_embedder.linear_1", d, 256)
        _lin(sd, "time_text_embed.guidance_embedder.linear_2", d, d)
    _lin(sd, "time_text_embed.text_embedder.linear_1", d, cfg.pooled_projection_dim)
    _lin(sd, "time_text_embed.text_embedder.linear_2", d, d)
    for i in range(cfg.num_layers):
        t = f"transformer_blocks.{i}"
        _lin(sd, f"{t}.norm1.linear", 6 * d, d)
        _lin(sd, f"{t}.norm1_context.linear", 6 * d, d)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            _lin(sd, f"{t}.attn.{n}", d, d)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{t}.attn.{n}.weight"] = _r(hd)
        _lin(sd, f"{t}.attn.to_out.0", d, d)
        _lin(sd, f"{t}.attn.to_add_out", d, d)
        _lin(sd, f"{t}.ff.net.0.proj", 4 * d, d)
        _lin(sd, f"{t}.ff.net.2", d, 4 * d)
        _lin(sd, f"{t}.ff_context.net.0.proj", 4 * d, d)
        _lin(sd, f"{t}.ff_context.net.2", d, 4 * d)
    for i in range(cfg.num_single_layers):
        t = f"single_transformer_blocks.{i}"
        _lin(sd, f"{t}.norm.linear", 3 * d, d)
        for n in ("to_q", "to_k", "to_v"):
            _lin(sd, f"{t}.attn.{n}", d, d)
        sd[f"{t}.attn.norm_q.weight"] = _r(hd)
        sd[f"{t}.attn.norm_k.weight"] = _r(hd)
        _lin(sd, f"{t}.proj_mlp", 4 * d, d)
        _lin(sd, f"{t}.proj_out", d, 5 * d)
    _lin(sd, "norm_out.linear", 2 * d, d)
    _lin(sd, "proj_out", 4 * cfg.in_channels, d)
    return sd


def test_flux_converter_structure(flux_tiny):
    cfg, model, ref_params, x, t, ctx, pooled, g = flux_tiny
    sd = make_flux_state_dict(cfg)
    params = convert_flux(sd, cfg)
    ref_flat = {"/".join(map(str, k)): v.shape for k, v in jax.tree_util.tree_flatten_with_path(ref_params)[0]}
    got_flat = {"/".join(map(str, k)): np.asarray(v).shape for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_flat == got_flat
    out = model.apply(params, x + 0.1, t, ctx, pooled, g)
    assert np.isfinite(np.asarray(out)).all()


def test_flux_converter_schnell_no_guidance():
    cfg = dataclasses.replace(FluxConfig.tiny(), guidance_embeds=False)
    model = FluxTransformer(cfg)
    sd = make_flux_state_dict(cfg)
    params = convert_flux(sd, cfg)
    x = jnp.zeros((1, 8, 8, cfg.in_channels))
    out = model.apply(params, x, jnp.asarray(1.0),
                      jnp.ones((1, 4, cfg.joint_attention_dim)),
                      jnp.ones((1, cfg.pooled_projection_dim)))
    assert out.shape == x.shape


def test_flux_converter_strict_accounting():
    cfg = FluxConfig.tiny()
    sd = make_flux_state_dict(cfg)
    sd["stray.weight"] = _r(2)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_flux(sd, cfg)
    sd2 = make_flux_state_dict(cfg)
    del sd2["single_transformer_blocks.0.proj_out.weight"]
    with pytest.raises(KeyError, match="missing"):
        convert_flux(sd2, cfg)


def test_flux_flow_match_end_to_end():
    """Flux velocity model under the flow-match sampler with an uncertainty
    window (the reference Flux pipeline's loop shape,
    ``pipeline_flux_uncertainty.py:211-249``)."""
    from diffusion_uncertainty_tpu.diffusion.flow_match import (
        FlowMatchConfig,
        sample_flow_match,
    )

    cfg = FluxConfig.tiny()
    model = FluxTransformer(cfg)
    x = jnp.zeros((2, 8, 8, cfg.in_channels))
    ctx = jnp.ones((2, 4, cfg.joint_attention_dim))
    pooled = jnp.ones((2, cfg.pooled_projection_dim))
    g = jnp.asarray(3500.0)
    params = model.init(jax.random.key(0), x, jnp.asarray(1.0), ctx, pooled, g)

    def velocity_fn(z, t, key):
        return model.apply(params, z, t, ctx, pooled, g)

    fm = FlowMatchConfig(num_inference_steps=6, after_step=2, num_steps_uc=2, M=2)
    res = jax.jit(
        lambda xT, k: sample_flow_match(velocity_fn, xT, k, fm)
    )(jax.random.normal(jax.random.key(1), x.shape), jax.random.key(2))
    assert res.sample.shape == x.shape
    assert res.uncertainty.shape == (2, 2, 8, 8, cfg.in_channels)
    assert np.isfinite(np.asarray(res.sample)).all()


def test_flux_token_packing_permutation():
    """Our patch-major (p1,p2,c) token packing + the converter's row
    permutation must reproduce diffusers' channel-major (c,p1,p2)
    ``_pack_latents`` + raw weight exactly."""
    from diffusion_uncertainty_tpu.models.convert import _flux_token_perm

    rng2 = np.random.RandomState(11)
    C, D = 4, 6
    x = rng2.randn(1, 4, 4, C).astype(np.float32)  # NHWC latents
    W = rng2.randn(D, 4 * C).astype(np.float32)  # torch x_embedder weight

    # diffusers: NCHW -> view(B,C,h,2,w,2) -> permute(0,2,4,1,3,5) -> (B,hw,C*4)
    xt = x.transpose(0, 3, 1, 2)
    B, Cc, H, Wd = xt.shape
    tok_torch = xt.reshape(B, Cc, H // 2, 2, Wd // 2, 2).transpose(0, 2, 4, 1, 3, 5).reshape(B, -1, 4 * Cc)
    out_torch = tok_torch @ W.T

    # ours: (B,gh,2,gw,2,C) patch-major tokens, converted kernel
    tok_ours = x.reshape(B, H // 2, 2, Wd // 2, 2, Cc).transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, 4 * Cc)
    K = W.T[_flux_token_perm(Cc)]
    np.testing.assert_allclose(tok_ours @ K, out_torch, rtol=1e-5, atol=1e-6)
