"""Pipeline parallelism: the GPipe shard_map schedule must reproduce the
sequential depth loop to matmul-blocking roundoff (the microbatch matmuls
tile differently than the full-batch ones), for toy blocks, pytree states,
and real MMDiT joint blocks, on the 8-device virtual mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.parallel.pp import (
    make_pp_mesh,
    pipeline_apply,
    stack_block_params,
)


def _toy(seed=0, L=8, D=16, B=8):
    rng = np.random.default_rng(seed)
    Ws = jnp.asarray(rng.standard_normal((L, D, D), np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((B, D), np.float32))
    return Ws, x


@pytest.mark.parametrize("stages,n_micro", [(2, 2), (4, 4), (4, 8), (8, 4)])
def test_pipeline_matches_sequential(stages, n_micro):
    Ws, x = _toy()

    def block_fn(w, s):
        return jnp.tanh(s @ w)

    mesh = make_pp_mesh(stages)
    out = pipeline_apply(block_fn, Ws, x, mesh, n_micro=n_micro)
    ref = x
    for i in range(Ws.shape[0]):
        ref = block_fn(Ws[i], ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=2e-6)


def test_pipeline_pytree_state_with_carried_conditioning():
    """State = (h, temb): temb rides the pipeline untouched (the MMDiT/Flux
    pattern where the conditioning vector is an input to every block)."""
    Ws, x = _toy(seed=1)
    temb = jnp.asarray(np.random.default_rng(2).standard_normal(x.shape, np.float32))

    def block_fn(w, st):
        h, t = st
        return (jnp.tanh(h @ w) + t, t)

    mesh = make_pp_mesh(4)
    out_h, out_t = pipeline_apply(block_fn, Ws, (x, temb), mesh, n_micro=2)
    ref_h, ref_t = x, temb
    for i in range(Ws.shape[0]):
        ref_h, ref_t = block_fn(Ws[i], (ref_h, ref_t))
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h), rtol=1e-6, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(ref_t))


def test_pipeline_validates_divisibility():
    Ws, x = _toy(L=6)
    mesh = make_pp_mesh(4)
    with pytest.raises(ValueError, match="not divisible by stages"):
        pipeline_apply(lambda w, s: s @ w, Ws, x, mesh)
    Ws8, x = _toy()
    with pytest.raises(ValueError, match="not divisible by n_micro"):
        pipeline_apply(lambda w, s: s @ w, Ws8, x, mesh, n_micro=3)


def test_pipeline_mmdit_joint_blocks():
    """Pipeline the uniform mid blocks of a real MMDiT over 4 stages and
    check exact agreement with the sequential block loop."""
    from diffusion_uncertainty_tpu.models.mmdit import MMDiTConfig, _JointBlock

    cfg = dataclasses.replace(MMDiTConfig.tiny(), num_layers=8)
    block = _JointBlock(cfg, context_pre_only=False)
    b, s_img, s_txt, dim = 4, 16, 6, cfg.num_attention_heads * cfg.attention_head_dim
    h = jax.random.normal(jax.random.key(0), (b, s_img, dim))
    ctx = jax.random.normal(jax.random.key(1), (b, s_txt, dim))
    temb = jax.random.normal(jax.random.key(2), (b, dim))

    params = {
        f"block_{i}": block.init(jax.random.key(10 + i), h, ctx, temb)["params"]
        for i in range(8)
    }
    stacked = stack_block_params(params, 8)

    def block_fn(bp, st):
        hh, cc, tt = st
        hh, cc = block.apply({"params": bp}, hh, cc, tt)
        return (hh, cc, tt)

    mesh = make_pp_mesh(4)
    out_h, out_c, _ = pipeline_apply(block_fn, stacked, (h, ctx, temb), mesh)

    ref_h, ref_c = h, ctx
    for i in range(8):
        ref_h, ref_c = block.apply({"params": params[f"block_{i}"]}, ref_h, ref_c, temb)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h), rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c), rtol=1e-5, atol=2e-5)


@pytest.mark.parametrize("num_layers", [9, 8])
def test_mmdit_pipeline_forward_matches_apply(num_layers):
    """Full MMDiT forward with the middle blocks pipelined over 4 stages ==
    the plain apply. num_layers=9 -> 8 middle blocks (clean division);
    num_layers=8 -> 7 middle (4 pipelined + 3 replicated remainder)."""
    from diffusion_uncertainty_tpu.models.mmdit import MMDiT, MMDiTConfig
    from diffusion_uncertainty_tpu.parallel.pp import mmdit_pipeline_forward

    cfg = dataclasses.replace(MMDiTConfig.tiny(), num_layers=num_layers)
    model = MMDiT(cfg)
    b, s_txt = 4, 6
    x = jax.random.normal(jax.random.key(0), (b, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    t = jnp.asarray([10.0, 200.0, 500.0, 900.0])
    ehs = jax.random.normal(jax.random.key(1), (b, s_txt, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.key(2), (b, cfg.pooled_projection_dim))
    params = model.init(jax.random.key(3), x, t, ehs, pooled)

    ref = model.apply(params, x, t, ehs, pooled)
    mesh = make_pp_mesh(4)
    out = mmdit_pipeline_forward(cfg, params, x, t, ehs, pooled, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
