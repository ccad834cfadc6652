"""Sequence parallelism: ring attention over the "seq" axis must equal full
softmax attention to f32 roundoff — it is an exact algorithm, not an
approximation (online-softmax recurrence across chips)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.parallel.sp import make_sp_mesh, ring_attention


def _qkv(seed, b, s, h, d, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(jax.random.normal(k, (b, s, h, d), dtype) for k in ks)


@pytest.mark.parametrize("shards", [2, 4, 8])
def test_ring_attention_matches_full(shards):
    q, k, v = _qkv(0, 2, 32, 4, 8)
    mesh = make_sp_mesh(shards)
    out = ring_attention(q, k, v, mesh)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ring_attention_custom_scale_and_bf16():
    q, k, v = _qkv(1, 1, 64, 2, 16, jnp.bfloat16)
    mesh = make_sp_mesh(4)
    out = ring_attention(q, k, v, mesh, scale=0.5)
    assert out.dtype == jnp.bfloat16
    ref = jax.nn.dot_product_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), scale=0.5
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_ring_attention_rejects_indivisible_sequence():
    q, k, v = _qkv(2, 1, 30, 2, 8)
    mesh = make_sp_mesh(4)
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, mesh)


def test_ring_attention_under_jit_with_sharded_inputs():
    """The shard_map body composes with jit and pre-sharded operands (the way
    a model would call it under a ("data","seq") mesh)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v = _qkv(3, 2, 64, 4, 8)
    mesh = make_sp_mesh(8)
    sh = NamedSharding(mesh, P(None, "seq", None, None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))(qs, ks, vs)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_mmdit_sp_forward_matches_unsharded():
    """Full MMDiT forward with rows+text sharded over 4 devices == the plain
    apply: the ring is exact and the pos-embed crop offsets must line up."""
    from diffusion_uncertainty_tpu.models.mmdit import MMDiT, MMDiTConfig
    from diffusion_uncertainty_tpu.parallel.sp import mmdit_sp_forward

    cfg = MMDiTConfig.tiny()
    model = MMDiT(cfg)
    b, s_txt = 2, 8
    x = jax.random.normal(jax.random.key(0), (b, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    t = jnp.asarray([100.0, 500.0])
    ehs = jax.random.normal(jax.random.key(1), (b, s_txt, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.key(2), (b, cfg.pooled_projection_dim))
    params = model.init(jax.random.key(3), x, t, ehs, pooled)

    ref = model.apply(params, x, t, ehs, pooled)
    mesh = make_sp_mesh(4)
    out = mmdit_sp_forward(cfg, params, x, t, ehs, pooled, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flux_sp_forward_matches_unsharded():
    """Full Flux forward sequence-sharded over 4 devices == the plain apply:
    RoPE row-id offsets + the ring in both block families must be exact."""
    from diffusion_uncertainty_tpu.models.flux import FluxConfig, FluxTransformer
    from diffusion_uncertainty_tpu.parallel.sp import flux_sp_forward

    cfg = FluxConfig.tiny()
    model = FluxTransformer(cfg)
    b, s_txt = 2, 8
    x = jax.random.normal(jax.random.key(0), (b, 8, 8, cfg.in_channels))
    t = jnp.asarray([100.0, 500.0])
    ehs = jax.random.normal(jax.random.key(1), (b, s_txt, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.key(2), (b, cfg.pooled_projection_dim))
    g = jnp.asarray(3.5)
    params = model.init(jax.random.key(3), x, t, ehs, pooled, g)

    ref = model.apply(params, x, t, ehs, pooled, g)
    mesh = make_sp_mesh(4)
    out = flux_sp_forward(cfg, params, x, t, ehs, pooled, mesh, guidance=g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_sp_forward_rejects_indivisible():
    from diffusion_uncertainty_tpu.models.mmdit import MMDiT, MMDiTConfig
    from diffusion_uncertainty_tpu.parallel.sp import mmdit_sp_forward

    cfg = MMDiTConfig.tiny()
    mesh = make_sp_mesh(4)
    x = jnp.zeros((1, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    ehs = jnp.zeros((1, 6, cfg.joint_attention_dim))  # 6 % 4 != 0
    pooled = jnp.zeros((1, cfg.pooled_projection_dim))
    with pytest.raises(ValueError, match="not divisible"):
        mmdit_sp_forward(cfg, {}, x, jnp.asarray(0.0), ehs, pooled, mesh)
