"""Streamed (host-resident-params) execution == in-HBM forward, exactly.

The streamed executors exist for Flux-dev (11.9B) and SD3.5-large (8.1B),
which exceed one chip's HBM (VERDICT r2 #1); correctness is proven here by
equality against the monolithic flax forward at small configs, since every
block program is the SAME flax module the monolith runs.
"""

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
from diffusion_uncertainty_tpu.pipelines.streamed import (
    StreamedFlux,
    StreamedMMDiT,
    random_flux_params,
    random_mmdit_params,
)


def test_streamed_flux_equals_monolithic():
    cfg = FluxConfig.tiny()
    model = FluxTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(1), (2, 6, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.key(2), (2, cfg.pooled_projection_dim))
    g = jnp.asarray(4000.0)
    params = model.init(jax.random.key(3), x, jnp.asarray(500.0), ctx, pooled, g)

    ref = model.apply(params, x, jnp.asarray(500.0), ctx, pooled, g)
    streamed = StreamedFlux(cfg, params)(x, jnp.asarray(500.0), ctx, pooled, g)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_streamed_flux_no_guidance_variant():
    cfg = dataclasses.replace(FluxConfig.tiny(), guidance_embeds=False)
    model = FluxTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 4, 4, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(1), (1, 3, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.key(2), (1, cfg.pooled_projection_dim))
    params = model.init(jax.random.key(3), x, jnp.asarray(500.0), ctx, pooled, None)
    ref = model.apply(params, x, jnp.asarray(500.0), ctx, pooled, None)
    streamed = StreamedFlux(cfg, params)(x, jnp.asarray(500.0), ctx, pooled, None)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_streamed_mmdit_equals_monolithic():
    cfg = MMDiTConfig.tiny()
    model = MMDiT(cfg)
    s = cfg.sample_size
    x = jax.random.normal(jax.random.key(0), (2, s, s, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(1), (2, 5, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.key(2), (2, cfg.pooled_projection_dim))
    params = model.init(jax.random.key(3), x, jnp.asarray(300.0), ctx, pooled)

    ref = model.apply(params, x, jnp.asarray(300.0), ctx, pooled)
    streamed = StreamedMMDiT(cfg, params)(x, jnp.asarray(300.0), ctx, pooled)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_streamed_mmdit_qk_norm_variant():
    """SD3.5-style RMS-normed q/k blocks stream identically."""
    cfg = dataclasses.replace(MMDiTConfig.tiny(), qk_norm="rms_norm")
    model = MMDiT(cfg)
    s = cfg.sample_size
    x = jax.random.normal(jax.random.key(0), (1, s, s, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(1), (1, 4, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.key(2), (1, cfg.pooled_projection_dim))
    params = model.init(jax.random.key(3), x, jnp.asarray(300.0), ctx, pooled)
    ref = model.apply(params, x, jnp.asarray(300.0), ctx, pooled)
    streamed = StreamedMMDiT(cfg, params)(x, jnp.asarray(300.0), ctx, pooled)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_random_host_params_match_init_structure():
    """random_flux_params/random_mmdit_params build the exact tree the model
    expects (jit-applicable), without any device allocation."""
    cfg = FluxConfig.tiny()
    params = random_flux_params(cfg, seq_txt=3, latent=4, seed=0)
    x = jnp.zeros((1, 4, 4, cfg.in_channels))
    ctx = jnp.zeros((1, 3, cfg.joint_attention_dim))
    pooled = jnp.zeros((1, cfg.pooled_projection_dim))
    out = StreamedFlux(cfg, params)(x, jnp.asarray(100.0), ctx, pooled, jnp.asarray(1000.0))
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())
    # tree matches the monolithic model's init structure exactly
    ref_shapes = jax.eval_shape(
        FluxTransformer(cfg).init, jax.random.key(0), x, jnp.asarray(100.0), ctx, pooled,
        jnp.asarray(1000.0),
    )
    got = jax.tree_util.tree_structure(jax.tree.map(lambda a: 0, params))
    want = jax.tree_util.tree_structure(jax.tree.map(lambda a: 0, ref_shapes))
    assert got == want

    mcfg = MMDiTConfig.tiny()
    mparams = random_mmdit_params(mcfg, seq_txt=4, seed=0)
    xm = jnp.zeros((1, mcfg.sample_size, mcfg.sample_size, mcfg.in_channels))
    cm = jnp.zeros((1, 4, mcfg.joint_attention_dim))
    pm = jnp.zeros((1, mcfg.pooled_projection_dim))
    outm = StreamedMMDiT(mcfg, mparams)(xm, jnp.asarray(100.0), cm, pm)
    assert outm.shape == (1, mcfg.sample_size, mcfg.sample_size, mcfg.out_channels)
    assert bool(jnp.isfinite(outm).all())
    ref_shapes_m = jax.eval_shape(
        MMDiT(mcfg).init, jax.random.key(0), xm, jnp.asarray(100.0), cm, pm
    )
    got_m = jax.tree_util.tree_structure(jax.tree.map(lambda a: 0, mparams))
    want_m = jax.tree_util.tree_structure(jax.tree.map(lambda a: 0, ref_shapes_m))
    assert got_m == want_m


def test_streamed_flux_drives_stepwise_sampler():
    """The streamed executor plugs into sample_flow_match_stepwise as its
    velocity_fn (the host-loop sampler built for these models)."""
    from diffusion_uncertainty_tpu.diffusion.flow_match import (
        FlowMatchConfig,
        sample_flow_match_stepwise,
    )

    cfg = FluxConfig.tiny()
    params = random_flux_params(cfg, seq_txt=3, latent=4, seed=1)
    sf = StreamedFlux(cfg, params)
    ctx = jnp.zeros((1, 3, cfg.joint_attention_dim))
    pooled = jnp.zeros((1, cfg.pooled_projection_dim))
    g = jnp.asarray(1000.0)
    vfn = lambda x, t, key: sf(x, t, ctx, pooled, g)
    fm = FlowMatchConfig(
        num_inference_steps=3, after_step=1, num_steps_uc=1, M=2,
        use_dynamic_shifting=True, image_seq_len=4,
    )
    xT = jax.random.normal(jax.random.key(5), (1, 4, 4, cfg.in_channels))
    res = sample_flow_match_stepwise(vfn, xT, jax.random.key(6), fm)
    assert res.sample.shape == xT.shape
    assert res.uncertainty is not None and bool(jnp.isfinite(res.sample).all())


def test_capability_drive_resumes_recorded_steps(tmp_path):
    """The capability driver skips steps already recorded in steps.jsonl (an
    interrupted multi-hour full-size run must not redo finished forwards)."""
    import json

    from diffusion_uncertainty_tpu.scripts.streamed_t2i_capability import _drive, Config

    cache = tmp_path / "cache"
    out = tmp_path / "out"
    cache.mkdir()
    out.mkdir()
    (cache / "meta.json").write_text(json.dumps({"model": "flux", "n_params": 42}))
    recs = [
        {"step": i, "in_window": i >= 1, "forwards": 1 + (i >= 1),
         "seconds": 10.0 * (i + 1), "sec_per_forward": 5.0, "finite": True}
        for i in range(3)
    ]
    (out / "steps.jsonl").write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    np.savez(out / "state.npz", x=np.zeros((1, 2, 2, 4)), key=np.zeros(2, np.uint32))

    cfg = Config(model="flux", cache_dir=str(cache), out_dir=str(out), num_steps=3)
    assert _drive(cfg, []) == 0  # no subprocess launched: all steps recorded
    summary = json.loads((out / "capability.json").read_text())
    assert summary["steps"] == 3 and summary["forwards"] == 5
    assert summary["total_seconds"] == 60.0 and summary["all_finite"]
