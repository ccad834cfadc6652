import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.diffusion import (
    DiffusionConfig,
    SamplerConfig,
    make_schedule,
    sample_ddim,
)
from diffusion_uncertainty_tpu.uncertainty import EstimatorConfig
from diffusion_uncertainty_tpu.uncertainty.guidance import (
    make_mask_guidance,
    make_mc_dropout_gradient_guidance,
    make_model_gradient_guidance,
    make_percentile_guidance,
    make_second_order_guidance,
    make_threshold_guidance,
    quantile_mask,
    threshold_mask,
)

SHAPE = (2, 8, 8, 3)


@pytest.fixture(scope="module")
def sched():
    return make_schedule("linear", 1000)


def run(guidance, sched, model_fn=None, steps=10, after=2, n_uc=3):
    if model_fn is None:
        model_fn = lambda x, t, k: 0.2 * x
    cfg = SamplerConfig(num_inference_steps=steps, after_step=after, num_steps_uc=n_uc)
    xT = jax.random.normal(jax.random.key(0), SHAPE)
    return sample_ddim(model_fn, sched, xT, jax.random.key(1), cfg, guidance=guidance)


def test_quantile_mask_fraction():
    u = jax.random.uniform(jax.random.key(0), (4, 16, 16, 3))
    m = quantile_mask(u, 0.9)
    # ~10% of pixels above the 0.9 per-image quantile
    frac = np.asarray(m.mean(axis=(1, 2, 3)))
    np.testing.assert_allclose(frac, 0.1, atol=0.01)
    m_low = quantile_mask(u, 0.9, mode="lower")
    np.testing.assert_allclose(np.asarray(m_low.mean()), 0.9, atol=0.01)


def test_threshold_mask_broadcast():
    u = jnp.ones((2, 4, 4, 1)) * jnp.asarray([0.0, 1.0]).reshape(2, 1, 1, 1)
    thr = jnp.full((4, 4, 1), 0.5)
    m = threshold_mask(u, thr)
    assert float(m[0].sum()) == 0.0
    assert float(m[1].sum()) == 16.0


def test_percentile_posterior_guidance_changes_trajectory(sched):
    res_plain = run(None, sched)
    res_guided = run(make_percentile_guidance(M=3, percentile=0.8), sched)
    assert res_guided.uncertainty is not None
    assert res_guided.uncertainty.shape == (3,) + SHAPE
    assert not np.allclose(np.asarray(res_plain.sample), np.asarray(res_guided.sample))
    assert bool(jnp.all(jnp.isfinite(res_guided.sample)))


def test_percentile_gradient_guidance(sched):
    res = run(make_percentile_guidance(M=3, percentile=0.8, use_posterior=False, lr=0.5), sched)
    assert bool(jnp.all(jnp.isfinite(res.sample)))
    assert float(res.uncertainty.mean()) >= 0


def test_threshold_guidance_per_step_maps(sched):
    # per-window-step pixel-wise thresholds [num_steps_uc, H, W, C]
    thr = jnp.full((3, 8, 8, 3), 1e-6)
    res = run(make_threshold_guidance(M=3, threshold=thr), sched)
    assert bool(jnp.all(jnp.isfinite(res.sample)))


def test_threshold_guidance_short_table_raises(sched):
    """ADVICE r4 regression: a per-step table too short for the guidance
    window must raise at build time — JAX's clamp-indexing gather would
    otherwise silently reuse the last row (the reference asserts
    ``threshold.shape[0] == timesteps.shape[0]``,
    ``...posterior_distribution.py:121-122``)."""
    thr_short = jnp.full((3, 8, 8, 3), 1e-6)
    with pytest.raises(ValueError, match="threshold table"):
        make_threshold_guidance(
            M=3, threshold=thr_short, step_index_offset=2, num_window_steps=3
        )
    with pytest.raises(ValueError, match="threshold table"):
        make_second_order_guidance(
            M=3, threshold=thr_short, step_index_offset=2, num_window_steps=3
        )
    # a global-step-length table with the same window builds and runs
    thr_full = jnp.full((10, 8, 8, 3), 1e-6)
    res = run(
        make_threshold_guidance(
            M=3, threshold=thr_full, step_index_offset=2, num_window_steps=3
        ),
        sched,
    )
    assert bool(jnp.all(jnp.isfinite(res.sample)))


def test_mask_guidance_binary_and_multiscale(sched):
    est = EstimatorConfig(name="infer_noise", M=3)
    for mode in ("binary", "multiscale"):
        g = make_mask_guidance(est, mode=mode, threshold=0.0)
        res = run(g, sched)
        assert bool(jnp.all(jnp.isfinite(res.sample))), mode


def test_mc_dropout_gradient_guidance(sched):
    def model_fn(x, t, k):
        # key-dependent stochastic model so the dropout variance has a gradient
        return 0.2 * x * (1.0 + 0.01 * jax.random.normal(k, ()))

    res = run(make_mc_dropout_gradient_guidance(M=3), sched, model_fn=model_fn)
    assert bool(jnp.all(jnp.isfinite(res.sample)))


def test_model_gradient_guidance(sched):
    res = run(make_model_gradient_guidance(M=3, lr=0.01), sched)
    assert bool(jnp.all(jnp.isfinite(res.sample)))


def test_second_order_guidance_momentum_carry(sched):
    res = run(make_second_order_guidance(M=3, threshold=0.8), sched)
    assert bool(jnp.all(jnp.isfinite(res.sample)))
    assert res.uncertainty.shape == (3,) + SHAPE


def test_posterior_score_reduces_to_eps_at_zero_uncertainty(sched):
    """With a deterministic model on deterministic inputs, ensemble variance is
    driven by re-noising only; with a constant model output the stack is
    constant -> u ~ 0 -> posterior math must stay finite via guarded recompute."""
    const = jnp.ones(SHAPE) * 0.1
    model_fn = lambda x, t, k: const
    res = run(make_percentile_guidance(M=3, percentile=0.5), sched, model_fn=model_fn)
    assert bool(jnp.all(jnp.isfinite(res.sample)))
