import numpy as np
import jax.numpy as jnp
import pytest

from diffusion_uncertainty_tpu.diffusion import (
    DiffusionConfig,
    ddim_step,
    ddim_variance,
    ddpm_step,
    make_schedule,
    predict_x0_eps,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule("linear", 1000)


def _numpy_ddim(sched, x, out, t, t_prev, eta=0.0, clip=True):
    """Independent numpy reimplementation of DDIM eq. 12 for golden checking."""
    ab = np.asarray(sched.alphas_cumprod)
    ab_t = ab[t]
    ab_prev = ab[t_prev] if t_prev >= 0 else 1.0
    x0 = (x - np.sqrt(1 - ab_t) * out) / np.sqrt(ab_t)
    if clip:
        x0 = np.clip(x0, -1, 1)
    var = (1 - ab_prev) / (1 - ab_t) * (1 - ab_t / ab_prev)
    std = eta * np.sqrt(var)
    direction = np.sqrt(1 - ab_prev - std**2) * out
    return np.sqrt(ab_prev) * x0 + direction, x0


def test_ddim_step_matches_numpy(sched):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 3).astype(np.float32) * 0.5
    out = rng.randn(2, 4, 4, 3).astype(np.float32)
    cfg = DiffusionConfig(clip_sample=True)
    step = ddim_step(sched, jnp.asarray(x), jnp.asarray(out), jnp.asarray(980), jnp.asarray(960), cfg)
    expected_prev, expected_x0 = _numpy_ddim(sched, x, out, 980, 960)
    np.testing.assert_allclose(np.asarray(step.prev_sample), expected_prev, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(step.pred_original_sample), expected_x0, rtol=2e-5, atol=2e-6)


def test_ddim_step_final_step_uses_final_alpha(sched):
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 2, 1).astype(np.float32) * 0.1
    out = rng.randn(1, 2, 2, 1).astype(np.float32) * 0.1
    cfg = DiffusionConfig(clip_sample=False)
    step = ddim_step(sched, jnp.asarray(x), jnp.asarray(out), jnp.asarray(0), jnp.asarray(-20), cfg)
    # ab_prev = final_alpha_cumprod = 1 -> prev == pred_x0 exactly
    np.testing.assert_allclose(
        np.asarray(step.prev_sample), np.asarray(step.pred_original_sample), rtol=1e-6
    )


def test_prediction_type_conversions(sched):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8).astype(np.float32))
    eps = jnp.asarray(rng.randn(2, 8).astype(np.float32))
    ab = sched.alphas_cumprod[700]
    # construct consistent x from (x0, eps)
    x0_true = jnp.asarray(rng.randn(2, 8).astype(np.float32))
    x_t = jnp.sqrt(ab) * x0_true + jnp.sqrt(1 - ab) * eps

    x0_e, eps_e = predict_x0_eps(x_t, eps, ab, "epsilon")
    np.testing.assert_allclose(np.asarray(x0_e), np.asarray(x0_true), rtol=1e-4, atol=1e-5)

    x0_s, eps_s = predict_x0_eps(x_t, x0_true, ab, "sample")
    np.testing.assert_allclose(np.asarray(eps_s), np.asarray(eps), rtol=1e-4, atol=1e-5)

    v = jnp.sqrt(ab) * eps - jnp.sqrt(1 - ab) * x0_true
    x0_v, eps_v = predict_x0_eps(x_t, v, ab, "v_prediction")
    np.testing.assert_allclose(np.asarray(x0_v), np.asarray(x0_true), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_v), np.asarray(eps), rtol=1e-4, atol=1e-5)


def test_ddim_variance_formula(sched):
    ab = np.asarray(sched.alphas_cumprod)
    v = float(ddim_variance(sched.alphas_cumprod[980], sched.alphas_cumprod[960]))
    expected = (1 - ab[960]) / (1 - ab[980]) * (1 - ab[980] / ab[960])
    assert v == pytest.approx(expected, rel=1e-5)


def test_ddpm_step_posterior_mean(sched):
    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 4, 3).astype(np.float32) * 0.3
    out = rng.randn(1, 4, 4, 3).astype(np.float32)
    cfg = DiffusionConfig(clip_sample=True)
    step = ddpm_step(sched, jnp.asarray(x), jnp.asarray(out), jnp.asarray(500), jnp.asarray(499), cfg)
    ab = np.asarray(sched.alphas_cumprod)
    ab_t, ab_prev = ab[500], ab[499]
    cur_alpha = ab_t / ab_prev
    cur_beta = 1 - cur_alpha
    x0 = np.clip((x - np.sqrt(1 - ab_t) * out) / np.sqrt(ab_t), -1, 1)
    expected = (
        np.sqrt(ab_prev) * cur_beta / (1 - ab_t) * x0
        + np.sqrt(cur_alpha) * (1 - ab_prev) / (1 - ab_t) * x
    )
    np.testing.assert_allclose(np.asarray(step.prev_sample), expected, rtol=2e-4, atol=1e-5)
