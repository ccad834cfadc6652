import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.diffusion import (
    DiffusionConfig,
    SamplerConfig,
    make_schedule,
    sample_ddim,
    to_uint8,
)
from diffusion_uncertainty_tpu.uncertainty import EstimatorConfig, make_estimator

SHAPE = (2, 8, 8, 3)


@pytest.fixture(scope="module")
def sched():
    return make_schedule("linear", 1000)


def test_plain_ddim_recovers_x0_with_oracle_model(sched):
    """If the model returns the exact forward noise, DDIM must recover x0."""
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.uniform(k1, SHAPE, minval=-0.9, maxval=0.9)
    eps = jax.random.normal(k2, SHAPE)
    x_T = sched.add_noise(x0, eps, jnp.asarray(980))

    model_fn = lambda x, t, k: eps  # oracle
    cfg = SamplerConfig(num_inference_steps=50, diffusion=DiffusionConfig(clip_sample=True))
    res = sample_ddim(model_fn, sched, x_T, jax.random.key(1), cfg)
    np.testing.assert_allclose(np.asarray(res.sample), np.asarray(x0), atol=2e-3)
    assert res.uncertainty is None


def test_sampler_is_jittable_and_deterministic(sched):
    model_fn = lambda x, t, k: 0.1 * x
    cfg = SamplerConfig(num_inference_steps=10)
    f = jax.jit(
        lambda xT, key: sample_ddim(model_fn, sched, xT, key, cfg).sample
    )
    xT = jax.random.normal(jax.random.key(2), SHAPE)
    a = f(xT, jax.random.key(3))
    b = f(xT, jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_window_collects_uncertainty_maps(sched):
    model_fn = lambda x, t, k: jnp.zeros_like(x)
    est = make_estimator(EstimatorConfig(name="uncertainty_centered", M=3))
    cfg = SamplerConfig(num_inference_steps=20, after_step=5, num_steps_uc=4)
    res = sample_ddim(
        model_fn, sched, jnp.ones(SHAPE), jax.random.key(0), cfg, estimator=est
    )
    assert res.uncertainty is not None
    assert res.uncertainty.shape == (4,) + SHAPE
    assert res.pred_epsilon.shape == (4,) + SHAPE
    # window timesteps are the reference's timesteps[after_step : after_step+num_uc]
    ts = res.window_timesteps
    assert len(ts) == 4
    assert ts[0] > ts[-1]
    # model outputs 0 -> pred_eps == 0 -> centered u == mean (0-0)^2 == 0
    np.testing.assert_allclose(np.asarray(res.uncertainty), 0.0, atol=1e-12)


def test_window_uncertainty_nonzero_for_nontrivial_model(sched):
    model_fn = lambda x, t, k: 0.5 * x  # scores depend on the re-noised input
    est = make_estimator(EstimatorConfig(name="uncertainty_centered", M=4))
    cfg = SamplerConfig(num_inference_steps=10, after_step=2, num_steps_uc=3)
    res = sample_ddim(
        model_fn, sched, jnp.ones(SHAPE) * 0.5, jax.random.key(0), cfg, estimator=est
    )
    assert float(jnp.mean(res.uncertainty)) > 0.0


def test_eta_stochastic_path(sched):
    model_fn = lambda x, t, k: 0.1 * x
    cfg = SamplerConfig(
        num_inference_steps=10, diffusion=DiffusionConfig(eta=1.0)
    )
    xT = jax.random.normal(jax.random.key(4), SHAPE)
    a = sample_ddim(model_fn, sched, xT, jax.random.key(5), cfg).sample
    b = sample_ddim(model_fn, sched, xT, jax.random.key(6), cfg).sample
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_to_uint8():
    x = jnp.asarray([-1.5, -1.0, 0.0, 1.0, 2.0])
    out = np.asarray(to_uint8(x))
    np.testing.assert_array_equal(out, [0, 0, 127, 255, 255])


def test_collect_intermediates(sched):
    model_fn = lambda x, t, k: 0.1 * x
    cfg = SamplerConfig(num_inference_steps=10, after_step=4, num_steps_uc=3)
    from diffusion_uncertainty_tpu.uncertainty import EstimatorConfig, make_estimator

    est = make_estimator(EstimatorConfig(name="uncertainty_centered", M=2))
    res = sample_ddim(
        model_fn, sched, jnp.ones(SHAPE), jax.random.key(0), cfg,
        estimator=est, collect_intermediates=True,
    )
    assert res.intermediates.shape == (10,) + SHAPE
    # last intermediate must equal the final sample
    np.testing.assert_array_equal(np.asarray(res.intermediates[-1]), np.asarray(res.sample))

    res_plain = sample_ddim(
        model_fn, sched, jnp.ones(SHAPE), jax.random.key(0),
        SamplerConfig(num_inference_steps=10), collect_intermediates=True,
    )
    assert res_plain.intermediates.shape == (10,) + SHAPE


def test_sample_ddpm_ancestral(sched):
    from diffusion_uncertainty_tpu.diffusion.sampler import sample_ddpm

    model_fn = lambda x, t, k: 0.1 * x
    cfg = SamplerConfig(num_inference_steps=10)
    a = sample_ddpm(model_fn, sched, jnp.ones(SHAPE), jax.random.key(0), cfg).sample
    b = sample_ddpm(model_fn, sched, jnp.ones(SHAPE), jax.random.key(1), cfg).sample
    assert not np.allclose(np.asarray(a), np.asarray(b))  # ancestral = stochastic
    assert np.isfinite(np.asarray(a)).all()


def test_sample_ddpm_learned_variance(sched):
    from diffusion_uncertainty_tpu.diffusion.sampler import sample_ddpm

    def model6(x, t, k):
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=-1)

    cfg = SamplerConfig(num_inference_steps=8)
    res = sample_ddpm(model6, sched, jnp.ones(SHAPE), jax.random.key(2), cfg, variance_type="learned_range")
    assert res.sample.shape == SHAPE
    assert np.isfinite(np.asarray(res.sample)).all()


def test_sample_ddpm_with_estimator(sched):
    from diffusion_uncertainty_tpu.diffusion.sampler import sample_ddpm
    from diffusion_uncertainty_tpu.uncertainty import EstimatorConfig, make_estimator

    est = make_estimator(EstimatorConfig(name="uncertainty_centered", M=2))
    cfg = SamplerConfig(num_inference_steps=8, after_step=3, num_steps_uc=2)
    res = sample_ddpm(lambda x, t, k: 0.1 * x, sched, jnp.ones(SHAPE), jax.random.key(3), cfg, estimator=est)
    assert res.uncertainty.shape == (2,) + SHAPE


def test_sample_ddpm_estimator_key_independent_of_step_noise(sched):
    """Regression: the estimator must receive a key split from (not equal to)
    the ancestral-noise key, so ensemble draws and step noise are independent
    (round-1 review: sampler.py passed k_n to both)."""
    from diffusion_uncertainty_tpu.diffusion.sampler import sample_ddpm

    # Estimator that simply re-emits normal(key) — lets us recover the key it
    # was handed by comparing against the expected split chain.
    def key_probe(model_fn, schedule, state, key):
        return jax.random.normal(key, state.sample.shape, jnp.float32)

    key0 = jax.random.key(7)
    cfg = SamplerConfig(num_inference_steps=1, after_step=0, num_steps_uc=1)
    res = sample_ddpm(lambda x, t, k: 0.1 * x, sched, jnp.ones(SHAPE), key0, cfg,
                      estimator=key_probe)

    _, k_m, k_n, k_est = jax.random.split(key0, 4)
    expected = jax.random.normal(k_est, SHAPE, jnp.float32)
    step_noise = jax.random.normal(k_n, SHAPE, jnp.float32)
    np.testing.assert_allclose(np.asarray(res.uncertainty[0]), np.asarray(expected))
    assert not np.allclose(np.asarray(res.uncertainty[0]), np.asarray(step_noise))
