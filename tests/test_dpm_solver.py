import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.diffusion import make_schedule
from diffusion_uncertainty_tpu.diffusion.dpm_solver import DPMSolverConfig, sample_dpm_solver
from diffusion_uncertainty_tpu.uncertainty import EstimatorConfig, make_estimator

SHAPE = (2, 8, 8, 3)


@pytest.fixture(scope="module")
def sched():
    return make_schedule("linear", 1000)


def test_dpm_recovers_x0_with_oracle_model(sched):
    """Constant-epsilon oracle: dpmsolver++ with final sigma 0 must land on x0."""
    k1, k2 = jax.random.split(jax.random.key(0))
    x0 = jax.random.uniform(k1, SHAPE, minval=-0.8, maxval=0.8)
    eps = jax.random.normal(k2, SHAPE)
    ab = sched.alphas_cumprod[999]
    x_T = jnp.sqrt(ab) * x0 + jnp.sqrt(1 - ab) * eps

    cfg = DPMSolverConfig(num_inference_steps=20)
    res = sample_dpm_solver(lambda x, t, k: eps, sched, x_T, jax.random.key(1), cfg)
    np.testing.assert_allclose(np.asarray(res.sample), np.asarray(x0), atol=5e-3)


def test_dpm_order1_vs_order2_differ_but_close(sched):
    model_fn = lambda x, t, k: 0.5 * x
    xT = jax.random.normal(jax.random.key(2), SHAPE)
    r1 = sample_dpm_solver(model_fn, sched, xT, jax.random.key(3), DPMSolverConfig(num_inference_steps=15, solver_order=1))
    r2 = sample_dpm_solver(model_fn, sched, xT, jax.random.key(3), DPMSolverConfig(num_inference_steps=15, solver_order=2))
    a, b = np.asarray(r1.sample), np.asarray(r2.sample)
    assert not np.allclose(a, b)
    assert np.isfinite(a).all() and np.isfinite(b).all()


def test_dpm_second_order_more_accurate_than_first(sched):
    """On the analytically-solvable constant-eps ODE, order 2 at few steps
    should not be worse than order 1."""
    k1, k2 = jax.random.split(jax.random.key(4))
    x0 = jax.random.uniform(k1, SHAPE, minval=-0.8, maxval=0.8)
    eps = jax.random.normal(k2, SHAPE)
    ab = sched.alphas_cumprod[999]
    x_T = jnp.sqrt(ab) * x0 + jnp.sqrt(1 - ab) * eps
    model_fn = lambda x, t, k: eps

    def err(order):
        cfg = DPMSolverConfig(num_inference_steps=6, solver_order=order)
        res = sample_dpm_solver(model_fn, sched, x_T, jax.random.key(5), cfg)
        return float(jnp.abs(res.sample - x0).max())

    assert err(2) <= err(1) + 1e-5


def test_dpm_uncertainty_window(sched):
    model_fn = lambda x, t, k: 0.3 * x
    est = make_estimator(EstimatorConfig(name="uncertainty_centered", M=3))
    cfg = DPMSolverConfig(num_inference_steps=12, after_step=4, num_steps_uc=4)
    res = sample_dpm_solver(model_fn, sched, jnp.ones(SHAPE), jax.random.key(6), cfg, estimator=est)
    assert res.uncertainty.shape == (4,) + SHAPE
    assert bool(jnp.all(jnp.isfinite(res.sample)))
    assert float(res.uncertainty.mean()) > 0


def test_dpm_karras_sigmas(sched):
    model_fn = lambda x, t, k: 0.3 * x
    cfg = DPMSolverConfig(num_inference_steps=10, use_karras_sigmas=True)
    res = sample_dpm_solver(model_fn, sched, jnp.ones(SHAPE), jax.random.key(7), cfg)
    assert bool(jnp.all(jnp.isfinite(res.sample)))


def test_dpm_jittable(sched):
    model_fn = lambda x, t, k: 0.2 * x
    cfg = DPMSolverConfig(num_inference_steps=8)
    f = jax.jit(lambda x, k: sample_dpm_solver(model_fn, sched, x, k, cfg).sample)
    out = f(jnp.ones(SHAPE), jax.random.key(8))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(f(jnp.ones(SHAPE), jax.random.key(8))))
