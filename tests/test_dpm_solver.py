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


def test_third_order_runs_and_improves_oracle_accuracy(sched):
    """Order-3 chain must run finite and track the oracle trajectory at least
    as well as order-1 at few steps (convergence-order sanity, mirroring the
    reference's third_order_update path)."""
    import dataclasses

    # oracle score for x0 target 0: eps(x,t) = x / sqrt(1 - ab_t) drives x to 0
    def model_fn(x, t, key):
        ab = sched.alpha_bar(t)
        return x / jnp.sqrt(jnp.maximum(1.0 - ab, 1e-8))

    xT = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    errs = {}
    for order in (1, 2, 3):
        cfg = DPMSolverConfig(num_inference_steps=8, solver_order=order, lower_order_final=True)
        res = sample_dpm_solver(model_fn, sched, xT, jax.random.key(1), cfg)
        x = np.asarray(res.sample)
        assert np.isfinite(x).all(), order
        errs[order] = float(np.abs(x).mean())
    # with an exact-score oracle all orders drive x near 0; the higher orders
    # must not blow up and should not be wildly worse than order 1
    assert errs[3] <= 5 * errs[1] + 1e-4, errs


def test_order_table_warmup_and_tail():
    from diffusion_uncertainty_tpu.diffusion.dpm_solver import _tables
    from diffusion_uncertainty_tpu.diffusion.schedule import make_schedule

    sched = make_schedule("linear", 1000)
    cfg = DPMSolverConfig(num_inference_steps=10, solver_order=3)
    *_, order = _tables(sched, cfg)
    # warmup: 1, 2 then 3s; zero terminal sigma forces order-1 (and 2) tail
    assert list(order[:3]) == [1, 2, 3]
    assert order[-1] == 1 and order[-2] == 2


def test_third_order_with_centered_estimator(sched):
    from diffusion_uncertainty_tpu.uncertainty import EstimatorConfig, make_estimator

    est = make_estimator(EstimatorConfig(name="uncertainty_centered", M=2))
    cfg = DPMSolverConfig(num_inference_steps=8, solver_order=3, after_step=3, num_steps_uc=2)
    res = sample_dpm_solver(lambda x, t, k: 0.1 * x, sched, jnp.ones((2, 8, 8, 3)),
                            jax.random.key(2), cfg, estimator=est)
    assert res.uncertainty.shape[0] == 2
    assert np.isfinite(np.asarray(res.uncertainty)).all()
