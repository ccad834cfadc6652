"""Gradient-mode percentile guidance: flow-match path vs DDIM path vs torch.

The reference's non-posterior branch backprops the scalarized ensemble
variance to the prediction and applies ``pred + lr*grad*mask``
(``uncertainty_guidance.py:108,122-129``), re-noising via the ε-space
formulas with whatever the caller passes as alpha_hat_t — the SD3/Flux
pipelines pass σ itself (``pipeline_stable_diffusion_3_uncertainty_guided
.py:295``). Those formulas simplify to ``x̂_m = x + sqrt(1-ᾱ)·(n_m − pred)``,
so with ᾱ := σ the DDIM-path guidance and the flow-match path build
IDENTICAL ensembles from identical (x, pred, noises): uncertainty maps and
gradient updates must agree exactly.

A second test checks the flow-match gradient against an independent torch
re-implementation of the reference's backprop — in the reference's own
UNSIMPLIFIED form (divide by sqrt(σ), re-multiply) with torch autograd as
the oracle, which also validates the simplification.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.diffusion.ddim import DiffusionConfig
from diffusion_uncertainty_tpu.diffusion.flow_match import FlowMatchConfig, _guided_velocity
from diffusion_uncertainty_tpu.diffusion.sampler import StepState
from diffusion_uncertainty_tpu.diffusion.schedule import NoiseSchedule
from diffusion_uncertainty_tpu.uncertainty.guidance import make_percentile_guidance, quantile_mask

SIGMA = 0.6
ABAR = SIGMA  # the reference passes sigma straight into the abar slot
ABAR_PREV = 0.9
SHAPE = (2, 4, 4, 3)
M = 4


def _model(x, t, key):
    w = jnp.asarray([0.7, -0.4, 1.2])
    return jnp.tanh(x) * w + 0.3 * x


def _fixed_normal_stub():
    """Deterministic stand-in for jax.random.normal keyed only on shape, so
    the flow and DDIM paths draw identical ensemble noises."""

    def stub(key, shape, dtype=jnp.float32):
        rng = np.random.default_rng(12345 + int(np.prod(shape)))
        return jnp.asarray(rng.standard_normal(shape), dtype)

    return stub


def _toy_schedule():
    ac = np.ones(10, np.float32)
    ac[5] = ABAR
    ac[4] = ABAR_PREV
    return NoiseSchedule(
        betas=jnp.zeros(10, jnp.float32),
        alphas_cumprod=jnp.asarray(ac),
        final_alpha_cumprod=jnp.asarray(1.0, jnp.float32),
    )


def test_flow_match_gradient_agrees_with_ddim_gradient(monkeypatch):
    monkeypatch.setattr(jax.random, "normal", _fixed_normal_stub())

    x = jnp.asarray(np.random.default_rng(7).standard_normal(SHAPE) * 0.1, jnp.float32)
    pred = jnp.asarray(np.random.default_rng(17).standard_normal(SHAPE), jnp.float32)
    lr, percentile = 1.0, 0.7

    # flow-match gradient update
    fm = FlowMatchConfig(M=M, percentile=percentile, use_posterior=False, lr=lr)
    v_new, u_f = _guided_velocity(
        _model, x, pred, SIGMA, jnp.asarray(600.0), fm,
        jax.random.key(1), jax.random.key(2), sequential=False,
    )

    # DDIM-path gradient update through the guidance factory (abar == sigma)
    sched = _toy_schedule()
    state = StepState(
        sample=x, pred_x0=jnp.zeros_like(x), pred_epsilon=pred,
        prev_sample=x, timestep=jnp.asarray(5), prev_timestep=jnp.asarray(4),
    )
    dcfg = DiffusionConfig(clip_sample=False)
    g = make_percentile_guidance(
        M=M, percentile=percentile, use_posterior=False, lr=lr, dcfg=dcfg
    )
    next_x, u_d, _ = g.apply(_model, sched, state, jax.random.key(3), jnp.zeros(()))

    # identical re-noised ensembles -> identical uncertainty maps
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_d), rtol=1e-5, atol=1e-7)

    # invert the DDIM eq.12 update (eta=0, no clipping) to recover new_eps
    coef_x = np.sqrt(ABAR_PREV / ABAR)
    denom = np.sqrt(1.0 - ABAR_PREV) - np.sqrt(ABAR_PREV * (1.0 - ABAR) / ABAR)
    eps_new = (np.asarray(next_x, np.float64) - coef_x * np.asarray(x, np.float64)) / denom

    # x̂ = x + sqrt(1-abar)(n - pred) on BOTH paths -> identical gradients
    dv = np.asarray(v_new - pred, np.float64)
    de = eps_new - np.asarray(pred, np.float64)
    np.testing.assert_allclose(dv, de, rtol=1e-4, atol=1e-6)


def test_flow_match_gradient_matches_torch_backprop(monkeypatch):
    torch = pytest.importorskip("torch")
    monkeypatch.setattr(jax.random, "normal", _fixed_normal_stub())

    x = jnp.asarray(np.random.default_rng(8).standard_normal(SHAPE), jnp.float32)
    v = jnp.asarray(np.random.default_rng(9).standard_normal(SHAPE), jnp.float32)
    lr, percentile = 0.5, 0.6
    fm = FlowMatchConfig(M=M, percentile=percentile, use_posterior=False, lr=lr)
    v_new, u = _guided_velocity(
        _model, x, v, SIGMA, jnp.asarray(600.0), fm,
        jax.random.key(1), jax.random.key(2), sequential=False,
    )

    # torch oracle: the reference's backprop (uncertainty_guidance.py:85-108)
    # in its own UNSIMPLIFIED alpha_hat_t := sigma form, with the SAME noises
    noises = np.asarray(_fixed_normal_stub()(None, (M,) + SHAPE))
    xt = torch.tensor(np.asarray(x), dtype=torch.float64)
    vt = torch.tensor(np.asarray(v), dtype=torch.float64, requires_grad=True)
    w = torch.tensor([0.7, -0.4, 1.2], dtype=torch.float64)
    import math

    x0 = (xt - math.sqrt(1.0 - SIGMA) * vt) / math.sqrt(SIGMA)
    vs = []
    for m in range(M):
        xh = math.sqrt(SIGMA) * x0 + math.sqrt(1.0 - SIGMA) * torch.tensor(
            noises[m], dtype=torch.float64
        )
        vs.append(torch.tanh(xh) * w + 0.3 * xh)
    vs = torch.stack(vs, dim=0)
    ut = torch.var(vs, dim=0, correction=1)
    ut.mean(dim=0).sum().backward()
    grad_t = vt.grad.numpy()

    np.testing.assert_allclose(np.asarray(u), ut.detach().numpy(), rtol=1e-4, atol=1e-6)
    mask = np.asarray(quantile_mask(u, percentile))
    np.testing.assert_allclose(
        np.asarray(v_new, np.float64), np.asarray(v) + lr * grad_t * mask,
        rtol=1e-4, atol=1e-6,
    )


def test_flow_match_stepwise_gradient_equals_scan():
    """sequential=True (host-loop mode) and the vmapped scan branch compute
    the same gradient update."""
    x = jnp.asarray(np.random.default_rng(10).standard_normal(SHAPE), jnp.float32)
    v = jnp.asarray(np.random.default_rng(11).standard_normal(SHAPE), jnp.float32)
    fm = FlowMatchConfig(M=3, percentile=0.5, use_posterior=False, lr=0.3)
    args = (_model, x, v, SIGMA, jnp.asarray(600.0), fm, jax.random.key(1), jax.random.key(2))
    v_a, u_a = _guided_velocity(*args, sequential=False)
    v_b, u_b = _guided_velocity(*args, sequential=True)
    np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u_a), np.asarray(u_b), rtol=1e-5, atol=1e-6)
