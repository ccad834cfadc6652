"""Flow-matching Euler sampler with uncertainty-guided steps (SD3/Flux family).

Parity target: the reference's SD3/Flux pipelines run diffusers'
``FlowMatchEulerDiscreteScheduler`` and inject the percentile guidance with
``alpha_hat_t := sigmas[i]`` and Flux's t/1000 timestep scaling
(``pipeline_stable_diffusion_3_uncertainty_guided.py:284-297``,
``pipeline_flux_uncertainty.py:46-49,246``, ``uncertainty_guidance.py:95``).

Math: with σ ∈ (1..0] and x_σ = (1−σ)·x0 + σ·ε, the model predicts the
velocity v = ε − x0; Euler step x_{σ'} = x_σ + (σ' − σ)·v. The uncertainty
block re-noises the REFERENCE's way: its ε-space formulas receive σ in the
ᾱ slot (x̂0 = (x − √(1−σ)·v̂)/√σ, x̂_m = √σ·x̂0 + √(1−σ)·n_m,
``uncertainty_guidance.py:87-89``), which simplifies exactly to
``x̂_m = x + √(1−σ)·(n_m − v̂)`` — see ``_ensemble_vs``. M forwards reduce
like the centered/percentile estimators. In gradient (non-posterior) mode
the update is the reference's backprop step — the scalarized ensemble
variance is differentiated through the M re-noised forwards back to the
velocity and ``v' = v + lr·grad·mask`` (``uncertainty_guidance.py:108,122-129``).

Two sigma schedules (both diffusers ``FlowMatchEulerDiscrete``):
  * constant shift (SD3):  σ_i = shift·s/(1+(shift−1)·s)
  * dynamic shift (Flux):  σ_i = e^μ/(e^μ + 1/s − 1) with μ linear in the
    packed image sequence length (``pipeline_flux_uncertainty.py:181-198``,
    diffusers ``calculate_shift``/``FluxPipeline`` defaults).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import uncertainty_window

__all__ = ["FlowMatchConfig", "sample_flow_match", "sample_flow_match_stepwise"]


@dataclasses.dataclass(frozen=True)
class FlowMatchConfig:
    num_inference_steps: int = 28
    num_train_timesteps: int = 1000
    shift: float = 3.0  # SD3 constant timestep shift
    # Flux dynamic shifting (diffusers scheduler config defaults)
    use_dynamic_shifting: bool = False
    image_seq_len: int = 0  # packed token count; required when dynamic
    base_image_seq_len: int = 256
    max_image_seq_len: int = 4096
    base_shift: float = 0.5
    max_shift: float = 1.15
    # uncertainty window
    after_step: int = 0
    num_steps_uc: int = 0
    M: int = 5
    percentile: float = 0.9
    use_posterior: bool = True
    lr: float = 1.0


class FlowMatchResult(NamedTuple):
    sample: jnp.ndarray
    uncertainty: Optional[jnp.ndarray]
    sigmas: Optional[np.ndarray]


def _sigmas(cfg: FlowMatchConfig) -> np.ndarray:
    """Shifted sigma schedule, s from 1 → 1/n plus terminal 0.

    Constant-shift: σ = shift·s/(1+(shift−1)·s). Dynamic (Flux): μ from the
    packed sequence length via the diffusers ``calculate_shift`` line, then
    the exponential time shift σ = e^μ/(e^μ + 1/s − 1)."""
    s = np.linspace(1.0, 1.0 / cfg.num_inference_steps, cfg.num_inference_steps)
    if cfg.use_dynamic_shifting:
        if cfg.image_seq_len <= 0:
            raise ValueError("use_dynamic_shifting requires image_seq_len > 0")
        m = (cfg.max_shift - cfg.base_shift) / (cfg.max_image_seq_len - cfg.base_image_seq_len)
        mu = cfg.image_seq_len * m + (cfg.base_shift - m * cfg.base_image_seq_len)
        sig = math.exp(mu) / (math.exp(mu) + (1.0 / s - 1.0))
    else:
        sig = cfg.shift * s / (1.0 + (cfg.shift - 1.0) * s)
    return np.concatenate([sig, [0.0]]).astype(np.float32)


def _quantile_mask(u: jnp.ndarray, percentile: float) -> jnp.ndarray:
    b = u.shape[0]
    q = jnp.quantile(u.reshape(b, -1), percentile, axis=1).reshape(
        (b,) + (1,) * (u.ndim - 1)
    )
    return (u > q).astype(jnp.float32)


def _ensemble_vs(velocity_fn, xf, v, sigma, t, noises, keys, dtype, sequential, remat=False):
    """M velocity forwards on the reference's re-noised inputs.

    The SD3/Flux pipelines pass ``alpha_hat_t := scheduler.sigmas[i]`` into
    the ε-space formulas (``pipeline_stable_diffusion_3_uncertainty_guided
    .py:295``), so the reference computes x̂0 = (x − √(1−σ)·v̂)/√σ and
    x̂_m = √σ·x̂0 + √(1−σ)·n_m (``uncertainty_guidance.py:87-89``) — which
    simplifies EXACTLY to ``x̂_m = x + √(1−σ)·(n_m − v̂)`` (the √σ cancels;
    this form also avoids the σ→0 division). The gradient path flows through
    v̂ here, like the reference's autograd graph.

    ``sequential`` runs members one-at-a-time (host-loop mode for multi-B
    models); ``remat`` rematerializes each forward on the backward pass."""
    fwd = lambda xh, kk: velocity_fn(xh.astype(dtype), t, kk)
    if remat:
        fwd = jax.checkpoint(fwd)
    root = jnp.sqrt(jnp.maximum(1.0 - sigma, 0.0))
    x_hats = xf[None] + root * (noises - v[None])
    if sequential:
        vs = jnp.stack([fwd(x_hats[m], keys[m]) for m in range(len(keys))])
    else:
        vs = jax.vmap(fwd)(x_hats, keys)
    return vs.astype(jnp.float32)


def _guided_velocity(velocity_fn, x, v, sigma, t, cfg: FlowMatchConfig, k_n, k_e, sequential):
    """Windowed uncertainty update of the velocity (reference
    ``get_uncertainty_guided_score_with_percentile``,
    ``uncertainty_guidance.py:61-131``, with alpha_hat_t := σ as the SD3/Flux
    pipelines pass it). Returns (v_new, u) in f32.

    posterior: precision-weighted reweighting on masked pixels over the
      stacked (M re-noised + original) predictions.
    gradient:  v' = v + lr·(∂/∂v Σ_px mean_b Var_M)·mask — the reference's
      backprop update (``uncertainty_guidance.py:108,122-129``); the ensemble
      variance there is over the M re-noised members only (``:101-103``:
      the original prediction joins the stack only in posterior mode).
    """
    xf = x.astype(jnp.float32)
    noises = jax.random.normal(k_n, (cfg.M,) + v.shape, jnp.float32)
    keys = jax.random.split(k_e, cfg.M)
    dtype = x.dtype

    if cfg.use_posterior:
        vs = _ensemble_vs(velocity_fn, xf, v, sigma, t, noises, keys, dtype, sequential)
        stacked = jnp.concatenate([vs, v[None]], axis=0)
        u = jnp.var(stacked, axis=0, ddof=1)
        inv_var = 1.0 / (u + 1e-20)
        post_prec = 1.0 / (cfg.M * inv_var + 1.0 / jnp.maximum(sigma, 1e-6))
        post_v = post_prec * (inv_var * jnp.sum(stacked, axis=0))
        mask = _quantile_mask(u, cfg.percentile)
        v_new = v * (1.0 - mask) + post_v * mask
    else:

        def scalar_u(vv):
            vs = _ensemble_vs(
                velocity_fn, xf, vv, sigma, t, noises, keys, dtype, sequential, remat=True
            )
            uu = jnp.var(vs, axis=0, ddof=1)
            return jnp.sum(jnp.mean(uu, axis=0)), uu

        grad, u = jax.grad(scalar_u, has_aux=True)(v)
        mask = _quantile_mask(u, cfg.percentile)
        v_new = v + cfg.lr * grad * mask
    return v_new, u


def sample_flow_match(
    velocity_fn: Callable,  # (x, t_scalar, key) -> v  with t = σ·T (SD3 convention)
    x_T: jnp.ndarray,
    key: jax.Array,
    cfg: FlowMatchConfig,
) -> FlowMatchResult:
    sig_host = _sigmas(cfg)
    sigmas = jnp.asarray(sig_host)
    n = cfg.num_inference_steps
    T = cfg.num_train_timesteps

    def plain_body(carry, i):
        x, k = carry
        k, k_m = jax.random.split(k)
        sigma = sigmas[i]
        v = velocity_fn(x, sigma * T, k_m).astype(jnp.float32)
        next_x = x.astype(jnp.float32) + (sigmas[i + 1] - sigma) * v
        return (next_x.astype(x.dtype), k), None

    def window_body(carry, i):
        x, k = carry
        k, k_m, k_n, k_e = jax.random.split(k, 4)
        sigma = sigmas[i]
        t = sigma * T
        v = velocity_fn(x, t, k_m).astype(jnp.float32)
        v_new, u = _guided_velocity(velocity_fn, x, v, sigma, t, cfg, k_n, k_e, sequential=False)
        next_x = x.astype(jnp.float32) + (sigmas[i + 1] - sigma) * v_new
        return (next_x.astype(x.dtype), k), u

    idx = jnp.arange(n)
    if cfg.num_steps_uc <= 0:
        (x, _), _ = jax.lax.scan(plain_body, (x_T, key), idx)
        return FlowMatchResult(x, None, sig_host)

    w0, w1 = uncertainty_window(cfg.after_step, cfg.num_steps_uc, n)
    x = x_T
    uncertainty = None
    for lo, hi, in_w in ((0, w0, False), (w0, w1, True), (w1, n, False)):
        if hi <= lo:
            continue
        if in_w:
            (x, key), uncertainty = jax.lax.scan(window_body, (x, key), idx[lo:hi])
        else:
            (x, key), _ = jax.lax.scan(plain_body, (x, key), idx[lo:hi])
    return FlowMatchResult(x, uncertainty, sig_host[w0:w1])


def sample_flow_match_stepwise(
    velocity_fn: Callable,
    x_T: jnp.ndarray,
    key: jax.Array,
    cfg: FlowMatchConfig,
) -> FlowMatchResult:
    """Host-loop twin of ``sample_flow_match`` for the multi-billion-param
    families (SD3.5-large, Flux): only ``velocity_fn`` needs to be jitted
    (once — reused by plain and ensemble steps), so a 28-step run compiles
    one forward program instead of one whole-loop program. Identical RNG
    stream and update math to the scan version (same split pattern per step;
    ensemble members run sequentially), verified by test."""

    sig_host = _sigmas(cfg)
    sigmas = jnp.asarray(sig_host)
    n = cfg.num_inference_steps
    T = cfg.num_train_timesteps
    w0, w1 = (0, 0)
    if cfg.num_steps_uc > 0:
        w0, w1 = uncertainty_window(cfg.after_step, cfg.num_steps_uc, n)

    x = x_T
    u_list = []
    for i in range(n):
        in_w = w0 <= i < w1
        sigma = sigmas[i]
        t = sigma * T
        if not in_w:
            key, k_m = jax.random.split(key)
            v = velocity_fn(x, t, k_m).astype(jnp.float32)
            x = (x.astype(jnp.float32) + (sigmas[i + 1] - sigma) * v).astype(x_T.dtype)
            continue
        key, k_m, k_n, k_e = jax.random.split(key, 4)
        v = velocity_fn(x, t, k_m).astype(jnp.float32)
        v_new, u = _guided_velocity(velocity_fn, x, v, sigma, t, cfg, k_n, k_e, sequential=True)
        u_list.append(u)
        x = (x.astype(jnp.float32) + (sigmas[i + 1] - sigma) * v_new).astype(x_T.dtype)

    uncertainty = jnp.stack(u_list) if u_list else None
    return FlowMatchResult(x, uncertainty, sig_host[w0:w1] if u_list else sig_host)
