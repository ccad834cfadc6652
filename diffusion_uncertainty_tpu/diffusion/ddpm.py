"""DDPM ancestral-sampling update as a pure function.

Parity target: diffusers ``DDPMScheduler.step`` used by the reference as the
plain baseline scheduler (``init_model.py:39-41,136-138``) and the
learned-variance posterior math in the vendored iddpm NLL path
(``metrics/iddpm/gaussian_diffusion.py``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .ddim import DiffusionConfig, predict_x0_eps, _dynamic_threshold
from .schedule import NoiseSchedule

__all__ = ["DDPMStep", "ddpm_step", "posterior_log_variance"]


class DDPMStep(NamedTuple):
    prev_sample: jnp.ndarray
    pred_original_sample: jnp.ndarray
    pred_epsilon: jnp.ndarray


def posterior_log_variance(
    schedule: NoiseSchedule,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    variance_type: str,
    predicted_variance: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """log sigma_t^2 of p(x_{t-1}|x_t) for each diffusers variance family."""
    ab_t = schedule.alpha_bar(timestep)
    ab_prev = schedule.alpha_bar(prev_timestep)
    current_beta_t = 1.0 - ab_t / ab_prev
    variance = jnp.clip((1.0 - ab_prev) / (1.0 - ab_t) * current_beta_t, min=1e-20)

    if variance_type in ("fixed_small", "fixed_small_log"):
        return jnp.log(variance)
    if variance_type == "fixed_large":
        return jnp.log(jnp.clip(current_beta_t, min=1e-20))
    if variance_type in ("learned", "learned_range"):
        if predicted_variance is None:
            raise ValueError(f"{variance_type} needs the model's variance channels")
        if variance_type == "learned":
            return predicted_variance
        # learned_range: interpolate in log space between posterior var and beta_t
        min_log = jnp.log(variance)
        max_log = jnp.log(jnp.clip(current_beta_t, min=1e-20))
        frac = (predicted_variance + 1.0) / 2.0
        return frac * max_log + (1.0 - frac) * min_log
    raise ValueError(f"unknown variance_type: {variance_type!r}")


def ddpm_step(
    schedule: NoiseSchedule,
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    cfg: DiffusionConfig,
    noise: Optional[jnp.ndarray] = None,
    variance_type: str = "fixed_small",
    predicted_variance: Optional[jnp.ndarray] = None,
) -> DDPMStep:
    """One ancestral update x_t -> x_{t-1} (DDPM eq. 7 posterior mean).

    ``noise`` is required whenever ``prev_timestep`` can be >= 0 mid-chain; the
    caller masks it off at the final step (t=0 adds no noise).
    """
    sample_f = sample.astype(jnp.float32)
    ab_t = schedule.alpha_bar(timestep)
    ab_prev = schedule.alpha_bar(prev_timestep)
    beta_prod_t = 1.0 - ab_t
    beta_prod_t_prev = 1.0 - ab_prev
    current_alpha_t = ab_t / ab_prev
    current_beta_t = 1.0 - current_alpha_t

    x0, eps = predict_x0_eps(sample_f, model_output, ab_t, cfg.prediction_type)
    if cfg.thresholding:
        x0 = _dynamic_threshold(x0, cfg.dynamic_thresholding_ratio, cfg.sample_max_value)
    elif cfg.clip_sample:
        x0 = jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)

    x0_coeff = jnp.sqrt(ab_prev) * current_beta_t / beta_prod_t
    xt_coeff = jnp.sqrt(current_alpha_t) * beta_prod_t_prev / beta_prod_t
    prev_mean = x0_coeff * x0 + xt_coeff * sample_f

    if noise is not None:
        log_var = posterior_log_variance(
            schedule, timestep, prev_timestep, variance_type, predicted_variance
        )
        if variance_type == "fixed_small_log":
            std = jnp.exp(0.5 * log_var)
        else:
            std = jnp.sqrt(jnp.exp(log_var))
        # no noise below t=0 / at the chain end
        add = jnp.where(prev_timestep >= 0, 1.0, 0.0)
        prev_mean = prev_mean + add * std * noise.astype(jnp.float32)

    return DDPMStep(
        prev_sample=prev_mean.astype(sample.dtype),
        pred_original_sample=x0,
        pred_epsilon=eps,
    )
