"""DDIM update rule as pure, scan-friendly functions.

One implementation replaces the block duplicated across all 16 reference
scheduler classes (DDIM eq. 12/16 of arXiv:2010.02502; reference
``schedulers_uncertainty/scheduling_ddim_uncertainty_zigzag_centered.py:461-525``).
All math is float32 regardless of activation dtype; timesteps may be traced
scalars (gathers into the schedule tables), so a single jitted step serves
every inference-step count.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from .schedule import NoiseSchedule

__all__ = ["DiffusionConfig", "DDIMStep", "predict_x0_eps", "ddim_variance", "ddim_step"]


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Static (trace-time) sampler knobs.

    Mirrors the diffusers scheduler config surface the reference exercises
    (``scheduling_*.py:193-238`` ctor args): prediction type, x0 clipping,
    Imagen-style dynamic thresholding, eta, spacing.
    """

    prediction_type: str = "epsilon"  # epsilon | sample | v_prediction
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    eta: float = 0.0
    use_clipped_model_output: bool = False
    timestep_spacing: str = "leading"
    steps_offset: int = 0


class DDIMStep(NamedTuple):
    prev_sample: jnp.ndarray
    pred_original_sample: jnp.ndarray
    pred_epsilon: jnp.ndarray


def predict_x0_eps(
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    alpha_prod_t: jnp.ndarray,
    prediction_type: str = "epsilon",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Convert the network output into (pred_x0, pred_epsilon).

    Parity: reference ``scheduling_*.py:472-486`` (epsilon/sample/v_prediction).
    """
    sample = sample.astype(jnp.float32)
    model_output = model_output.astype(jnp.float32)
    sqrt_ab = jnp.sqrt(alpha_prod_t)
    sqrt_1mab = jnp.sqrt(1.0 - alpha_prod_t)
    if prediction_type == "epsilon":
        x0 = (sample - sqrt_1mab * model_output) / sqrt_ab
        eps = model_output
    elif prediction_type == "sample":
        x0 = model_output
        eps = (sample - sqrt_ab * x0) / sqrt_1mab
    elif prediction_type == "v_prediction":
        x0 = sqrt_ab * sample - sqrt_1mab * model_output
        eps = sqrt_ab * model_output + sqrt_1mab * sample
    else:
        raise ValueError(f"unknown prediction_type: {prediction_type!r}")
    return x0, eps


def _dynamic_threshold(x0: jnp.ndarray, ratio: float, max_value: float) -> jnp.ndarray:
    """Imagen dynamic thresholding (reference ``scheduling_*.py:300-336``):
    clamp each image to [-s, s] at the `ratio` abs-quantile, then divide by s."""
    batch = x0.shape[0]
    flat = jnp.abs(x0.reshape(batch, -1))
    s = jnp.quantile(flat, ratio, axis=1)
    s = jnp.clip(s, 1.0, max_value)
    s = s.reshape((batch,) + (1,) * (x0.ndim - 1))
    return jnp.clip(x0, -s, s) / s


def ddim_variance(
    alpha_prod_t: jnp.ndarray, alpha_prod_t_prev: jnp.ndarray
) -> jnp.ndarray:
    """sigma_t^2 of DDIM eq. 16 (reference ``scheduling_*.py:_get_variance``)."""
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_t_prev = 1.0 - alpha_prod_t_prev
    return (beta_prod_t_prev / beta_prod_t) * (1.0 - alpha_prod_t / alpha_prod_t_prev)


def ddim_step(
    schedule: NoiseSchedule,
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    cfg: DiffusionConfig,
    noise: Optional[jnp.ndarray] = None,
) -> DDIMStep:
    """One deterministic (or eta-stochastic) DDIM update x_t -> x_{t-1}.

    Parity: reference ``scheduling_ddim_uncertainty_zigzag_centered.py:461-525``.
    ``prev_timestep`` is supplied by the caller (= t - T//n in the reference,
    ``:464``); values < 0 resolve to ``final_alpha_cumprod``. When ``cfg.eta>0``
    the caller must pass ``noise``.
    """
    ab_t = schedule.alpha_bar(timestep)
    ab_prev = schedule.alpha_bar(prev_timestep)

    x0, eps = predict_x0_eps(sample, model_output, ab_t, cfg.prediction_type)

    if cfg.thresholding:
        x0 = _dynamic_threshold(x0, cfg.dynamic_thresholding_ratio, cfg.sample_max_value)
    elif cfg.clip_sample:
        x0 = jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)

    std_dev_t = cfg.eta * jnp.sqrt(ddim_variance(ab_t, ab_prev))

    if cfg.use_clipped_model_output:
        # re-derive epsilon from the clipped x0 (Glide convention, ref :506-508)
        eps = (sample.astype(jnp.float32) - jnp.sqrt(ab_t) * x0) / jnp.sqrt(1.0 - ab_t)

    direction = jnp.sqrt(jnp.maximum(1.0 - ab_prev - std_dev_t**2, 0.0)) * eps
    prev_sample = jnp.sqrt(ab_prev) * x0 + direction

    if cfg.eta > 0.0:
        if noise is None:
            raise ValueError("eta > 0 requires variance noise")
        prev_sample = prev_sample + std_dev_t * noise.astype(jnp.float32)

    return DDIMStep(
        prev_sample=prev_sample.astype(sample.dtype),
        pred_original_sample=x0,
        pred_epsilon=eps,
    )
