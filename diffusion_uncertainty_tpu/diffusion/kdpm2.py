"""KDPM2 (Karras DPM-Solver-2, discrete) sampler as a scan.

Parity target: diffusers ``KDPM2DiscreteScheduler`` — the second plain
baseline the reference times against (``scripts/measure_times_imagenet.py``
compares the uncertainty samplers vs plain DDIM and KDPM2).

Math (Karras et al. 2022, Algorithm 2 / DPM-2 midpoint in σ-space):
interpolated log-σ schedule with a midpoint σ between adjacent steps; each
step runs TWO model evaluations — one at σ_i for the Euler slope, one at the
interpolated σ_mid for the correction — folded here into one scan body (the
reference's stateful two-call ``step`` state machine becomes a single
two-eval body, so the chain stays one compiled loop).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .sampler import ModelFn, SampleResult
from .schedule import NoiseSchedule, spaced_timesteps

__all__ = ["KDPM2Config", "sample_kdpm2"]


@dataclasses.dataclass(frozen=True)
class KDPM2Config:
    num_inference_steps: int = 50
    num_train_timesteps: int = 1000
    timestep_spacing: str = "linspace"
    prediction_type: str = "epsilon"


def _tables(schedule: NoiseSchedule, cfg: KDPM2Config):
    ab = np.asarray(schedule.alphas_cumprod, np.float64)
    all_sigmas = np.sqrt((1 - ab) / ab)
    log_sigmas = np.log(all_sigmas)
    ts = spaced_timesteps(cfg.num_train_timesteps, cfg.num_inference_steps, cfg.timestep_spacing)
    sigmas = np.interp(ts.astype(np.float64), np.arange(len(all_sigmas)), all_sigmas)
    sigmas = np.concatenate([sigmas, [0.0]])  # terminal

    # interpolated midpoint sigmas in log space (diffusers sigmas_interpol)
    with np.errstate(divide="ignore"):
        log_s = np.log(np.maximum(sigmas, 1e-20))
    sig_mid = np.exp(0.5 * (log_s[:-1] + log_s[1:]))
    sig_mid[-1] = 0.0  # last midpoint unused (final step is Euler)

    def sigma_to_t(sig):
        log_sigma = np.log(np.maximum(sig, 1e-10))
        dists = log_sigma[:, None] - log_sigmas[None, :]
        low = np.clip((dists >= 0).cumsum(axis=1).argmax(axis=1), 0, len(log_sigmas) - 2)
        high = low + 1
        w = np.clip((log_sigmas[low] - log_sigma) / (log_sigmas[low] - log_sigmas[high]), 0, 1)
        return (1 - w) * low + w * high

    t_mid = sigma_to_t(sig_mid)
    return ts, sigmas, sig_mid, t_mid


def sample_kdpm2(
    model_fn: ModelFn,
    schedule: NoiseSchedule,
    x_T: jnp.ndarray,  # unit gaussian; scaled internally by sigma_max
    key: jax.Array,
    cfg: KDPM2Config,
) -> SampleResult:
    ts_host, sigmas_h, sig_mid_h, t_mid_h = _tables(schedule, cfg)
    n = cfg.num_inference_steps
    timesteps = jnp.asarray(ts_host, jnp.int32)
    sigmas = jnp.asarray(sigmas_h, jnp.float32)
    sig_mid = jnp.asarray(sig_mid_h, jnp.float32)
    t_mid = jnp.asarray(np.round(t_mid_h).astype(np.int32))

    def to_x0(x_hat, out, sigma):
        # karras sigma-space: x_hat = x0 + sigma*eps; model sees x_hat/sqrt(1+sigma²)
        if cfg.prediction_type == "epsilon":
            return x_hat - sigma * out.astype(jnp.float32)
        if cfg.prediction_type == "sample":
            return out.astype(jnp.float32)
        raise ValueError(cfg.prediction_type)

    def body(carry, i):
        x, k = carry
        k, k1, k2 = jax.random.split(k, 3)
        sigma = sigmas[i]
        sigma_next = sigmas[i + 1]
        sm = sig_mid[i]

        scale = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        out1 = model_fn((x * scale).astype(x.dtype), timesteps[i], k1)
        x0_1 = to_x0(x, out1, sigma)
        d1 = (x - x0_1) / sigma

        # midpoint evaluation (2nd model call; final step falls back to Euler)
        x_mid = x + d1 * (sm - sigma)
        scale_m = 1.0 / jnp.sqrt(sm**2 + 1.0)
        out2 = model_fn((x_mid * scale_m).astype(x.dtype), t_mid[i], k2)
        x0_2 = to_x0(x_mid, out2, sm)
        d2 = (x_mid - x0_2) / jnp.maximum(sm, 1e-10)

        x_next_2nd = x + d2 * (sigma_next - sigma)
        x_next_euler = x + d1 * (sigma_next - sigma)
        next_x = jnp.where(i == n - 1, x_next_euler, x_next_2nd)
        return (next_x.astype(x.dtype), k), None

    x = x_T.astype(jnp.float32) * sigmas[0]  # init scaling (karras convention)
    (x, _), _ = jax.lax.scan(body, (x, key), jnp.arange(n))
    return SampleResult(x.astype(x_T.dtype), None, None, None)
