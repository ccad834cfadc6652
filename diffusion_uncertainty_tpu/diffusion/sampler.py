"""Reverse-diffusion sampling as ``jax.lax.scan`` with a static uncertainty window.

The reference runs a Python loop over timesteps, calling a stateful scheduler
whose ``step()`` *holds the UNet* and runs M×zigzag Python-loop forwards inside
the window (``generate_samples.py:159-195``,
``scheduling_ddim_uncertainty_zigzag_centered.py:527-549``). Here the model is
a passed-in pure function and the loop is three scans — pre-window / window /
post-window — so the M-ensemble work is only traced for the window segment
(SURVEY.md §7.1.2) and XLA sees static shapes throughout.

Model function contract:
    model_fn(x, t, key) -> epsilon-like output  (same shape as x)
`t` is a traced int32 scalar (train-timestep value, not step index). `key` is
always provided; deterministic models ignore it (MC-dropout models consume it).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ddim import DiffusionConfig, ddim_step
from .schedule import NoiseSchedule, spaced_timesteps, uncertainty_window

ModelFn = Callable[[jnp.ndarray, jnp.ndarray, jax.Array], jnp.ndarray]

__all__ = ["StepState", "SamplerConfig", "SampleResult", "sample_ddim", "to_uint8"]


class StepState(NamedTuple):
    """Everything an uncertainty estimator / guidance transform may consume
    about the current denoising step (all float32 except ``sample``)."""

    sample: jnp.ndarray  # x_t as fed to the model
    pred_x0: jnp.ndarray  # clipped predicted x_0
    pred_epsilon: jnp.ndarray
    prev_sample: jnp.ndarray  # x_{t-1} from the plain DDIM update
    timestep: jnp.ndarray  # int32 scalar t
    prev_timestep: jnp.ndarray  # int32 scalar t - T//n (may be < 0)


# estimator: (model_fn, schedule, state, key) -> pixel-wise uncertainty map
EstimatorFn = Callable[[ModelFn, NoiseSchedule, StepState, jax.Array], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_inference_steps: int = 50
    num_train_timesteps: int = 1000
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    # uncertainty window (reference ``after_step``/``num_steps_uc``,
    # ``scheduling_*.py:383-384``); num_steps_uc == 0 disables estimation
    after_step: int = 0
    num_steps_uc: int = 0
    # begin the reverse chain at this step index (caller provides x at
    # timesteps[start_step]) — the AUSE protocol denoises from halfway
    # (``compute_ause.py:22-47``)
    start_step: int = 0


class SampleResult(NamedTuple):
    sample: jnp.ndarray  # final x_0-space sample, [B, ...]
    uncertainty: Optional[jnp.ndarray]  # [num_steps_uc, B, ...] or None
    pred_epsilon: Optional[jnp.ndarray]  # [num_steps_uc, B, ...] or None
    window_timesteps: Optional[np.ndarray]  # [num_steps_uc] int32 (host, static)
    intermediates: Optional[jnp.ndarray] = None  # [T, B, ...] per-step x_{t-1}


def _recompute_prev(
    schedule: NoiseSchedule,
    state: StepState,
    new_eps: jnp.ndarray,
    cfg: DiffusionConfig,
) -> jnp.ndarray:
    """Re-derive x_{t-1} after a guidance transform replaced pred_epsilon
    (reference ``predict_x_t1``, ``scheduling_*.py:389-398``)."""
    ab_t = schedule.alpha_bar(state.timestep)
    ab_prev = schedule.alpha_bar(state.prev_timestep)
    x0 = (state.sample.astype(jnp.float32) - jnp.sqrt(1.0 - ab_t) * new_eps) / jnp.sqrt(ab_t)
    if cfg.clip_sample:
        x0 = jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)
    std_dev_t = cfg.eta * jnp.sqrt(
        (1.0 - ab_prev) / (1.0 - ab_t) * (1.0 - ab_t / ab_prev)
    )
    direction = jnp.sqrt(jnp.maximum(1.0 - ab_prev - std_dev_t**2, 0.0)) * new_eps
    return (jnp.sqrt(ab_prev) * x0 + direction).astype(state.sample.dtype)


def sample_ddim(
    model_fn: ModelFn,
    schedule: NoiseSchedule,
    x_T: jnp.ndarray,
    key: jax.Array,
    cfg: SamplerConfig,
    estimator: Optional[EstimatorFn] = None,
    guidance=None,  # Optional[uncertainty.guidance.Guidance]
    collect_intermediates: bool = False,
    estimator_model_fn: Optional[ModelFn] = None,
) -> SampleResult:
    """Run the full reverse chain; jit/pjit-able end to end.

    Call stack parity: ``generate_samples.generate_samples_model_scheduler_
    class_conditioned_from_tensor`` (ref ``generate_samples.py:127-195``) with
    the scheduler-held model replaced by ``model_fn`` and per-step host
    transfers replaced by on-device window accumulation (SURVEY.md §7.1.4).

    ``estimator_model_fn``: the model the ESTIMATOR/guidance ensemble calls,
    when different from the trajectory model. The reference's stochastic
    variants flip the unet into its noisy mode only inside the uncertainty
    block (mc_dropout ``unet.train()``/``eval()``
    ``scheduling_ddim_mc_dropout.py:499,519``; activation-noise hooks
    registered/removed ``scheduling_ddim_uncertainty.py:520-542``) and
    classifier guidance modifies only the trajectory's model output — the
    trajectory forward stays deterministic/plain.
    """
    dcfg = cfg.diffusion
    ts_host = spaced_timesteps(
        cfg.num_train_timesteps, cfg.num_inference_steps, dcfg.timestep_spacing, dcfg.steps_offset
    )
    prev_ts_host = ts_host - cfg.num_train_timesteps // cfg.num_inference_steps
    timesteps = jnp.asarray(ts_host)
    prev_timesteps = jnp.asarray(prev_ts_host)

    def base_step(x: jnp.ndarray, t: jnp.ndarray, t_prev: jnp.ndarray, k: jax.Array):
        k_model, k_eta = jax.random.split(k)
        model_output = model_fn(x, t, k_model)
        noise = (
            jax.random.normal(k_eta, x.shape, jnp.float32) if dcfg.eta > 0.0 else None
        )
        step = ddim_step(schedule, x, model_output, t, t_prev, dcfg, noise=noise)
        return step

    def plain_body(carry, tt):
        x, k = carry
        t, t_prev = tt
        k, k_step = jax.random.split(k)
        step = base_step(x, t, t_prev, k_step)
        ys = step.prev_sample if collect_intermediates else None
        return (step.prev_sample, k), ys

    def window_body(carry, tt):
        x, k, aux = carry
        t, t_prev = tt
        k, k_step, k_est = jax.random.split(k, 3)
        step = base_step(x, t, t_prev, k_step)
        state = StepState(
            sample=x,
            pred_x0=step.pred_original_sample,
            pred_epsilon=step.pred_epsilon,
            prev_sample=step.prev_sample,
            timestep=t,
            prev_timestep=t_prev,
        )
        est_fn = estimator_model_fn if estimator_model_fn is not None else model_fn
        if guidance is not None:
            next_x, u, aux = guidance.apply(est_fn, schedule, state, k_est, aux)
        else:
            u = estimator(est_fn, schedule, state, k_est)
            next_x = step.prev_sample
        ys = next_x if collect_intermediates else None
        return (next_x, k, aux), (u, step.pred_epsilon, ys)

    s0 = cfg.start_step
    if (estimator is None and guidance is None) or cfg.num_steps_uc <= 0:
        (x, _), inter = jax.lax.scan(plain_body, (x_T, key), (timesteps[s0:], prev_timesteps[s0:]))
        return SampleResult(x, None, None, None, inter)

    w0, w1 = uncertainty_window(cfg.after_step, cfg.num_steps_uc, cfg.num_inference_steps)
    w0 = max(w0, s0)
    segments = ((s0, w0, False), (w0, w1, True), (w1, cfg.num_inference_steps, False))

    x = x_T
    aux = guidance.init(x_T) if guidance is not None else jnp.zeros((), jnp.float32)
    uncertainty = pred_eps = None
    inters = []
    for lo, hi, in_window in segments:
        if hi <= lo:
            continue
        xs = (timesteps[lo:hi], prev_timesteps[lo:hi])
        if in_window:
            (x, key, aux), (uncertainty, pred_eps, inter) = jax.lax.scan(window_body, (x, key, aux), xs)
        else:
            (x, key), inter = jax.lax.scan(plain_body, (x, key), xs)
        if collect_intermediates:
            inters.append(inter)

    intermediates = jnp.concatenate(inters, axis=0) if collect_intermediates else None
    return SampleResult(x, uncertainty, pred_eps, ts_host[w0:w1], intermediates)


def sample_ddpm(
    model_fn: ModelFn,
    schedule: NoiseSchedule,
    x_T: jnp.ndarray,
    key: jax.Array,
    cfg: SamplerConfig,
    variance_type: str = "fixed_small",
    estimator: Optional[EstimatorFn] = None,
    estimator_model_fn: Optional[ModelFn] = None,
) -> SampleResult:
    """Ancestral (stochastic) DDPM chain — the plain baseline scheduler family
    (reference ``init_scheduler`` returns DDPMScheduler, ``init_model.py:39,136``).
    Learned-variance models: pass the 6-channel model_fn and
    ``variance_type='learned_range'``; the step consumes the variance channels.
    """
    from .ddpm import ddpm_step

    dcfg = cfg.diffusion
    ts_host = spaced_timesteps(
        cfg.num_train_timesteps, cfg.num_inference_steps, dcfg.timestep_spacing, dcfg.steps_offset
    )
    prev_ts_host = ts_host - cfg.num_train_timesteps // cfg.num_inference_steps
    learned = variance_type in ("learned", "learned_range")

    def body(carry, tt):
        x, k = carry
        t, t_prev = tt
        k, k_m, k_n, k_est = jax.random.split(k, 4)
        out = model_fn(x, t, k_m)
        pred_var = None
        if learned:
            out, pred_var = out[..., : x.shape[-1]], out[..., x.shape[-1] :]
        noise = jax.random.normal(k_n, x.shape, jnp.float32)
        step = ddpm_step(
            schedule, x, out, t, t_prev, dcfg,
            noise=noise, variance_type=variance_type, predicted_variance=pred_var,
        )
        u = None
        if estimator is not None:
            # k_est is split from k_n so the estimator's ensemble draws are
            # independent of the ancestral step noise (round-1 review fix).
            state = StepState(x, step.pred_original_sample, step.pred_epsilon, step.prev_sample, t, t_prev)
            est_fn = estimator_model_fn if estimator_model_fn is not None else model_fn
            u = estimator(est_fn, schedule, state, k_est)
        return (step.prev_sample, k), u

    w0, w1 = (0, 0)
    if estimator is not None and cfg.num_steps_uc > 0:
        w0, w1 = uncertainty_window(cfg.after_step, cfg.num_steps_uc, cfg.num_inference_steps)
    timesteps = jnp.asarray(ts_host)
    prev_timesteps = jnp.asarray(prev_ts_host)
    if estimator is None or cfg.num_steps_uc <= 0:
        (x, _), _ = jax.lax.scan(
            lambda c, tt: (body(c, tt)[0], None), (x_T, key), (timesteps, prev_timesteps)
        )
        return SampleResult(x, None, None, None)
    x = x_T
    uncertainty = None
    for lo, hi, in_w in ((0, w0, False), (w0, w1, True), (w1, cfg.num_inference_steps, False)):
        if hi <= lo:
            continue
        xs = (timesteps[lo:hi], prev_timesteps[lo:hi])
        if in_w:
            (x, key), uncertainty = jax.lax.scan(body, (x, key), xs)
        else:
            (x, key), _ = jax.lax.scan(lambda c, tt: (body(c, tt)[0], None), (x, key), xs)
    return SampleResult(x, uncertainty, None, ts_host[w0:w1])


def to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] floats -> uint8 images (ref ``generate_samples.py:93-105``)."""
    x = jnp.clip(x.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
    # truncating cast matches torch's ``.to(torch.uint8)``
    return (x * 255.0).astype(jnp.uint8)
