"""Generic DDPM/DDIM training losses and train step.

Parity target: the reference's lucidrains-style trainer
(``gaussian_diffusion.py:409-548``): epsilon / x0 / v objectives, min-SNR-γ
loss weighting, offset noise, plus the learned-variance hybrid loss of
``LearnedGaussianDiffusion`` (VLB term on the variance channels with the mean
branch stopped, iddpm-style). Pure functions + optax; data-parallel via jit
shardings like the rest of the framework.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

import numpy as np

from ..diffusion.schedule import NoiseSchedule
from ..metrics.nll import discretized_gaussian_log_likelihood, normal_kl
from .resample import SamplerState, init_sampler_state, sample_timesteps, update_sampler_state

__all__ = ["DDPMTrainConfig", "p_losses", "make_train_step"]


@dataclasses.dataclass(frozen=True)
class DDPMTrainConfig:
    objective: str = "pred_noise"  # pred_noise | pred_x0 | pred_v
    min_snr_gamma: Optional[float] = None  # e.g. 5.0 enables min-SNR weighting
    offset_noise_strength: float = 0.0
    learned_variance: bool = False  # hybrid VLB loss on the extra channels
    # iddpm LossType.MSE adds the vb term at weight 1 (RESCALED_MSE uses
    # T/1000 — pass that here for the rescaled variant)
    vlb_weight: float = 1.0
    lr: float = 1e-4
    # iddpm create_named_schedule_sampler (resample.py:8-20):
    # "uniform" | "loss-second-moment" (importance-sample t by the loss
    # history, scale per-example losses by 1/(T·p[t]))
    schedule_sampler: str = "uniform"
    sampler_history_per_term: int = 10
    sampler_uniform_prob: float = 0.001
    # EMA parameter copies, one per rate (iddpm TrainLoop ema_rate — default
    # "0.9999", comma-list allowed — updated as ema += (1-rate)(p - ema) per
    # step, iddpm nn.update_ema; samplers consume the EMA weights). Empty
    # tuple disables.
    ema_rates: tuple = ()


def _loss_weight(schedule: NoiseSchedule, cfg: DDPMTrainConfig) -> jnp.ndarray:
    """Per-timestep MSE weight (reference ``gaussian_diffusion.py`` loss_weight):
    snr = ᾱ/(1−ᾱ); pred_noise: w = min(snr,γ)/snr; pred_x0: w = min(snr,γ);
    pred_v: w = min(snr,γ)/(snr+1). Without min-SNR, the standard constants."""
    ab = schedule.alphas_cumprod
    snr = ab / (1.0 - ab)
    capped = jnp.minimum(snr, cfg.min_snr_gamma) if cfg.min_snr_gamma else snr
    if cfg.objective == "pred_noise":
        return capped / snr
    if cfg.objective == "pred_x0":
        return capped
    if cfg.objective == "pred_v":
        return capped / (snr + 1.0)
    raise ValueError(cfg.objective)


def p_losses(
    model_apply: Callable,  # (params, x_t, t, y) -> out [B,H,W,C or 2C]
    params: Any,
    schedule: NoiseSchedule,
    x_start: jnp.ndarray,
    t: jnp.ndarray,  # [B] int32
    key: jax.Array,
    cfg: DDPMTrainConfig,
    y: Optional[jnp.ndarray] = None,
    per_example: bool = False,
) -> jnp.ndarray:
    k_noise, k_off = jax.random.split(key)
    noise = jax.random.normal(k_noise, x_start.shape, jnp.float32)
    if cfg.offset_noise_strength > 0:
        off = jax.random.normal(k_off, x_start.shape[:1] + (1, 1, x_start.shape[-1]), jnp.float32)
        noise = noise + cfg.offset_noise_strength * off

    ab = schedule.alpha_bar(t).reshape((-1,) + (1,) * (x_start.ndim - 1))
    x_t = jnp.sqrt(ab) * x_start + jnp.sqrt(1.0 - ab) * noise

    out = model_apply(params, x_t, t, y).astype(jnp.float32)
    c = x_start.shape[-1]
    var_raw = None
    if cfg.learned_variance:
        out, var_raw = out[..., :c], out[..., c:]

    if cfg.objective == "pred_noise":
        target = noise
    elif cfg.objective == "pred_x0":
        target = x_start
    elif cfg.objective == "pred_v":
        target = jnp.sqrt(ab) * noise - jnp.sqrt(1.0 - ab) * x_start
    else:
        raise ValueError(cfg.objective)

    mse = jnp.mean((out - target) ** 2, axis=tuple(range(1, x_start.ndim)))
    weight = _loss_weight(schedule, cfg)[jnp.clip(t, 0, schedule.num_train_timesteps - 1)]
    per_ex = mse * weight

    if cfg.learned_variance:
        # iddpm hybrid loss (vendored guided_diffusion/gaussian_diffusion.py:
        # 710-745): the FULL _vb_terms_bpd with the mean branch frozen —
        # stop_gradient freezes the mean's gradient, but the mean VALUES still
        # differ from the q-posterior mean, so the KL's (Δmean)²/σ² term
        # contributes to the variance gradient; t=0 takes the discretized
        # decoder NLL instead of the KL. Oracle-pinned by
        # utils.activation_diff.training_loss_diff.
        if cfg.objective != "pred_noise":
            raise ValueError("learned_variance hybrid loss requires pred_noise objective")
        eps_frozen = jax.lax.stop_gradient(out)
        ab_full = schedule.alphas_cumprod
        ab_prev = jnp.concatenate([jnp.ones((1,), jnp.float32), ab_full[:-1]])
        betas = schedule.betas
        post_var = betas * (1.0 - ab_prev) / (1.0 - ab_full)
        # iddpm's posterior_log_variance_clipped (t=0 entry replaced)
        post_logvar_clipped = jnp.log(
            jnp.concatenate([post_var[1:2], post_var[1:]])
        )
        x0_coeff = (jnp.sqrt(ab_prev) * betas / (1.0 - ab_full))[t].reshape(ab.shape)
        xt_coeff = (jnp.sqrt(1.0 - betas) * (1.0 - ab_prev) / (1.0 - ab_full))[t].reshape(ab.shape)
        min_log = post_logvar_clipped[t].reshape(ab.shape)
        max_log = jnp.log(jnp.clip(betas, min=1e-20))[t].reshape(ab.shape)
        frac = (var_raw + 1.0) / 2.0
        model_logvar = frac * max_log + (1.0 - frac) * min_log
        pred_x0 = (x_t - jnp.sqrt(1.0 - ab) * eps_frozen) / jnp.sqrt(ab)  # clip_denoised=False
        model_mean = x0_coeff * pred_x0 + xt_coeff * x_t
        true_mean = x0_coeff * x_start.astype(jnp.float32) + xt_coeff * x_t
        ln2 = float(np.log(2.0))
        axes = tuple(range(1, x_start.ndim))
        kl_bits = jnp.mean(
            normal_kl(true_mean, min_log, model_mean, model_logvar), axis=axes
        ) / ln2
        decoder_bits = jnp.mean(
            -discretized_gaussian_log_likelihood(
                x_start.astype(jnp.float32), model_mean, 0.5 * model_logvar
            ),
            axis=axes,
        ) / ln2
        vb = jnp.where(t == 0, decoder_bits, kl_bits)
        per_ex = per_ex + cfg.vlb_weight * vb
    return per_ex if per_example else jnp.mean(per_ex)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # loss-second-moment history (None for the uniform sampler)
    sampler: Optional[SamplerState] = None
    # tuple of EMA param trees, aligned with cfg.ema_rates (empty = disabled)
    ema_params: tuple = ()


def make_train_step(model_apply: Callable, schedule: NoiseSchedule, cfg: DDPMTrainConfig):
    tx = optax.adam(cfg.lr)
    loss_aware = cfg.schedule_sampler == "loss-second-moment"
    if not loss_aware and cfg.schedule_sampler != "uniform":
        raise ValueError(f"unknown schedule sampler: {cfg.schedule_sampler}")
    n_t = schedule.num_train_timesteps

    def init_fn(params) -> TrainState:
        sampler = (
            init_sampler_state(n_t, cfg.sampler_history_per_term) if loss_aware else None
        )
        # iddpm TrainLoop:91-93 — EMA copies start as the initial params
        ema = tuple(jax.tree.map(jnp.asarray, params) for _ in cfg.ema_rates)
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32), sampler, ema)

    @jax.jit
    def step_fn(state: TrainState, x_start, y, key):
        k_t, k_loss = jax.random.split(key)
        t, iw = sample_timesteps(
            state.sampler, k_t, x_start.shape[0], n_t, cfg.sampler_uniform_prob
        )

        def loss_fn(p):
            per_ex = p_losses(
                model_apply, p, schedule, x_start, t, k_loss, cfg, y, per_example=True
            )
            # reference TrainLoop: loss = (losses * weights).mean(), history
            # fed the UNWEIGHTED per-example losses (train_util.py:214-218)
            return jnp.mean(per_ex * iw), jax.lax.stop_gradient(per_ex)

        (loss, per_ex), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        sampler = (
            update_sampler_state(state.sampler, t, per_ex) if loss_aware else None
        )
        new_params = optax.apply_updates(state.params, updates)
        ema = tuple(
            jax.tree.map(lambda e, p: e + (1.0 - rate) * (p - e), e_tree, new_params)
            for rate, e_tree in zip(cfg.ema_rates, state.ema_params)
        )
        return (
            TrainState(new_params, opt_state, state.step + 1, sampler, ema),
            loss,
        )

    return init_fn, step_fn
