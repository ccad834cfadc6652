"""Variational-bound NLL (bits-per-dim) for learned-variance models.

Parity target: reference ``metrics/nll.py:13-65`` which drives the vendored
improved-diffusion ``GaussianDiffusion.calc_bpd_loop`` with learned variance
(``metrics/iddpm/gaussian_diffusion.py``): for every train timestep t,
noise x0 to x_t, evaluate the model, and accumulate
KL(q(x_{t-1}|x_t,x0) ‖ p_θ(x_{t-1}|x_t)) in bits, plus the discretized decoder
log-likelihood at t=0 and the prior KL at T.

TPU design: the T-step loop is a ``lax.scan`` (one jitted program), the model
is a passed-in 6-channel apply_fn, and the per-term bits accumulate on device.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.schedule import NoiseSchedule

__all__ = ["normal_kl", "discretized_gaussian_log_likelihood", "calc_bpd_loop", "BPDResult"]


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal gaussians (nats, elementwise)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def _approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """Log-likelihood of images discretized to 255 bins under a gaussian
    (standard DDPM decoder; x in [-1, 1])."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = _approx_standard_normal_cdf(plus_in)
    cdf_min = _approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )


class BPDResult(NamedTuple):
    total_bpd: jnp.ndarray  # [B]
    prior_bpd: jnp.ndarray  # [B]
    vb_terms: jnp.ndarray  # [T, B] bits per term
    mse: jnp.ndarray  # [T, B]


def _mean_flat(x):
    return x.reshape(x.shape[0], -1).mean(axis=1)


def calc_bpd_loop(
    model_fn6: Callable,  # (x_t, t, key) -> [B,H,W,6] (eps ‖ raw variance)
    schedule: NoiseSchedule,
    x0: jnp.ndarray,  # [B,H,W,3] in [-1, 1]
    key: jax.Array,
    variance_type: str = "learned_range",
    clip_x0: bool = True,
) -> BPDResult:
    T = schedule.num_train_timesteps
    ab = schedule.alphas_cumprod  # [T]
    ab_prev = jnp.concatenate([jnp.ones((1,), jnp.float32), ab[:-1]])
    betas = schedule.betas
    posterior_var = betas * (1.0 - ab_prev) / (1.0 - ab)
    # iddpm clips the t=0 posterior variance
    posterior_logvar_clipped = jnp.log(
        jnp.concatenate([posterior_var[1:2], posterior_var[1:]])
    )
    x0_coeff = jnp.sqrt(ab_prev) * betas / (1.0 - ab)
    xt_coeff = jnp.sqrt(1.0 - betas) * (1.0 - ab_prev) / (1.0 - ab)

    x0f = x0.astype(jnp.float32)
    ln2 = float(np.log(2.0))

    def body(carry, t):
        k = carry
        k, k_noise, k_model = jax.random.split(k, 3)
        noise = jax.random.normal(k_noise, x0f.shape, jnp.float32)
        x_t = jnp.sqrt(ab[t]) * x0f + jnp.sqrt(1.0 - ab[t]) * noise

        out = model_fn6(x_t, t, k_model).astype(jnp.float32)
        eps, var_raw = out[..., :3], out[..., 3:]

        pred_x0 = (x_t - jnp.sqrt(1.0 - ab[t]) * eps) / jnp.sqrt(ab[t])
        if clip_x0:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
        model_mean = x0_coeff[t] * pred_x0 + xt_coeff[t] * x_t

        min_log = posterior_logvar_clipped[t]
        max_log = jnp.log(jnp.clip(betas[t], min=1e-20))
        if variance_type == "learned_range":
            frac = (var_raw + 1.0) / 2.0
            model_logvar = frac * max_log + (1.0 - frac) * min_log
        elif variance_type == "learned":
            model_logvar = var_raw
        else:
            # fixed posterior variance (3-channel models have no var channels)
            model_logvar = jnp.broadcast_to(min_log, x_t.shape)

        true_mean = x0_coeff[t] * x0f + xt_coeff[t] * x_t
        true_logvar = jnp.broadcast_to(posterior_logvar_clipped[t], model_logvar.shape)

        kl_bits = _mean_flat(normal_kl(true_mean, true_logvar, model_mean, model_logvar)) / ln2
        decoder_nll = -discretized_gaussian_log_likelihood(x0f, model_mean, 0.5 * model_logvar)
        decoder_bits = _mean_flat(decoder_nll) / ln2
        vb = jnp.where(t == 0, decoder_bits, kl_bits)
        mse = _mean_flat((eps - noise) ** 2)
        return k, (vb, mse)

    ts = jnp.arange(T - 1, -1, -1)
    key, (vb_terms, mse) = jax.lax.scan(body, key, ts)

    # prior KL(q(x_T|x_0) || N(0, I)) in bits
    qT_mean = jnp.sqrt(ab[T - 1]) * x0f
    qT_logvar = jnp.broadcast_to(jnp.log(1.0 - ab[T - 1]), x0f.shape)
    prior = _mean_flat(normal_kl(qT_mean, qT_logvar, jnp.zeros_like(qT_mean), jnp.zeros_like(qT_logvar))) / ln2

    total = vb_terms.sum(axis=0) + prior
    return BPDResult(total_bpd=total, prior_bpd=prior, vb_terms=vb_terms, mse=mse)
