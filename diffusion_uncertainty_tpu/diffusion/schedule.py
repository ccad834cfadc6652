"""Noise schedules and timestep spacing as pure functions / pytree tables.

Replaces the schedule construction duplicated across the reference's 16
scheduler classes (reference: ``schedulers_uncertainty/scheduling_ddim_uncertainty_zigzag_centered.py:218-238``
beta schedules, ``:338-387`` timestep spacing; cosine alpha-bar construction at
``init_model.py:140-157``). Everything here is trace-time-static or a plain
float32 table so it can be gathered inside ``jax.lax.scan`` bodies.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "NoiseSchedule",
    "make_betas",
    "betas_for_alpha_bar",
    "make_schedule",
    "cosine_schedule",
    "spaced_timesteps",
    "uncertainty_window",
]


@struct.dataclass
class NoiseSchedule:
    """Float32 schedule tables, indexable with traced timesteps inside jit.

    ``final_alpha_cumprod`` is what ``alpha_bar`` decays to *past* t=0: 1.0 when
    the sampler treats the final step as reaching the clean image
    (diffusers ``set_alpha_to_one=True``), else ``alphas_cumprod[0]``.
    """

    betas: jnp.ndarray  # [T] float32
    alphas_cumprod: jnp.ndarray  # [T] float32
    final_alpha_cumprod: jnp.ndarray  # scalar float32

    @property
    def num_train_timesteps(self) -> int:
        return self.betas.shape[0]

    def alpha_bar(self, t: jnp.ndarray) -> jnp.ndarray:
        """alpha_bar_t with the t<0 convention baked in (gather-safe under scan)."""
        safe_t = jnp.clip(t, 0, self.num_train_timesteps - 1)
        return jnp.where(t >= 0, self.alphas_cumprod[safe_t], self.final_alpha_cumprod)

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Forward diffusion q(x_t | x_0): sqrt(ab_t) x0 + sqrt(1-ab_t) eps.

        Parity: diffusers ``DDIMScheduler.add_noise`` (reference
        ``scheduling_ddim_uncertainty_zigzag_centered.py:592-626``). Scalar or
        per-sample ``t`` both work; schedule math stays float32 and the result
        is cast back to ``x0.dtype``.
        """
        ab = self.alpha_bar(t).astype(jnp.float32)
        # broadcast per-sample t over trailing image dims
        while ab.ndim < x0.ndim:
            ab = ab[..., None]
        out = jnp.sqrt(ab) * x0.astype(jnp.float32) + jnp.sqrt(1.0 - ab) * noise.astype(jnp.float32)
        return out.astype(x0.dtype)


def betas_for_alpha_bar(
    num_train_timesteps: int,
    alpha_bar_fn: Callable[[float], float],
    max_beta: float = 0.999,
) -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas.

    Parity: reference ``init_model.py:140-157`` (used for the ADM ImageNet-64
    cosine schedule) and diffusers' ``betas_for_alpha_bar``.
    """
    betas = []
    for i in range(num_train_timesteps):
        t1 = i / num_train_timesteps
        t2 = (i + 1) / num_train_timesteps
        betas.append(min(1.0 - alpha_bar_fn(t2) / alpha_bar_fn(t1), max_beta))
    return np.asarray(betas, dtype=np.float64)


def cosine_schedule(num_train_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """OpenAI improved-DDPM cosine schedule (reference ``init_model.py:138``)."""
    return betas_for_alpha_bar(
        num_train_timesteps,
        lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        max_beta=max_beta,
    )


def make_betas(
    kind: str,
    num_train_timesteps: int,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
) -> np.ndarray:
    """Beta schedule families (float64 on host; cast to f32 in ``make_schedule``).

    Kinds match the reference/diffusers names
    (``scheduling_ddim_uncertainty_zigzag_centered.py:218-238``,
    ``gaussian_diffusion.py:29-63``): linear, scaled_linear, squaredcos_cap_v2
    (cosine alpha-bar), sigmoid.
    """
    if kind == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if kind == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
        )
    if kind in ("squaredcos_cap_v2", "cosine"):
        return cosine_schedule(num_train_timesteps)
    if kind == "sigmoid":
        x = np.linspace(-6.0, 6.0, num_train_timesteps, dtype=np.float64)
        return 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    raise ValueError(f"unknown beta schedule kind: {kind!r}")


def make_schedule(
    kind: str = "linear",
    num_train_timesteps: int = 1000,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    trained_betas: Optional[Sequence[float]] = None,
    set_alpha_to_one: bool = True,
    rescale_betas_zero_snr: bool = False,
) -> NoiseSchedule:
    """Build the float32 schedule tables.

    ``trained_betas`` overrides ``kind`` (reference passes explicit alpha-bar
    cosine betas for ImageNet-64, ``init_model.py:136-138``).
    ``rescale_betas_zero_snr`` implements Lin et al. 2023 terminal-SNR rescale.
    """
    if trained_betas is not None:
        betas = np.asarray(trained_betas, dtype=np.float64)
    else:
        betas = make_betas(kind, num_train_timesteps, beta_start, beta_end)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)

    if rescale_betas_zero_snr:
        # shift + scale sqrt(alpha_bar) so the terminal SNR is exactly zero
        ab_sqrt = np.sqrt(alphas_cumprod)
        ab0, abT = ab_sqrt[0], ab_sqrt[-1]
        ab_sqrt = (ab_sqrt - abT) * ab0 / (ab0 - abT)
        alphas_cumprod = ab_sqrt**2
        alphas = np.concatenate([alphas_cumprod[:1], alphas_cumprod[1:] / alphas_cumprod[:-1]])
        betas = 1.0 - alphas

    final = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
    return NoiseSchedule(
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        final_alpha_cumprod=jnp.asarray(final, dtype=jnp.float32),
    )


def spaced_timesteps(
    num_train_timesteps: int,
    num_inference_steps: int,
    spacing: str = "leading",
    steps_offset: int = 0,
) -> np.ndarray:
    """Descending int32 inference timesteps.

    Parity with diffusers Table-2 spacings (reference
    ``scheduling_ddim_uncertainty_zigzag_centered.py:356-381``):
    linspace / leading / trailing.
    """
    if num_inference_steps > num_train_timesteps:
        raise ValueError(
            f"num_inference_steps={num_inference_steps} > num_train_timesteps={num_train_timesteps}"
        )
    if spacing == "linspace":
        ts = np.linspace(0, num_train_timesteps - 1, num_inference_steps).round()[::-1]
    elif spacing == "leading":
        ratio = num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * ratio).round()[::-1] + steps_offset
    elif spacing == "trailing":
        ratio = num_train_timesteps / num_inference_steps
        ts = np.round(np.arange(num_train_timesteps, 0, -ratio)) - 1
    else:
        raise ValueError(f"unknown timestep spacing: {spacing!r}")
    return ts.astype(np.int32).copy()


def uncertainty_window(after_step: int, num_steps_uc: int, num_inference_steps: int):
    """Static [start, stop) step-index window in which uncertainty is estimated.

    The reference anchors the window on *timestep values*
    (``timestep_after_step = timesteps[after_step]``,
    ``timestep_end_step = timesteps[after_step + num_steps_uc - 1]``, checked as
    ``end <= t <= after`` each step — ``scheduling_*.py:383-384,527``).
    Because timesteps are strictly descending, that is exactly the contiguous
    step-index range ``[after_step, after_step + num_steps_uc)``; we keep it as
    static metadata so the sampling scan can be split into pre/window/post
    segments (no per-step cond, no wasted M-ensemble forwards).
    """
    start = max(0, after_step)
    stop = min(num_inference_steps, after_step + num_steps_uc)
    if stop < start:
        raise ValueError(f"empty uncertainty window: [{start}, {stop})")
    return start, stop
