"""Best-of-M flip-disagreement noise finetuning.

Parity target: reference ``ddpm_finetune_noise.py:16-135``: per batch, draw M
candidate noises, score each by the flip-disagreement uncertainty
``Σ(ε(x_t) − flip(ε(flip(x_t))))²`` of the resulting x_t, keep the candidate
with min (or max) uncertainty per sample, then regress the UNet onto that
noise with MSE. Timestep window selectable (start/middle/end/all quarters).

TPU re-design: the no-grad best-of-M search is a ``lax.scan`` over candidates
inside the jitted train step (no Python loop, no host sync), and the gradient
only flows through the final regression forward (``jax.lax.stop_gradient`` on
the search — matching the reference's ``torch.no_grad`` block).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..diffusion.schedule import NoiseSchedule

__all__ = ["FinetuneNoiseConfig", "make_finetune_step"]

_ZONES = {
    "start": (0.0, 0.25),
    "middle": (0.25, 0.75),
    "end": (0.75, 1.0),
    "all": (0.0, 1.0),
}


@dataclasses.dataclass(frozen=True)
class FinetuneNoiseConfig:
    M: int = 4
    lr: float = 1e-4
    time_zone: str = "all"
    mode: str = "min"  # keep the least (min) or most (max) uncertain noise
    optimizer: str = "adam"
    momentum: float = 0.9
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999


def _make_tx(cfg: FinetuneNoiseConfig):
    if cfg.optimizer == "adam":
        return optax.adam(cfg.lr, b1=cfg.b1, b2=cfg.b2)
    if cfg.optimizer == "adamw":
        return optax.adamw(cfg.lr, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay)
    if cfg.optimizer == "sgd":
        return optax.sgd(cfg.lr, momentum=cfg.momentum)
    if cfg.optimizer == "rmsprop":
        return optax.rmsprop(cfg.lr, momentum=cfg.momentum)
    raise ValueError(cfg.optimizer)


class FinetuneState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_finetune_step(
    model_apply: Callable,  # (params, x, t, y) -> eps [B,H,W,C]
    schedule: NoiseSchedule,
    cfg: FinetuneNoiseConfig,
):
    """Returns (init_fn(params), step_fn(state, x0, y, key) -> (state, loss))."""
    tx = _make_tx(cfg)
    T = schedule.num_train_timesteps
    lo = int(_ZONES[cfg.time_zone][0] * T)
    hi = int(_ZONES[cfg.time_zone][1] * T)

    def flip_uncertainty(params, x_t, t, y):
        eps = model_apply(params, x_t, t, y)
        eps_flip = model_apply(params, jnp.flip(x_t, axis=1), t, y)
        d = eps.astype(jnp.float32) - jnp.flip(eps_flip, axis=1).astype(jnp.float32)
        return jnp.sum(d * d, axis=(1, 2, 3))  # [B]

    def step_fn(state: FinetuneState, x0, y, key):
        k_t, k_noise = jax.random.split(key)
        b = x0.shape[0]
        t = jax.random.randint(k_t, (b,), lo, hi)

        def search_body(carry, k_m):
            best_noise, best_u = carry
            noise = jax.random.normal(k_m, x0.shape, jnp.float32)
            x_t = schedule.add_noise(x0, noise, t)
            u = flip_uncertainty(state.params, x_t, t, y)
            better = (u < best_u) if cfg.mode == "min" else (u > best_u)
            bb = better[:, None, None, None]
            return (jnp.where(bb, noise, best_noise), jnp.where(better, u, best_u)), None

        init_u = jnp.full((b,), jnp.inf if cfg.mode == "min" else -jnp.inf, jnp.float32)
        (best_noise, _), _ = jax.lax.scan(
            search_body, (jnp.zeros_like(x0, jnp.float32), init_u), jax.random.split(k_noise, cfg.M)
        )
        best_noise = jax.lax.stop_gradient(best_noise)

        def loss_fn(params):
            x_t = schedule.add_noise(x0, best_noise, t)
            eps = model_apply(params, x_t, t, y)
            return jnp.mean((eps.astype(jnp.float32) - best_noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return FinetuneState(params, opt_state, state.step + 1), loss

    def init_fn(params) -> FinetuneState:
        return FinetuneState(params, tx.init(params), jnp.zeros((), jnp.int32))

    return init_fn, jax.jit(step_fn)
