"""Surrogate uncertainty predictor: small CNN mapping a score map + timestep
index to a pixel-wise uncertainty map.

Parity target: reference ``score_uncertainty_model.py:39-108`` — 4 conv layers
(16/32/32/1) with ReLU, a per-timestep-index embedding reshaped to a full
image plane added to the conv output, single-group GroupNorm on the output,
MSE loss summed over pixels; Adam/SGD. The Lightning module becomes a flax
module + optax train state with jit-able train/eval steps (data-parallel when
run under a mesh — gradients reduce via the shardings).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

__all__ = ["ScoreUncertaintyConfig", "ScoreUncertaintyModel", "ScoreUncertaintyTrainer"]


@dataclasses.dataclass(frozen=True)
class ScoreUncertaintyConfig:
    in_channels: int = 3
    num_timesteps: int = 50  # inference-step count (the index, not train t)
    image_size: int = 64
    optimizer: str = "adam"
    learning_rate: float = 1e-3
    dtype: Any = jnp.float32


class ScoreUncertaintyModel(nn.Module):
    cfg: ScoreUncertaintyConfig

    @nn.compact
    def __call__(self, score: jnp.ndarray, timestep_index: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = nn.Conv(16, (3, 3), padding=1, dtype=cfg.dtype, name="conv0")(score.astype(cfg.dtype))
        h = nn.relu(h)
        h = nn.Conv(32, (3, 3), padding=1, dtype=cfg.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(32, (3, 3), padding=1, dtype=cfg.dtype, name="conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (3, 3), padding=1, dtype=cfg.dtype, name="conv3")(h)

        emb = nn.Embed(
            cfg.num_timesteps, cfg.image_size * cfg.image_size, dtype=cfg.dtype, name="t_embed"
        )(timestep_index)
        emb = emb.reshape(-1, cfg.image_size, cfg.image_size, 1)
        out = h + emb
        # single-group GroupNorm, eps=1e-8 (ref :59)
        out = nn.GroupNorm(num_groups=1, epsilon=1e-8, dtype=jnp.float32, name="out_norm")(
            out.astype(jnp.float32)
        )
        return out


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class ScoreUncertaintyTrainer:
    """jit-able train/eval steps; loss = MSE.mean(batch).sum(pixels) (ref :88-92)."""

    def __init__(self, cfg: ScoreUncertaintyConfig):
        self.cfg = cfg
        self.model = ScoreUncertaintyModel(cfg)
        if cfg.optimizer == "adam":
            self.tx = optax.adam(cfg.learning_rate)
        elif cfg.optimizer == "sgd":
            self.tx = optax.sgd(cfg.learning_rate, momentum=0.9)
        else:
            raise ValueError(cfg.optimizer)

        def loss_fn(params, score, t_idx, target_u):
            pred = self.model.apply(params, score, t_idx)
            se = (target_u.astype(jnp.float32) - pred) ** 2
            return se.mean(axis=0).sum()

        @jax.jit
        def train_step(state: TrainState, score, t_idx, target_u):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, score, t_idx, target_u)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        @jax.jit
        def eval_step(state: TrainState, score, t_idx, target_u):
            return loss_fn(state.params, score, t_idx, target_u)

        self.train_step = train_step
        self.eval_step = eval_step

    def init(self, key) -> TrainState:
        cfg = self.cfg
        score = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels))
        params = self.model.init(key, score, jnp.zeros((1,), jnp.int32))
        return TrainState(params, self.tx.init(params), jnp.zeros((), jnp.int32))

    def apply_fn(self, state: TrainState):
        """(score, t_idx) -> u_map, for the score_model_gradient guidance."""
        return lambda score, t_idx: self.model.apply(state.params, score, t_idx)
