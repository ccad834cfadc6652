"""Timestep schedule samplers for training (uniform / loss-second-moment).

Parity target: the reference's vendored iddpm ``resample.py``
(``/root/reference/diffusion_uncertainty/metrics/iddpm/resample.py:8-154``):
``UniformSampler`` and ``LossSecondMomentResampler`` — unbiased importance
sampling of the training timestep ``t`` where ``p(t) ∝ sqrt(E[loss_t²])``
over a per-timestep history of the last ``history_per_term`` losses, mixed
with ``uniform_prob`` of uniform mass, uniform until every timestep's
history is full.  The reference's ``TrainLoop`` draws ``(t, weights)`` per
microbatch, scales the per-example loss by the importance weights
``1/(T·p[t])`` and feeds the *unweighted* per-example losses back into the
history (``train_util.py:197-218``).

TPU-native shape: the sampler is a pure ``(state, key) -> (t, weights)`` /
``(state, t, losses) -> state`` pair over a small ``SamplerState`` pytree
that lives in the jitted train step's carry — no host round-trips, no
mutation.  The reference's cross-rank ``update_with_local_losses`` (an MPI
``all_gather`` of every rank's ``(t, loss)`` pairs,
``resample.py:69-104``) is unnecessary here by construction: under the
single-program data-parallel mesh the per-example loss vector is already a
global array, so updating from it IS the all-ranks update and every device
carries an identical ``SamplerState``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "SamplerState",
    "init_sampler_state",
    "sampler_weights",
    "sample_timesteps",
    "update_sampler_state",
]


class SamplerState(NamedTuple):
    """Loss history ring per timestep (reference ``resample.py:124-133``)."""

    loss_history: jnp.ndarray  # [T, history_per_term] f32
    loss_counts: jnp.ndarray  # [T] int32


def init_sampler_state(num_timesteps: int, history_per_term: int = 10) -> SamplerState:
    return SamplerState(
        loss_history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
        loss_counts=jnp.zeros((num_timesteps,), jnp.int32),
    )


def sampler_weights(state: SamplerState, uniform_prob: float = 0.001) -> jnp.ndarray:
    """Normalized p(t) (reference ``weights()``, ``resample.py:134-141``).

    Uniform until warmed up (every count == history_per_term); afterwards
    ``sqrt(mean(history²))`` normalized, then mixed with ``uniform_prob``
    uniform mass.  Returns a probability vector (the reference normalizes in
    ``sample()``; folding it in here changes nothing downstream).
    """
    t = state.loss_counts.shape[0]
    warmed = jnp.all(state.loss_counts == state.loss_history.shape[1])
    w = jnp.sqrt(jnp.mean(state.loss_history**2, axis=-1))
    w = w / jnp.maximum(jnp.sum(w), 1e-30)
    w = w * (1.0 - uniform_prob) + uniform_prob / t
    return jnp.where(warmed, w, jnp.full((t,), 1.0 / t, jnp.float32))


def sample_timesteps(
    state: SamplerState | None,
    key: jax.Array,
    batch_size: int,
    num_timesteps: int,
    uniform_prob: float = 0.001,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw ``t ~ p`` and importance weights ``1/(T·p[t])``.

    Reference ``ScheduleSampler.sample`` (``resample.py:42-58``).  With
    ``state=None`` this is the ``UniformSampler`` (weights are all ones).
    """
    if state is None:
        t = jax.random.randint(key, (batch_size,), 0, num_timesteps)
        return t, jnp.ones((batch_size,), jnp.float32)
    p = sampler_weights(state, uniform_prob)
    t = jax.random.categorical(key, jnp.log(p), shape=(batch_size,))
    iw = 1.0 / (num_timesteps * p[t])
    return t, iw


def update_sampler_state(
    state: SamplerState, t: jnp.ndarray, losses: jnp.ndarray
) -> SamplerState:
    """Push per-example (t, loss) pairs into the history rings.

    Reference ``update_with_all_losses`` (``resample.py:143-151``): for each
    pair *in order*, if the row is full shift it left and append, else write
    at the current count.  Duplicate timesteps within a batch therefore push
    multiple entries sequentially — reproduced with a ``lax.scan`` over the
    batch (deterministic, so every device computes the same state).
    """
    hist_len = state.loss_history.shape[1]

    def body(carry, pair):
        history, counts = carry
        ti, loss = pair
        row = history[ti]
        count = counts[ti]
        shifted = jnp.concatenate([row[1:], loss[None].astype(jnp.float32)])
        appended = row.at[jnp.minimum(count, hist_len - 1)].set(loss.astype(jnp.float32))
        full = count == hist_len
        new_row = jnp.where(full, shifted, appended)
        history = history.at[ti].set(new_row)
        counts = counts.at[ti].set(jnp.where(full, count, count + 1))
        return (history, counts), None

    (history, counts), _ = lax.scan(
        body,
        (state.loss_history, state.loss_counts),
        (t.astype(jnp.int32), lax.stop_gradient(losses)),
    )
    return SamplerState(history, counts)
