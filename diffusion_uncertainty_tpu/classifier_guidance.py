"""ADM classifier guidance as an apply_fn wrapper.

Reference ``generate_samples.py:255-319``: per step,
``eps' = eps − √(1−ᾱ_t) · scale · ∇_x log p(y|x_t)`` with the noisy
classifier's log-softmax gradient. The torch enable_grad/detach/empty_cache
dance collapses to one ``jax.grad``.

Both the diffusion model's and the classifier's weights travel in the params
dict ({"model": ..., "classifier": ...}) so neither is embedded as a compiled
constant.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .diffusion.schedule import NoiseSchedule

__all__ = ["with_classifier_guidance"]


def with_classifier_guidance(
    apply_fn: Callable,  # (params, x, t, y, key) -> eps
    classifier_apply: Callable,  # (params, x, t) -> logits [B, num_classes]
    schedule: NoiseSchedule,
    classifier_scale: float = 1.0,
) -> Callable:
    def guided(p, x, t, y, key):
        eps = apply_fn(p, x, t, y, key)

        def selected_logp(xi):
            logits = classifier_apply(p, xi, t)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.sum(logp[jnp.arange(xi.shape[0]), y])

        grad = jax.grad(selected_logp)(x.astype(jnp.float32))
        ab = schedule.alpha_bar(t)
        return eps - jnp.sqrt(1.0 - ab) * classifier_scale * grad

    return guided
