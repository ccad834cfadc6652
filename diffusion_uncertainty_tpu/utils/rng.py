"""Deterministic, shardable RNG discipline.

The reference derives one torch seed per batch (``init_seed_rng + i_batch *
skip_seed``, ``generate_samples.py:49-55``) which makes runs resumable and
shardable at batch granularity. We keep that *structure* with JAX threefry
keys: a base key per run, ``fold_in`` per (batch, step, member) — bitwise
parity with torch streams is impossible, statistical parity is the contract
(SURVEY.md §7.3.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["run_key", "batch_key", "split_tree"]


def run_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def batch_key(base: jax.Array, batch_index: int | jnp.ndarray) -> jax.Array:
    """Key for one batch of a sharded/resumable run (ref seed-per-batch scheme)."""
    return jax.random.fold_in(base, batch_index)


def split_tree(key: jax.Array, names: tuple[str, ...]) -> dict[str, jax.Array]:
    """Named independent subkeys (sampling noise vs dropout vs ensemble...)."""
    keys = jax.random.split(key, len(names))
    return {n: k for n, k in zip(names, keys)}
