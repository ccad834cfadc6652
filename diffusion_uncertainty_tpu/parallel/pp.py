"""Pipeline parallelism (GPipe schedule) over a "pipe" mesh axis.

The reference has no pipeline parallelism — its largest self-hosted model is
the 421M ADM UNet and its only parallelism is process-per-GPU index sharding
(SURVEY.md §2.4). The T2I transformers this framework adds (SD3.5-large 8.1B,
Flux-dev 11.9B) exceed one v5e's HBM; besides tensor parallelism
(``parallel/tp.py``) and host-streaming (``pipelines/streamed.py``), the
third TPU-native answer is pipelining the *depth*: each chip holds
``L/n_stages`` contiguous blocks, microbatches flow through the ring, and
the inter-stage hop is a single ``ppermute`` riding the ICI.

TPU-first shape of the implementation: the whole schedule is ONE jitted
``shard_map`` program — a ``lax.scan`` over ``n_micro + n_stages - 1`` ticks,
each tick running every stage's local blocks (an inner ``lax.scan`` over the
stacked layer params) and rotating the carried activation pytree one stage
forward with ``lax.ppermute``. No host round-trips, no per-stage programs,
static shapes throughout; XLA overlaps the permute with the next tick's
compute. The classic GPipe bubble (stages idle for ``n_stages - 1`` ticks)
is the schedule's only overhead.

Works for any *homogeneous* block family applied via
``block_fn(layer_params, state) -> state`` where ``state`` is an arbitrary
activation pytree (e.g. MMDiT's ``(h, ctx, temb)`` with ``temb`` carried
through). Heterogeneous heads/tails (embedders, MMDiT's final
``context_pre_only`` block) run outside the pipeline — they are <1% of the
FLOPs.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover — older stacks
    from jax.experimental.shard_map import shard_map

__all__ = [
    "make_pp_mesh",
    "stack_block_params",
    "pipeline_apply",
    "mmdit_pipeline_forward",
]


def make_pp_mesh(pipe: int, devices=None) -> Mesh:
    """1-D ("pipe",) mesh over the first ``pipe`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if pipe > len(devices):
        raise ValueError(f"pipe({pipe}) > devices({len(devices)})")
    return Mesh(np.asarray(devices[:pipe]), ("pipe",))


def stack_block_params(params, n: int, fmt: str = "block_{}"):
    """Stack ``n`` per-block param subtrees (``fmt.format(i)`` keys, flax
    naming as in ``models.mmdit``/``models.flux``) into one tree whose leaves
    carry a leading depth axis — the layout both ``lax.scan``-over-depth and
    the pipe-axis sharding want."""
    p = params["params"] if isinstance(params, dict) and "params" in params else params
    blocks = [p[fmt.format(i)] for i in range(n)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def pipeline_apply(
    block_fn: Callable,
    stacked_params,
    inputs,
    mesh: Mesh,
    axis: str = "pipe",
    n_micro: int | None = None,
):
    """Run ``inputs`` through all stacked blocks with a GPipe schedule.

    Args:
      block_fn: ``(layer_params, state) -> state`` for ONE block; ``state``
        is a pytree whose every leaf has a leading microbatch dim.
      stacked_params: from ``stack_block_params`` — leaves ``[L, ...]``;
        ``L`` must divide by ``mesh.shape[axis]``.
      inputs: activation pytree, leaves ``[batch, ...]``; ``batch`` must
        divide by ``n_micro``.
      n_micro: microbatch count (default: one per stage — the minimum that
        keeps every stage busy outside the fill/drain bubble; more
        microbatches shrink the bubble fraction).

    Returns the output pytree with the same leaves as ``inputs``, replicated
    across the mesh. Agrees with the sequential depth loop to matmul-blocking
    roundoff (microbatch matmuls tile differently than full-batch ones) —
    see tests/test_pp.py.
    """
    n_stages = mesh.shape[axis]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth({depth}) not divisible by stages({n_stages})")
    batch = jax.tree.leaves(inputs)[0].shape[0]
    n_micro = n_micro or n_stages
    if batch % n_micro:
        raise ValueError(f"batch({batch}) not divisible by n_micro({n_micro})")

    # [batch, ...] -> [n_micro, mb, ...]
    micro = jax.tree.map(
        lambda a: a.reshape(n_micro, batch // n_micro, *a.shape[1:]), inputs
    )
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def local(stage_params, micro_in):
        stage_idx = lax.axis_index(axis)
        is_first = stage_idx == 0
        is_last = stage_idx == n_stages - 1

        def run_stage(state):
            def body(s, lp):
                return block_fn(lp, s), None

            s, _ = lax.scan(body, state, stage_params)
            return s

        mb0 = jax.tree.map(lambda a: jnp.zeros_like(a[0]), micro_in)
        out0 = jax.tree.map(jnp.zeros_like, micro_in)

        def tick(carry, t):
            state, outs = carry
            # stage 0 swallows microbatch t during the fill phase
            inj = jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(
                    a, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
                ),
                micro_in,
            )
            take = jnp.logical_and(is_first, t < n_micro)
            state = jax.tree.map(lambda i, s: jnp.where(take, i, s), inj, state)
            state = run_stage(state)
            # stage S-1 finishes microbatch t-(S-1) this tick
            oi = t - (n_stages - 1)
            write = jnp.logical_and(is_last, oi >= 0)
            oi_c = jnp.clip(oi, 0, n_micro - 1)
            outs = jax.tree.map(
                lambda o, s: jnp.where(
                    write, lax.dynamic_update_index_in_dim(o, s, oi_c, 0), o
                ),
                outs,
                state,
            )
            state = lax.ppermute(state, axis, perm)
            return (state, outs), None

        (_, outs), _ = lax.scan(
            tick, (mb0, out0), jnp.arange(n_micro + n_stages - 1)
        )
        # outs is non-zero only on the last stage; psum replicates it
        return jax.tree.map(lambda o: lax.psum(o, axis), outs)

    out_micro = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )(stacked_params, micro)
    return jax.tree.map(lambda a: a.reshape(batch, *a.shape[2:]), out_micro)


def mmdit_pipeline_forward(
    cfg,
    params,
    x,
    t,
    encoder_hidden_states,
    pooled_projections,
    mesh: Mesh,
    axis: str = "pipe",
    n_micro: int | None = None,
):
    """Full MMDiT forward (``models/mmdit.py`` semantics, equality-tested in
    tests/test_pp.py) with the homogeneous joint blocks pipelined over
    ``axis``.

    Structure: the embed stage and the output head are replicated (<1% of
    FLOPs); the ``num_layers - 1`` uniform ``_JointBlock``s are split into
    the largest prefix divisible by ``n_stages`` — pipelined via
    :func:`pipeline_apply` with state ``(h, ctx, temb)`` — plus a replicated
    remainder (SD3-medium's 23 middle blocks over 4 stages = 20 pipelined +
    3 replicated); the final ``context_pre_only`` block runs replicated.

    ``params``: the full flax tree from ``MMDiT.init`` (or
    ``pipelines.streamed.random_mmdit_params``). The reference has no
    pipeline parallelism (SURVEY §2.4); this is the TPU-native depth-scaling
    path for SD3.5-large-class models.
    """
    from ..models.mmdit import _JointBlock
    from ..pipelines.streamed import mmdit_embed, mmdit_final

    p = params["params"] if isinstance(params, dict) and "params" in params else params
    head = {
        k: p[k]
        for k in (
            "patch_embed", "pos_embed", "time_text_embed", "context_embedder",
            "norm_out_linear", "proj_out",
        )
    }
    # flax Conv kernel is [p, p, c, dim]; mmdit_embed's unfold-matmul wants it
    # flattened row-major, which .reshape inside mmdit_embed already does.
    n_stages = mesh.shape[axis]
    n_mid = cfg.num_layers - 1
    n_pipe = (n_mid // n_stages) * n_stages

    hh, ww = x.shape[1], x.shape[2]
    h, ctx, temb = mmdit_embed(cfg, head, x, t, encoder_hidden_states, pooled_projections)

    mid = _JointBlock(cfg, context_pre_only=False)

    def block_fn(bp, st):
        hh_, cc_, tt_ = st
        hh_, cc_ = mid.apply({"params": bp}, hh_, cc_, tt_)
        return (hh_, cc_, tt_)

    if n_pipe:
        stacked = stack_block_params({k: p[k] for k in p if k.startswith("block_")}, n_pipe)
        h, ctx, temb = pipeline_apply(
            block_fn, stacked, (h, ctx, temb), mesh, axis=axis, n_micro=n_micro
        )
    for i in range(n_pipe, n_mid):  # replicated remainder (< n_stages blocks)
        h, ctx, temb = block_fn(p[f"block_{i}"], (h, ctx, temb))

    last = _JointBlock(cfg, context_pre_only=True)
    h, _ = last.apply({"params": p[f"block_{cfg.num_layers - 1}"]}, h, ctx, temb)
    pp_ = cfg.patch_size
    return mmdit_final(cfg, head, h, temb, hh // pp_, ww // pp_)
