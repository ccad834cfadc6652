"""Tensor-parallel sharding specs for the transformer families.

The reference never needs TP (its largest self-hosted model is the 421M ADM
UNet), but the T2I stack this framework adds does: SD3-medium is 2.0B,
SD3.5-large 8B, Flux-dev 11.9B — the latter two cannot even FIT one v5e
chip's 16GB HBM in bf16, so "model" -axis sharding is the difference between
running and not running.

TPU-first design (scaling-book recipe): pick a ("data", "model") mesh,
annotate the *parameters* with Megatron-style specs — column-parallel qkv/FF
up-projections, row-parallel output/FF down-projections — keep activations
batch-sharded, and let XLA insert the all-reduces from the shardings. No
hand-written collectives; the ICI carries exactly one psum per attention and
one per MLP, same as hand-rolled Megatron.

``shard_params(params, spec_fn, mesh)`` applies a rule function over the
param tree; ``mmdit_tp_spec`` / ``flux_tp_spec`` / ``uvit_tp_spec`` are the
rule functions (keyed on path suffixes, so they work for every depth/width
config of their family).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_tp_mesh",
    "shard_params",
    "param_shardings",
    "mmdit_tp_spec",
    "flux_tp_spec",
    "uvit_tp_spec",
    "make_uvit_tp_spec",
    "sd_unet_tp_spec",
]


def make_tp_mesh(data: int, model: int, devices=None) -> Mesh:
    """("data", "model") mesh; model should divide the model family's head
    count (validated by the caller against its config)."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if data * model > len(devices):
        raise ValueError(f"data({data}) * model({model}) > devices({len(devices)})")
    return Mesh(np.asarray(devices[: data * model]).reshape(data, model), ("data", "model"))

Axis = Optional[str]


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def param_shardings(params, spec_fn: Callable[[str, tuple], P], mesh: Mesh):
    """Tree of NamedShardings from a (path, shape) -> PartitionSpec rule.

    Validates divisibility: any dim whose size does not divide evenly by its
    mesh axis would be silently padded by GSPMD — we replicate that param
    instead (numerics identical) and warn once."""
    import warnings

    def one(path, leaf):
        spec = spec_fn(_path_str(path), leaf.shape)
        for dim, axis in zip(leaf.shape, tuple(spec) + (None,) * (len(leaf.shape) - len(spec))):
            if axis is not None and dim % mesh.shape[axis] != 0:
                warnings.warn(
                    f"{_path_str(path)}: dim {dim} not divisible by mesh axis "
                    f"'{axis}' ({mesh.shape[axis]}); replicating instead of padding"
                )
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, spec_fn: Callable[[str, tuple], P], mesh: Mesh):
    """device_put every param according to the rule (host -> mesh)."""
    return jax.tree_util.tree_map(
        jax.device_put, params, param_shardings(params, spec_fn, mesh)
    )


def _col(shape) -> P:  # shard output features (last dim)
    return P(*([None] * (len(shape) - 1)), "model")


def _row(shape) -> P:  # shard input features (second-to-last of a 2-D kernel)
    if len(shape) == 2:
        return P("model", None)
    return P(*([None] * (len(shape) - 2)), "model", None)


def mmdit_tp_spec(path: str, shape: tuple) -> P:
    """Megatron-style TP over ``models.mmdit.MMDiT`` params.

    Column-parallel: qkv projections (head-dim splits cleanly across chips
    because our layout is head-major) and FF up-projections. Row-parallel:
    attention output and FF down projections (XLA inserts the psum from the
    shardings). AdaLN modulation linears, norm scales, embeddings, and the
    patch conv stay replicated — their outputs gate *replicated* activations,
    and sharding them would just force extra reshards.
    """
    col_suffixes = ("to_q/kernel", "to_k/kernel", "to_v/kernel",
                    "add_q_proj/kernel", "add_k_proj/kernel", "add_v_proj/kernel",
                    "ff_proj/kernel", "ff_context_proj/kernel")
    row_suffixes = ("to_out/kernel", "to_add_out/kernel",
                    "ff_out/kernel", "ff_context_out/kernel")
    col_biases = ("to_q/bias", "to_k/bias", "to_v/bias",
                  "add_q_proj/bias", "add_k_proj/bias", "add_v_proj/bias",
                  "ff_proj/bias", "ff_context_proj/bias")
    if path.endswith(col_suffixes):
        return _col(shape)
    if path.endswith(col_biases):
        return P("model")
    if path.endswith(row_suffixes):
        return _row(shape)
    return P()


def flux_tp_spec(path: str, shape: tuple) -> P:
    """TP rule for ``models.flux.FluxTransformer`` (adds the single-stream
    blocks' fused proj_mlp/proj_out; qk RMS-norm scales are per-head-channel
    and replicated — each chip normalizes its local heads with the same
    scale)."""
    col_suffixes = ("to_q/kernel", "to_k/kernel", "to_v/kernel",
                    "add_q_proj/kernel", "add_k_proj/kernel", "add_v_proj/kernel",
                    "ff_proj/kernel", "ff_context_proj/kernel", "proj_mlp/kernel")
    col_biases = ("to_q/bias", "to_k/bias", "to_v/bias",
                  "add_q_proj/bias", "add_k_proj/bias", "add_v_proj/bias",
                  "ff_proj/bias", "ff_context_proj/bias", "proj_mlp/bias")
    row_suffixes = ("to_out/kernel", "to_add_out/kernel",
                    "ff_out/kernel", "ff_context_out/kernel")
    if path.endswith(col_suffixes):
        return _col(shape)
    if path.endswith(col_biases):
        return P("model")
    if path.endswith(row_suffixes):
        return _row(shape)
    # single-stream proj_out reads cat([attn(D) | mlp(4D)]): both halves are
    # head/feature-sharded, so its input dim is model-sharded too
    if "single_block" in path and path.endswith("proj_out/kernel"):
        return _row(shape)
    return P()


def uvit_tp_spec(path: str, shape: tuple) -> P:
    """TP rule for ``models.uvit.UViT``. The fused qkv is K-major then
    head-major: a 'model' shard of its 3D output dim keeps whole q/k/v thirds
    only when the dim divides by 3*shards — this bare rule shards it
    unconditionally; use ``make_uvit_tp_spec(shards)`` for the validated rule
    that replicates qkv otherwise."""
    if path.endswith(("attn/qkv/kernel", "mlp_fc1/kernel")):
        return _col(shape)
    if path.endswith(("attn/qkv/bias", "mlp_fc1/bias")):
        return P("model")
    if path.endswith(("attn/proj/kernel", "mlp_fc2/kernel", "skip_linear/kernel")):
        return _row(shape)
    return P()


def make_uvit_tp_spec(shards: int) -> Callable[[str, tuple], P]:
    """``uvit_tp_spec`` with the fused-qkv divisibility check bound to a shard
    count: the 3D qkv output dim is sharded only when divisible by 3*shards
    (whole q/k/v thirds per chip); otherwise that param stays replicated —
    numerics identical, and it avoids the mid-third reshard collectives a
    misaligned split would force."""

    def spec(path: str, shape: tuple) -> P:
        if path.endswith(("attn/qkv/kernel", "attn/qkv/bias")) and (
            shape[-1] % (3 * shards) != 0
        ):
            return P()
        return uvit_tp_spec(path, shape)

    return spec


def sd_unet_tp_spec(path: str, shape: tuple) -> P:
    """TP rule for ``models.sd_unet.SDUNet``'s transformer attention (the
    conv trunk stays replicated — at SD sizes convs fit one chip comfortably
    and channel-sharded convs pay halo exchanges that aren't worth it; the
    GEGLU FF stays replicated because its fused [val|gate] projection does
    not split contiguously across a model shard)."""
    if "attn" not in path:
        return P()
    if path.endswith(("to_q/kernel", "to_k/kernel", "to_v/kernel")):
        return _col(shape)
    if path.endswith("to_out/kernel"):
        return _row(shape)
    return P()
