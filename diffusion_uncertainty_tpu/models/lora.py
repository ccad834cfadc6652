"""Low-rank adaptation over flax param trees (intrinsic-LoRA parity).

The reference applies peft LoRA adapters to SD attention projections
(intrinsic-LoRA usage; see ``pipeline_uncertainty`` SD pipelines). Here a LoRA
adapter is a flat ``{path: {"a": [in,r], "b": [r,out]}}`` dict over the 2-D
``kernel`` leaves of any flax params tree — merged functionally with
``apply_lora`` (weights stay pure data; the merged tree feeds the same jitted
apply_fn, so serving pays zero per-step adapter cost).

``convert_peft_lora`` ingests peft/diffusers state dicts
(``*.lora_A.weight``/``*.lora_B.weight`` pairs, torch [out,in] layout).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init_lora", "apply_lora", "lora_param_count", "convert_peft_lora"]

LoraTree = Dict[str, Dict[str, jnp.ndarray]]


def _kernel_paths(params, match: Optional[str]) -> Dict[str, tuple]:
    """{joined-path-to-parent: shape} for every 2-D 'kernel' leaf."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if keys and keys[-1] == "kernel" and leaf.ndim == 2:
            parts = [str(k) for k in keys[:-1]]
            # drop the flax 'params' collection prefix — apply_lora addresses
            # paths inside the collection
            if parts and parts[0] == "params":
                parts = parts[1:]
            joined = "/".join(parts)
            if match is None or match in joined:
                out[joined] = leaf.shape
    return out


def init_lora(
    params,
    rank: int,
    key: Optional[jax.Array] = None,
    match: Optional[str] = None,
    a_std: float = 0.02,
) -> LoraTree:
    """Create a rank-``rank`` adapter for every 2-D kernel (optionally filtered
    by substring ``match``). ``b`` starts at zero so the adapter is an exact
    no-op until trained — the reference peft convention."""
    targets = _kernel_paths(params, match)
    if key is None:
        key = jax.random.key(0)
    keys = jax.random.split(key, max(len(targets), 1))
    lora: LoraTree = {}
    for (path, shape), k in zip(sorted(targets.items()), keys):
        d_in, d_out = shape
        lora[path] = {
            "a": a_std * jax.random.normal(k, (d_in, rank), jnp.float32),
            "b": jnp.zeros((rank, d_out), jnp.float32),
        }
    return lora


def apply_lora(params, lora: LoraTree, scale: float = 1.0):
    """Return a params tree with ``kernel += scale * (a @ b)`` at each adapted
    path; everything else is shared (no copy)."""

    def visit(tree, prefix):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            path = f"{prefix}/{name}" if prefix else str(name)
            if name == "kernel" and prefix in lora:
                delta = lora[prefix]["a"] @ lora[prefix]["b"]
                out[name] = sub + scale * delta.astype(sub.dtype)
            else:
                out[name] = visit(sub, path)
        return out

    # strip a leading 'params' collection prefix transparently
    if isinstance(params, dict) and set(params) == {"params"}:
        return {"params": apply_lora(params["params"], lora, scale)}
    return visit(params, "")


def lora_param_count(lora: LoraTree) -> int:
    return sum(int(np.prod(m["a"].shape)) + int(np.prod(m["b"].shape)) for m in lora.values())


def convert_peft_lora(
    state_dict: dict, map_fn: Callable[[str], Optional[str]]
) -> LoraTree:
    """peft/diffusers LoRA state dict -> adapter tree.

    torch stores ``lora_A.weight`` [r, in] and ``lora_B.weight`` [out, r];
    both transpose into our (a [in,r], b [r,out]) layout. ``map_fn`` maps the
    torch module name (key minus the ``.lora_X.weight`` suffix) to the flax
    kernel-parent path, or None to skip. Raises ValueError on unpaired
    adapters."""
    lora: LoraTree = {}
    for key, val in state_dict.items():
        if not key.endswith(".lora_A.weight"):
            continue
        module = key[: -len(".lora_A.weight")]
        target = map_fn(module)
        if target is None:
            continue
        b_key = f"{module}.lora_B.weight"
        if b_key not in state_dict:
            raise ValueError(f"unpaired LoRA adapter: {key} has no {b_key}")
        a = np.asarray(val, np.float32).T  # [in, r]
        b = np.asarray(state_dict[b_key], np.float32).T  # [r, out]
        if a.shape[1] != b.shape[0]:
            raise ValueError(f"rank mismatch for {module}: {a.shape} vs {b.shape}")
        lora[target] = {"a": jnp.asarray(a), "b": jnp.asarray(b)}
    return lora
