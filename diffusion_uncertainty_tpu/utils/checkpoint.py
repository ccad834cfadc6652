"""Orbax-based parameter checkpointing.

Replaces the reference's raw ``torch.save/load`` of model weights and
Lightning ``.ckpt`` files (SURVEY.md §5.4): converted params and trained
states save as Orbax checkpoints (async-capable, sharding-aware — every host
restores its own shards, replacing the vendored MPI broadcast pattern of
``metrics/iddpm/dist_util.py:53-72``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

__all__ = ["save_params", "load_params", "latest_step"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_params(path: Path, params: Any) -> Path:
    path = Path(path).absolute()
    _checkpointer().save(path, params, force=True)
    return path


def load_params(path: Path, template: Optional[Any] = None) -> Any:
    import jax
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if template is not None:
        # Restore with explicit per-leaf shardings derived from the template
        # (silences orbax's "missing sharding info, assuming single-device"
        # warning and keeps already-sharded templates sharded).
        def _restore_arg(leaf):
            if isinstance(leaf, jax.Array):
                return ocp.ArrayRestoreArgs(sharding=leaf.sharding, dtype=leaf.dtype)
            return ocp.RestoreArgs()

        restore_args = jax.tree.map(_restore_arg, template)
        return _checkpointer().restore(path, item=template, restore_args=restore_args)
    # No template: derive the tree from checkpoint metadata and restore every
    # leaf to the default device explicitly (otherwise orbax warns about
    # missing sharding info on every restore).
    ckptr = _checkpointer()
    tree = ckptr.metadata(path).item_metadata.tree
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    restore_args = jax.tree.map(lambda _m: ocp.ArrayRestoreArgs(sharding=sharding), tree)
    return ckptr.restore(path, restore_args=restore_args)


def latest_step(base: Path) -> Optional[Path]:
    """Newest step-numbered subdirectory of a run's checkpoint dir."""
    base = Path(base)
    if not base.exists():
        return None
    steps = sorted(
        (p for p in base.iterdir() if p.is_dir() and p.name.isdigit()),
        key=lambda p: int(p.name),
    )
    return steps[-1] if steps else None
