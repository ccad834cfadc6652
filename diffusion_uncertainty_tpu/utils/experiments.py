"""Experiment run management: run dirs, artifact shards, discovery, concat.

Artifact-layout parity with the reference so downstream tooling translates
1:1 (``scripts/generate_dataset_score_uncertainty_imagenet.py:90-134``,
``utils_experiments.py:11-86``):

    results/score-uncertainty/<YYYY-MM-DD_HH-MM-SS>/
        args.yaml                 run metadata (config round-trip)
        uncertainty_<shard>.npz   per-shard arrays
        gen_images_<shard>.npz
        score_<shard>.npz         (reference writes rank-unsuffixed score.pth,
                                   overwritten by every rank — a race we fix by
                                   always suffixing, SURVEY.md §5.2)
        timestep.npz

npz replaces torch ``.pth`` as the tensor container (framework-neutral,
mmap-able); keys are stored under 'data'.
"""

from __future__ import annotations

import datetime
from pathlib import Path
from typing import Any, Iterator, Optional

import numpy as np
import yaml

from . import paths
from .config import save_config

__all__ = [
    "new_run_dir",
    "save_shard",
    "load_shard",
    "load_run_arrays",
    "find_runs",
    "clean_empty_runs",
]


def new_run_dir(base: Optional[Path] = None, config: Any = None, timestamp: Optional[str] = None) -> Path:
    base = base or paths.score_uncertainty()
    ts = timestamp or datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    run = paths.ensure(base / ts)
    if config is not None:
        save_config(config, run / "args.yaml")
    return run


def save_shard(run_dir: Path, name: str, shard: int, array: np.ndarray) -> Path:
    """One writer per (name, shard) file — no cross-worker races."""
    path = Path(run_dir) / f"{name}_{shard}.npz"
    np.savez_compressed(path, data=np.asarray(array))
    return path


def load_shard(run_dir: Path, name: str, shard: int) -> np.ndarray:
    with np.load(Path(run_dir) / f"{name}_{shard}.npz") as f:
        return f["data"]


def load_run_arrays(run_dir: Path, name: str) -> np.ndarray:
    """Concatenate all shards of an artifact along the batch axis, ordered by
    shard index (reference ``load_uncertainty_run``, ``utils_experiments.py:39-86``)."""
    run_dir = Path(run_dir)
    shards = sorted(
        run_dir.glob(f"{name}_*.npz"),
        key=lambda p: int(p.stem.rsplit("_", 1)[1]),
    )
    if not shards:
        raise FileNotFoundError(f"no '{name}_*.npz' shards in {run_dir}")
    arrays = []
    for p in shards:
        with np.load(p) as f:
            arrays.append(f["data"])
    return np.concatenate(arrays, axis=0)


def _matches(meta: dict, query: dict) -> bool:
    return all(meta.get(k) == v for k, v in query.items())


def find_runs(base: Optional[Path] = None, **query: Any) -> Iterator[Path]:
    """Scan run dirs' args.yaml for matching metadata (reference
    ``search_uncertainty_run_by``, ``utils_experiments.py:11-37``)."""
    base = base or paths.score_uncertainty()
    if not Path(base).exists():
        return
    for run in sorted(Path(base).iterdir()):
        meta_file = run / "args.yaml"
        if not meta_file.exists():
            continue
        try:
            meta = yaml.safe_load(meta_file.read_text()) or {}
        except yaml.YAMLError:
            continue
        if _matches(meta, query):
            yield run


def clean_empty_runs(base: Optional[Path] = None) -> list[Path]:
    """Delete run dirs that contain no artifact shards (crashed runs) —
    reference ``scripts/clean_empty_runs.py:5-11``."""
    base = base or paths.score_uncertainty()
    removed = []
    if not Path(base).exists():
        return removed
    for run in sorted(Path(base).iterdir()):
        if not run.is_dir():
            continue
        if not any(run.glob("*.npz")):
            for f in run.iterdir():
                f.unlink()
            run.rmdir()
            removed.append(run)
    return removed
