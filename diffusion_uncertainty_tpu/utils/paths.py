"""Artifact path registry — lazily created, no import-time side effects.

The reference creates ~30 directories at import time (``paths.py:8-207``),
which breaks read-only environments and test isolation. Here every path is a
function; directories are created on first use. The on-disk layout mirrors the
reference so downstream tooling (run discovery, shard concat) stays compatible:
``results/score-uncertainty/<run-ts>/{args.yaml, uncertainty_<shard>.npz, ...}``.
"""

from __future__ import annotations

import os
from pathlib import Path

__all__ = [
    "root",
    "results",
    "models_dir",
    "data_dir",
    "score_uncertainty",
    "thresholds",
    "ause",
    "fid_stats",
    "starting_points",
    "ensure",
]


def root() -> Path:
    return Path(os.environ.get("DIFFUSION_UNCERTAINTY_ROOT", Path.cwd()))


def ensure(p: Path) -> Path:
    p.mkdir(parents=True, exist_ok=True)
    return p


def results() -> Path:
    return root() / "results"


def models_dir() -> Path:
    """Pretrained checkpoint directory (ref ``paths.py`` MODELS)."""
    return root() / "models"


def data_dir() -> Path:
    return root() / "data"


def score_uncertainty() -> Path:
    """Uncertainty-map generation runs (ref ``results/score-uncertainty/``)."""
    return results() / "score-uncertainty"


def thresholds() -> Path:
    """Per-timestep pixel-wise threshold artifacts (ref ``paths.py:167``)."""
    return results() / "thresholds"


def ause() -> Path:
    return results() / "ause"


def fid_stats() -> Path:
    """Cached real-dataset Inception statistics (ref ``results/score_dataset_pytorch_fid``)."""
    return results() / "fid-stats"


def starting_points() -> Path:
    """Shared X_T / y starting tensors (ref DIFFUSION_STARTING_POINTS, ``paths.py:36``)."""
    return data_dir() / "diffusion-starting-points"


def sd_uncertainty_guidance() -> Path:
    """Numbered output folders of the T2I guided-generation script (ref
    ``STABLE_DIFFUSION_UNCERTAINTY_GUIDANCE``, ``paths.py``)."""
    return results() / "stable-diffusion-uncertainty-guidance"


def sd3_uncertainty_guidance() -> Path:
    """Ref ``STABLE_DIFFUSION_3_UNCERTAINTY_GUIDANCE`` (``paths.py:28``)."""
    return results() / "stable-diffusion-3-uncertainty-guidance"


def flux_uncertainty_guidance() -> Path:
    """Ref ``FLUX_UNCERTAINTY_GUIDANCE`` (``paths.py:32``)."""
    return results() / "flux-uncertainty-guidance"
