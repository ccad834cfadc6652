"""Improved precision/recall of generated runs vs a real-feature manifold.

Parity: reference ``scripts/compute_pr_true_dataset.py`` (build and cache the
real manifold features) and ``scripts/compute_pr_generated_samples.py``
(P&R of the kept-vs-dropped-uncertain generated sets). Protocol extractor is
VGG16-fc2 (``--vgg-weights``, reference ``metrics/precision_recall.py:128-161``);
falls back to Inception / random-projection features when VGG weights are
unavailable (relative comparisons only, numbers not paper-comparable).
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Optional

import numpy as np

from ..metrics.fid import extract_features
from ..metrics.precision_recall import precision_recall
from ..utils import paths
from ..utils.config import parse_config
from ..utils.experiments import load_run_arrays
from ..utils.logging import MetricsSink, get_logger
from .compute_fid import Config as FidConfig, drop_indices, make_extractor

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    mode: str = "generated"  # real | generated
    dataset: str = "cifar10"
    data_root: Optional[str] = None
    num_samples: int = 5000
    batch_size: int = 64
    run_dir: Optional[str] = None
    drop_fraction: float = 0.1
    drop_mode: str = "most"
    k: int = 3
    seed: int = 0
    vgg_weights: Optional[str] = None  # torchvision vgg16 state dict (the reference protocol)
    inception_weights: Optional[str] = None  # fallback extractor


def _pr_extractor(cfg: Config):
    """VGG16-fc2 (reference protocol) when weights exist, else FID fallback."""
    from ..metrics.features import VGG16Features

    w = cfg.vgg_weights or (paths.models_dir() / "vgg16-397923af.pth")
    if Path(w).exists():
        log.info("using VGG16-fc2 features from %s (reference P&R protocol)", w)
        return VGG16Features(Path(w))
    log.warning("no VGG16 weights at %s — falling back to FID extractor (relative P&R only)", w)
    return make_extractor(FidConfig(dataset=cfg.dataset, inception_weights=cfg.inception_weights))


def _real_features_path(dataset: str) -> Path:
    return paths.ensure(paths.results() / "pr-features") / f"{dataset}_real.npy"


def mode_real(cfg: Config):
    from ..datasets import CIFAR10Dataset, ImagenetDataset, SyntheticDataset
    from ..datasets.folder import iterate_batches
    from ..factory import DATASET_IMAGE_SIZE

    size = DATASET_IMAGE_SIZE[cfg.dataset]
    if cfg.data_root is None:
        log.warning("no --data-root: synthetic smoke dataset")
        ds = SyntheticDataset(num_samples=cfg.num_samples, image_size=size)
    elif cfg.dataset == "cifar10":
        ds = CIFAR10Dataset(cfg.data_root, image_size=size)
    else:
        ds = ImagenetDataset(cfg.data_root, "train", image_size=size)
    ext = _pr_extractor(cfg)
    feats = []
    for batch in iterate_batches(ds, cfg.batch_size, range(min(cfg.num_samples, len(ds)))):
        imgs = (batch["image"] * 255).astype(np.uint8)[: batch["count"]]
        feats.append(extract_features(ext, imgs, cfg.batch_size))
    out = _real_features_path(cfg.dataset)
    np.save(out, np.concatenate(feats))
    log.info("cached real manifold features -> %s", out)
    return out


def mode_generated(cfg: Config):
    real = np.load(_real_features_path(cfg.dataset))
    run = Path(cfg.run_dir)
    gen = load_run_arrays(run, "gen_images")
    unc = load_run_arrays(run, "uncertainty")
    total_u = unc.reshape(unc.shape[0], -1).sum(axis=1)
    ext = _pr_extractor(cfg)
    feats = extract_features(ext, gen, cfg.batch_size)

    results = {"dataset": cfg.dataset, "run_dir": str(run), "k": cfg.k, "drop_fraction": cfg.drop_fraction}
    for mode in (cfg.drop_mode, "random"):
        keep = drop_indices(total_u, cfg.drop_fraction, mode, cfg.seed)
        pr = precision_recall(real, feats[keep], k=cfg.k)
        results[f"precision_drop_{mode}"] = pr.precision
        results[f"recall_drop_{mode}"] = pr.recall
    MetricsSink(paths.results() / "precision_recall.json").append(results)
    log.info("P&R: %s", results)
    return results


def main(argv=None):
    cfg = parse_config(Config, argv)
    if cfg.mode == "real":
        return mode_real(cfg)
    if not cfg.run_dir:
        raise SystemExit("--run-dir required in generated mode")
    return mode_generated(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
