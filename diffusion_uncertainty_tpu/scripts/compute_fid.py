"""FID tooling: real-dataset statistics + the drop-top-uncertain experiment.

Two subcommands (via ``--mode``):

  stats — cache real-dataset Inception statistics
          (reference ``scripts/compute_dataset_fid.py``: InceptionV3 features →
          mu/sigma → ``results/fid-stats/<dataset>/``).

  drop  — the Table-1 experiment (reference ``scripts/compute_fid_imagenet.py
          :29-185``): score each generated sample by total uncertainty, drop
          the top p% most-(or least-)uncertain, FID the kept set against the
          real statistics, and compare to a random drop of the same size.

Feature extractor: pytorch-fid InceptionV3 when its weight file is present
under ``models/`` (``--inception-weights``); otherwise the deterministic
random-projection extractor (relative A/B comparisons only — absolute FID
needs the real weights).
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path
from typing import Optional

import numpy as np

from ..metrics.features import InceptionV3Features, RandomConvFeatures
from ..metrics.fid import compute_statistics, extract_features, fid_from_stats, load_stats, save_stats
from ..utils import paths
from ..utils.config import parse_config
from ..utils.experiments import load_run_arrays
from ..utils.logging import MetricsSink, get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    mode: str = "drop"  # stats | drop
    dataset: str = "cifar10"
    # stats mode
    data_root: Optional[str] = None
    num_samples: int = 10000
    batch_size: int = 64
    # drop mode
    run_dir: Optional[str] = None
    drop_fraction: float = 0.1
    drop_mode: str = "most"  # most | least | random
    seed: int = 0
    inception_weights: Optional[str] = None
    feature_dim: int = 256  # random extractor dim when no weights


def make_extractor(cfg: Config):
    w = cfg.inception_weights or (paths.models_dir() / "pt_inception-2015-12-05-6726825d.pth")
    if Path(w).exists():
        log.info("using InceptionV3 features from %s", w)
        return InceptionV3Features(Path(w))
    log.warning("no Inception weights at %s — using RandomConvFeatures (relative FID only)", w)
    return RandomConvFeatures(dim=cfg.feature_dim)


def mode_stats(cfg: Config):
    from ..datasets import CIFAR10Dataset, ImagenetDataset, SyntheticDataset
    from ..datasets.folder import iterate_batches
    from ..factory import DATASET_IMAGE_SIZE

    size = DATASET_IMAGE_SIZE[cfg.dataset]
    if cfg.data_root is None:
        log.warning("no --data-root: synthetic dataset (smoke mode)")
        ds = SyntheticDataset(num_samples=cfg.num_samples, image_size=size)
    elif cfg.dataset == "cifar10":
        ds = CIFAR10Dataset(cfg.data_root, image_size=size)
    else:
        ds = ImagenetDataset(cfg.data_root, "train", image_size=size)

    ext = make_extractor(cfg)
    feats = []
    n = min(cfg.num_samples, len(ds))
    for batch in iterate_batches(ds, cfg.batch_size, range(n)):
        imgs = (batch["image"] * 255).astype(np.uint8)[: batch["count"]]
        feats.append(extract_features(ext, imgs, cfg.batch_size))
    mu, sigma = compute_statistics(np.concatenate(feats))
    out = save_stats(cfg.dataset, mu, sigma)
    log.info("saved stats (%d samples) -> %s", n, out)
    return out


def drop_indices(total_u: np.ndarray, fraction: float, mode: str, seed: int) -> np.ndarray:
    """Keep-indices after dropping `fraction` by per-sample uncertainty score
    (sum over all pixels/steps — reference ``compute_fid_imagenet.py`` keeps
    the complement of the top-p%)."""
    n = total_u.shape[0]
    k = int(round(n * fraction))
    order = np.argsort(total_u)  # ascending
    if mode == "most":
        return order[: n - k]  # drop the k most uncertain
    if mode == "least":
        return order[k:]
    rng = np.random.RandomState(seed)
    return rng.permutation(n)[: n - k]


def mode_drop(cfg: Config):
    run = Path(cfg.run_dir)
    gen = load_run_arrays(run, "gen_images")  # [N, H, W, 3] uint8
    unc = load_run_arrays(run, "uncertainty")  # [N, W, H, W, C]
    total_u = unc.reshape(unc.shape[0], -1).sum(axis=1)

    ext = make_extractor(cfg)
    real_stats = load_stats(cfg.dataset)
    feats = extract_features(ext, gen, cfg.batch_size)

    results = {}
    for mode in (cfg.drop_mode, "random"):
        keep = drop_indices(total_u, cfg.drop_fraction, mode, cfg.seed)
        stats = compute_statistics(feats[keep])
        results[f"fid_drop_{mode}"] = fid_from_stats(stats, real_stats)
    results.update(
        dataset=cfg.dataset,
        run_dir=str(run),
        drop_fraction=cfg.drop_fraction,
        num_samples=int(gen.shape[0]),
    )
    MetricsSink(paths.results() / "fid_scores.json").append(results)
    log.info("FID drop results: %s", json.dumps(results))
    return results


def main(argv=None):
    cfg = parse_config(Config, argv)
    if cfg.mode == "stats":
        return mode_stats(cfg)
    if cfg.mode == "drop":
        if not cfg.run_dir:
            raise SystemExit("--run-dir required in drop mode")
        return mode_drop(cfg)
    raise SystemExit(f"unknown mode {cfg.mode}")


if __name__ == "__main__":
    main(sys.argv[1:])
