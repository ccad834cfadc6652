"""Fréchet Inception Distance: device-batched features, f64 host Fréchet math.

Parity targets: reference ``fid.py`` (torchmetrics path :38-49 and
"BayesDiff-style" pytorch-fid path :73-122) and
``scripts/compute_dataset_fid.py:281-336`` (``calculate_frechet_distance``).

Split of labour (SURVEY.md §7.3.8): feature extraction runs batched on TPU
through a pluggable extractor (``features.py``); mean/covariance accumulate as
psum-friendly running sums; the matrix square root runs in float64 on the host
(scipy) where the numerics demand it. Real-dataset statistics are cached as
``results/fid-stats/<dataset>/{mu,sigma}.npy`` (the reference's ``m.pt/s.pt``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils import paths

__all__ = [
    "RunningStats",
    "frechet_distance",
    "fid_from_stats",
    "compute_statistics",
    "save_stats",
    "load_stats",
    "FIDEvaluator",
]


class RunningStats:
    """Streaming mean/covariance via (count, Σx, Σxxᵀ) — the sums are plain
    adds, so cross-device reduction is a psum and shard concat is trivial."""

    def __init__(self, dim: int):
        self.n = 0
        self.s1 = np.zeros(dim, np.float64)
        self.s2 = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.s1 += f.sum(axis=0)
        self.s2 += f.T @ f

    def merge(self, other: "RunningStats") -> None:
        self.n += other.n
        self.s1 += other.s1
        self.s2 += other.s2

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        if self.n < 2:
            raise ValueError("need >= 2 samples for covariance")
        mu = self.s1 / self.n
        cov = (self.s2 - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) with the reference's ``np.cov``/(n-1) convention."""
    rs = RunningStats(features.shape[1])
    rs.update(features)
    return rs.finalize()


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray, eps: float = 1e-6
) -> float:
    """||μ1−μ2||² + Tr(Σ1 + Σ2 − 2√(Σ1Σ2)), float64, with the reference's
    eps-jitter retry and imaginary-component guard
    (``scripts/compute_dataset_fid.py:281-336``)."""
    from scipy import linalg

    mu1 = np.atleast_1d(np.asarray(mu1, np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(f"imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_stats(stats1, stats2) -> float:
    return frechet_distance(stats1[0], stats1[1], stats2[0], stats2[1])


def _stats_dir(dataset: str, base: Optional[Path] = None) -> Path:
    return paths.ensure((base or paths.fid_stats()) / dataset)


def save_stats(dataset: str, mu: np.ndarray, sigma: np.ndarray, base: Optional[Path] = None) -> Path:
    d = _stats_dir(dataset, base)
    np.save(d / "mu.npy", mu)
    np.save(d / "sigma.npy", sigma)
    return d


def load_stats(dataset: str, base: Optional[Path] = None) -> Tuple[np.ndarray, np.ndarray]:
    d = _stats_dir(dataset, base)
    return np.load(d / "mu.npy"), np.load(d / "sigma.npy")


class FIDEvaluator:
    """Incremental FID against cached real statistics — the reference's
    torchmetrics evaluator pre-loaded with real stats (``fid.py:38-49``)."""

    def __init__(self, extractor, real_stats: Tuple[np.ndarray, np.ndarray], batch_size: int = 64):
        self.extractor = extractor
        self.real_stats = real_stats
        self.batch_size = batch_size
        self.stats = RunningStats(extractor.dim)

    def update(self, images_uint8: np.ndarray) -> None:
        """images [N, H, W, 3] uint8."""
        for lo in range(0, images_uint8.shape[0], self.batch_size):
            batch = images_uint8[lo : lo + self.batch_size]
            feats = np.asarray(self.extractor(jnp.asarray(batch)))
            self.stats.update(feats)

    def compute(self) -> float:
        return fid_from_stats(self.stats.finalize(), self.real_stats)


def extract_features(extractor, images_uint8: np.ndarray, batch_size: int = 64) -> np.ndarray:
    out = []
    for lo in range(0, images_uint8.shape[0], batch_size):
        out.append(np.asarray(extractor(jnp.asarray(images_uint8[lo : lo + batch_size]))))
    return np.concatenate(out, axis=0)
