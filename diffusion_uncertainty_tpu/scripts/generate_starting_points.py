"""Pre-generate shared diffusion starting tensors X_T / y per dataset.

Parity: reference ``scripts/generate_diffusion_starting_data.py:26-65`` —
61 000 (60k + 1k extra) gaussian inits and uniform labels per dataset with a
fixed per-dataset seed chain starting at 49394, so every experiment samples
from the same starting points. Stored as npz (NHWC) under
``data/diffusion-starting-points/<dataset>/``.
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np

from ..utils import paths
from ..utils.config import parse_config
from ..utils.logging import get_logger

log = get_logger(__name__)

_DATASETS = [
    # (name, H, W, C, num_classes) — latent-space entries are AE-downsampled by 8
    ("imagenet64", 64, 64, 3, 1000),
    ("imagenet128", 128, 128, 3, 1000),
    ("imagenet128_uvit", 16, 16, 4, 1000),
    ("imagenet256", 32, 32, 4, 1000),
    ("imagenet512", 64, 64, 4, 1000),
    ("cifar10", 32, 32, 3, 10),
]


@dataclasses.dataclass
class Config:
    num_samples: int = 60_000
    extra_samples: int = 1_000
    seed: int = 49394
    datasets: tuple = tuple(d[0] for d in _DATASETS)


def main(argv=None) -> None:
    cfg = parse_config(Config, argv)
    seed = cfg.seed
    total = cfg.num_samples + cfg.extra_samples
    for name, h, w, c, num_classes in _DATASETS:
        if name not in cfg.datasets:
            seed += 1
            continue
        rng = np.random.RandomState(seed)
        x_t = rng.randn(total, h, w, c).astype(np.float32)
        y = rng.randint(0, num_classes, size=total).astype(np.int32)
        dest = paths.ensure(paths.starting_points() / name)
        np.savez(dest / "X_T.npz", data=x_t)
        np.savez(dest / "y.npz", data=y)
        log.info("%s: X_T %s (mean %.4f std %.4f) seed %d -> %s", name, x_t.shape, x_t.mean(), x_t.std(), seed, dest)
        seed += 1


if __name__ == "__main__":
    main(sys.argv[1:])
