"""Bits-per-dim NLL evaluation over the shared starting points.

Parity: reference ``scripts/compute_nll.py`` + ``metrics/nll.py:13-65``
(``run_bpd_evaluation``): run the learned-variance variational bound over real
or starting-point images with the ADM 6-channel model.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Optional

import numpy as np
import yaml

from ..factory import instantiate_model_scheduler
from ..metrics.nll import calc_bpd_loop
from ..utils import paths
from ..utils.config import parse_config
from ..utils.logging import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    dataset: str = "imagenet64"
    num_samples: int = 64
    batch_size: int = 8
    seed: int = 0
    variance_type: str = "learned_range"
    data_root: Optional[str] = None  # real images; None -> synthetic smoke
    random_init: bool = False
    dtype: str = "bfloat16"


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..datasets import CIFAR10Dataset, ImagenetDataset, SyntheticDataset
    from ..datasets.folder import iterate_batches

    cfg = parse_config(Config, argv)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
    bundle = instantiate_model_scheduler(cfg.dataset, dtype=dtype, random_init=cfg.random_init)

    # 6-channel forward (epsilon + raw variance), class label fixed per batch
    def model6(p, y):
        def fn(x, t, key):
            tt = jnp.broadcast_to(t, (x.shape[0],))
            return bundle.model.apply(p["model"], x, tt, y if bundle.num_classes else None)

        return fn

    if cfg.data_root is None:
        log.warning("no --data-root: synthetic smoke dataset")
        ds = SyntheticDataset(num_samples=cfg.num_samples, image_size=bundle.image_size)
    elif cfg.dataset == "cifar10":
        ds = CIFAR10Dataset(cfg.data_root, image_size=bundle.image_size)
    else:
        ds = ImagenetDataset(cfg.data_root, "val", image_size=bundle.image_size)

    bpd_jit = jax.jit(
        lambda p, x0, y, key: calc_bpd_loop(
            model6(p, y), bundle.schedule, x0, key, variance_type=cfg.variance_type
        ).total_bpd
    )

    totals = []
    for b, batch in enumerate(iterate_batches(ds, cfg.batch_size, range(min(cfg.num_samples, len(ds))))):
        x0 = jnp.asarray(batch["image"]) * 2.0 - 1.0
        y = jnp.asarray(batch["label"])
        bpd = bpd_jit(bundle.params, x0, y, jax.random.fold_in(jax.random.key(cfg.seed), b))
        totals.append(np.asarray(bpd)[: batch["count"]])
        log.info("batch %d: bpd %.4f", b, float(np.mean(totals[-1])))
    total = float(np.mean(np.concatenate(totals)))
    log.info("total bpd: %.4f over %d samples", total, sum(len(t) for t in totals))

    out = paths.ensure(paths.results() / "nll")
    with open(out / f"results_{cfg.dataset}.yaml", "w") as f:
        yaml.safe_dump({"total_bpd": total, **dataclasses.asdict(cfg)}, f)
    return total


if __name__ == "__main__":
    main(sys.argv[1:])
