"""Finetune a diffusion UNet onto its best-of-M flip-disagreement noises.

Parity: reference ``ddpm_finetune_noise.py`` driven by Lightning; here the
jitted train step from ``training.finetune_noise`` over a folder/synthetic
dataset, with orbax checkpoints per epoch.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Optional

import numpy as np

from ..factory import instantiate_model_scheduler
from ..training.finetune_noise import FinetuneNoiseConfig, make_finetune_step
from ..utils import paths
from ..utils.checkpoint import save_params
from ..utils.config import parse_config, save_config
from ..utils.logging import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    dataset: str = "cifar10"
    data_root: Optional[str] = None  # None -> synthetic smoke
    epochs: int = 1
    steps_per_epoch: int = 100
    batch_size: int = 16
    M: int = 4
    lr: float = 1e-4
    time_zone: str = "all"
    mode: str = "min"
    optimizer: str = "adam"
    seed: int = 0
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

    def model_apply(params, x, t, y):
        return bundle.apply_fn(params, x, t, y, None)

    ft_cfg = FinetuneNoiseConfig(
        M=cfg.M, lr=cfg.lr, time_zone=cfg.time_zone, mode=cfg.mode, optimizer=cfg.optimizer
    )
    init_fn, step_fn = make_finetune_step(model_apply, bundle.schedule, ft_cfg)
    state = init_fn(bundle.params)

    if cfg.data_root is None:
        log.warning("no --data-root: synthetic smoke dataset")
        ds = SyntheticDataset(num_samples=cfg.batch_size * cfg.steps_per_epoch, image_size=bundle.image_size)
    elif cfg.dataset == "cifar10":
        ds = CIFAR10Dataset(cfg.data_root, image_size=bundle.image_size)
    else:
        ds = ImagenetDataset(cfg.data_root, "train", image_size=bundle.image_size)

    out = paths.ensure(paths.results() / "finetune-noise" / cfg.dataset)
    step = 0
    for epoch in range(cfg.epochs):
        losses = []
        for b, batch in enumerate(iterate_batches(ds, cfg.batch_size, drop_remainder=True)):
            if b >= cfg.steps_per_epoch:
                break
            x0 = jnp.asarray(batch["image"]) * 2.0 - 1.0
            y = jnp.asarray(batch["label"]) if bundle.num_classes else None
            state, loss = step_fn(state, x0, y, jax.random.fold_in(jax.random.key(cfg.seed), step))
            losses.append(float(loss))
            step += 1
        log.info("epoch %d: loss %.5f (%d steps)", epoch, float(np.mean(losses)), len(losses))
        save_params(out / f"ckpt_epoch{epoch}", state.params)
    save_config(cfg, out / "train_args.yaml")
    log.info("finetuned checkpoints under %s", out)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
