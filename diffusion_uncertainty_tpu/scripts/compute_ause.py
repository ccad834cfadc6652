"""AUSE/AURG evaluation: noise real images halfway, denoise with uncertainty,
sparsify reconstruction error by accumulated uncertainty.

Parity: reference ``scripts/compute_ause.py`` (§3.2 of SURVEY.md): per batch,
``X_t = add_noise(2·X_0−1, ε, t_mid)``, denoise over the second half of the
chain collecting per-step uncertainty, sum the maps over steps, then
``compute_aucs(X_0, X_0_recon, Σu)`` averaged into
``results/ause/<dataset>/results_<scheduler>.yaml``.

Documented deviations (reference latent bugs, see docstrings):
  * the reference noises with the *step index* as the timestep
    (``compute_ause.py:27`` passes ``generation_steps//2`` to add_noise); we
    noise at the actual mid-chain timestep value ``timesteps[n//2]``.
  * the reference compares X_0 in [0,1] against uint8 recon in [0,255]
    (``:115-136``); default here compares both in [0,1]; pass
    ``--reference-scale true`` to reproduce the reference's scaling.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Optional

import numpy as np
import yaml

from ..diffusion.sampler import SamplerConfig, sample_ddim, to_uint8
from ..diffusion.schedule import spaced_timesteps
from ..factory import instantiate_model_scheduler
from ..metrics import compute_aucs
from ..uncertainty import EstimatorConfig, make_estimator
from ..utils import paths
from ..utils.config import parse_config, save_config
from ..utils.logging import get_logger
from .generate_dataset_score_uncertainty import select_apply_fn

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    dataset: str = "cifar10"
    scheduler_type: str = "uncertainty_centered"
    num_samples: int = 256
    batch_size: int = 32
    num_steps_uc: int = 20  # chain length; window = second half (ref protocol)
    M: int = 5
    num_zigzag: int = 3
    predict_next: bool = False
    seed: int = 0
    invert_uncertainty: bool = False
    reference_scale: bool = False
    data_root: Optional[str] = None  # folder dataset root; None -> synthetic
    random_init: bool = False
    dtype: str = "bfloat16"
    intervals: int = 50


def load_eval_dataset(cfg: Config, image_size: int):
    from ..datasets import CIFAR10Dataset, ImagenetDataset, SyntheticDataset

    if cfg.data_root is None:
        log.warning("no --data-root: using the synthetic dataset (smoke mode)")
        return SyntheticDataset(num_samples=cfg.num_samples, image_size=image_size)
    if cfg.dataset == "cifar10":
        return CIFAR10Dataset(cfg.data_root, image_size=image_size)
    return ImagenetDataset(cfg.data_root, "train", image_size=image_size)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..datasets.folder import iterate_batches

    cfg = parse_config(Config, argv)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
    bundle = instantiate_model_scheduler(
        cfg.dataset, dropout=0.1 if cfg.scheduler_type == "mc_dropout" else 0.0,
        dtype=dtype, random_init=cfg.random_init,
    )
    apply_fn, estimator_apply_fn = select_apply_fn(bundle, cfg.scheduler_type)

    n = cfg.num_steps_uc
    half = n // 2
    ts = spaced_timesteps(bundle.schedule.num_train_timesteps, n)
    t_mid = int(ts[half])
    sampler_cfg = SamplerConfig(
        num_inference_steps=n,
        num_train_timesteps=bundle.schedule.num_train_timesteps,
        after_step=half,
        num_steps_uc=n - half,
        start_step=half,
    )
    from ..uncertainty import resolve_scheduler_transform

    est, guid = resolve_scheduler_transform(
        EstimatorConfig(
            name=cfg.scheduler_type, M=cfg.M, num_zigzag=cfg.num_zigzag, predict_next=cfg.predict_next
        ),
        timesteps=ts,
    )

    def run_batch(p, x0, y, key):
        model_fn = lambda x, t, k: apply_fn(p, x, t, y, k)
        est_fn = (
            (lambda x, t, k: estimator_apply_fn(p, x, t, y, k))
            if estimator_apply_fn is not None else None
        )
        k_noise, k_sample = jax.random.split(key)
        x0s = 2.0 * x0 - 1.0
        noise = jax.random.normal(k_noise, x0.shape, jnp.float32)
        x_t = bundle.schedule.add_noise(x0s, noise, jnp.asarray(t_mid))
        res = sample_ddim(model_fn, bundle.schedule, x_t, k_sample, sampler_cfg, estimator=est, guidance=guid, estimator_model_fn=est_fn)
        return to_uint8(res.sample), res.uncertainty.sum(axis=0)

    run_jit = jax.jit(run_batch)
    dataset = load_eval_dataset(cfg, bundle.image_size)
    rng = np.random.RandomState(cfg.seed)
    indices = rng.permutation(len(dataset))[: cfg.num_samples]

    import jax.random as jr

    gts, recons, uncs = [], [], []
    for b, batch in enumerate(iterate_batches(dataset, cfg.batch_size, indices)):
        key = jr.fold_in(jr.key(cfg.seed), b)
        recon, u = run_jit(bundle.params, jnp.asarray(batch["image"]), jnp.asarray(batch["label"]), key)
        cnt = batch["count"]
        gts.append(batch["image"][:cnt])
        recons.append(np.asarray(recon)[:cnt])
        uncs.append(np.asarray(u)[:cnt])
        log.info("batch %d done", b)

    gt = np.concatenate(gts)
    recon = np.concatenate(recons).astype(np.float32)
    if not cfg.reference_scale:
        recon = recon / 255.0
    unc = np.concatenate(uncs)
    if cfg.invert_uncertainty:
        unc = -unc

    aucs, _ = compute_aucs(gt, recon, unc, intervals=cfg.intervals)
    ause, aurg = aucs["rmse"]
    log.info("Mean AUSE: %s, Mean AURG: %s", ause, aurg)

    out_dir = paths.ensure(paths.ause() / cfg.dataset)
    suffix = "_inverted" if cfg.invert_uncertainty else ""
    with open(out_dir / f"results_{cfg.scheduler_type}{suffix}.yaml", "w") as f:
        yaml.safe_dump({"mean_ause": str(ause), "mean_aurg": str(aurg)}, f)
    save_config(cfg, out_dir / "args.yaml")
    # append to the per-M curve record (ref ``plot_curve_M.py`` reads AUSE
    # across ensemble sizes; one JSONL line per run keeps all M values)
    import json

    with open(out_dir / f"ause_vs_M_{cfg.scheduler_type}{suffix}.jsonl", "a") as f:
        f.write(json.dumps({"M": cfg.M, "ause": float(ause), "aurg": float(aurg)}) + "\n")
    return ause, aurg


if __name__ == "__main__":
    main(sys.argv[1:])
