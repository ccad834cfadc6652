"""Generate per-sample pixel-wise uncertainty maps — the north-star entry point.

Parity: reference ``scripts/generate_dataset_score_uncertainty_{imagenet,
cifar10,imagenet_classifier_guidance}.py`` unified into one CLI (the dataset /
conditioning / guidance variations are data, not copies). The reference
shards work across GPUs via ``torch.multiprocessing.spawn``; here a single
program shards the batch across the device mesh (``--mesh-data N``) and/or
across hosts via ``--worker-index/--num-workers`` contiguous index ranges with
per-worker artifact shards (same resume/sharding semantics,
``...imagenet.py:51-57,90-93``).

Example (reference readme parity):
    python -m diffusion_uncertainty_tpu.scripts.generate_dataset_score_uncertainty \
        --dataset imagenet128 --scheduler-type uncertainty_zigzag_centered \
        --num-samples 10000 --batch-size 128 --M 5 --generation-steps 50 \
        --start-step-uc 40 --num-steps-uc 10
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Optional

import numpy as np

from ..classifier_guidance import with_classifier_guidance
from ..diffusion.sampler import SamplerConfig
from ..diffusion.ddim import DiffusionConfig
from ..factory import instantiate_model_scheduler, load_classifier
from ..parallel.mesh import local_shard_bounds, make_mesh
from ..sampling import generate_uncertainty_dataset
from ..uncertainty import EstimatorConfig, make_estimator
from ..utils import paths
from ..utils.config import parse_config
from ..utils.experiments import new_run_dir
from ..utils.logging import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    """Flags mirror the reference CLI (``...imagenet.py:147-178``,
    ``diffusion_uncertainty/argparse.py:4-48``)."""

    dataset: str = "cifar10"
    scheduler_type: str = "uncertainty_centered"
    num_samples: int = 300
    batch_size: int = 32
    generation_steps: int = 20
    M: int = 30
    start_step_uc: int = 0
    num_steps_uc: int = 20
    seed: int = 0
    eta: float = 0.0
    dropout: float = 0.1
    start_index: int = 0
    predict_next: bool = False
    uncertainty_distance: int = 20
    num_zigzag: int = 3
    ensemble_chunk: int = 0
    # classifier guidance (reference ..._classifier_guidance.py)
    classifier_scale: float = 0.0
    # parallelism
    mesh_data: int = 0  # 0 = no mesh (single chip)
    worker_index: int = 0
    num_workers: int = 1
    # environment
    checkpoint: Optional[str] = None
    random_init: bool = False
    dtype: str = "bfloat16"
    run_dir: Optional[str] = None


def select_apply_fn(bundle, scheduler_type: str):
    """(trajectory_fn, estimator_fn-or-None).

    The stochastic variants' noise lives ONLY in the uncertainty ensemble —
    the reference flips the unet into its noisy mode inside the u block and
    back out (mc_dropout train()/eval() ``scheduling_ddim_mc_dropout.py:499,
    519``; activation-noise hooks registered/removed ``scheduling_ddim_
    uncertainty.py:520-542``), so the trajectory forward is deterministic."""
    if scheduler_type == "mc_dropout":
        return bundle.apply_fn, bundle.apply_fn_dropout
    if scheduler_type in ("uncertainty", "uncertainty_original"):
        return bundle.apply_fn, bundle.apply_fn_act_noise
    return bundle.apply_fn, None


def load_starting_points(dataset: str, start: int, stop: int):
    folder = paths.starting_points() / dataset
    if (folder / "X_T.npz").exists():
        with np.load(folder / "X_T.npz") as f:
            x = f["data"][start:stop]
        with np.load(folder / "y.npz") as f:
            y = f["data"][start:stop]
        return x, y
    raise FileNotFoundError(
        f"{folder}/X_T.npz not found — run scripts.generate_starting_points first"
    )


def main(argv=None):
    import jax.numpy as jnp

    cfg = parse_config(Config, argv)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
    bundle = instantiate_model_scheduler(
        cfg.dataset,
        dropout=cfg.dropout if cfg.scheduler_type == "mc_dropout" else 0.0,
        dtype=dtype,
        checkpoint=Path(cfg.checkpoint) if cfg.checkpoint else None,
        random_init=cfg.random_init,
    )

    # contiguous per-worker slice of the shared starting points (ref :51-57)
    w_start, w_stop = local_shard_bounds(cfg.num_samples, cfg.worker_index, cfg.num_workers)
    x_t, y = load_starting_points(cfg.dataset, cfg.start_index + w_start, cfg.start_index + w_stop)
    if bundle.num_classes is None:
        y = None

    sampler_cfg = SamplerConfig(
        num_inference_steps=cfg.generation_steps,
        num_train_timesteps=bundle.schedule.num_train_timesteps,
        diffusion=DiffusionConfig(eta=cfg.eta),
        after_step=cfg.start_step_uc,
        num_steps_uc=cfg.num_steps_uc,
    )
    est_cfg = EstimatorConfig(
        name=cfg.scheduler_type,
        M=cfg.M,
        num_zigzag=cfg.num_zigzag,
        predict_next=cfg.predict_next,
        uncertainty_distance=cfg.uncertainty_distance,
        ensemble_chunk=cfg.ensemble_chunk,
        eta=cfg.eta,
    )
    from ..diffusion.schedule import spaced_timesteps

    ts = spaced_timesteps(bundle.schedule.num_train_timesteps, cfg.generation_steps)
    from ..uncertainty import resolve_scheduler_transform

    estimator, guidance = resolve_scheduler_transform(
        est_cfg, timesteps=ts, dcfg=DiffusionConfig(eta=cfg.eta)
    )

    apply_fn, estimator_apply_fn = select_apply_fn(bundle, cfg.scheduler_type)
    params = bundle.params
    if cfg.classifier_scale > 0:
        clf_model, clf_params, _ = load_classifier(cfg.dataset, random_init=cfg.random_init)
        params = {**params, "classifier": clf_params}
        if estimator_apply_fn is None:
            # classifier guidance modifies only the trajectory's model output;
            # the reference's predict_model runs the PLAIN unet in the u block
            estimator_apply_fn = apply_fn
        apply_fn = with_classifier_guidance(
            apply_fn,
            lambda p, x, t: clf_model.apply(p["classifier"], x, t),
            bundle.schedule,
            cfg.classifier_scale,
        )

    mesh = make_mesh(data=cfg.mesh_data) if cfg.mesh_data > 1 else None
    run_dir = Path(cfg.run_dir) if cfg.run_dir else new_run_dir(config=cfg)
    log.info("run dir: %s", run_dir)
    if not (run_dir / "args.yaml").exists():
        from ..utils.config import save_config

        save_config(cfg, run_dir / "args.yaml")

    shard_offset = cfg.worker_index * 100000  # disjoint shard id space per worker
    sampler = "dpm" if cfg.scheduler_type == "dpm_2_uncertainty_centered" else "ddim"
    res = generate_uncertainty_dataset(
        apply_fn,
        bundle.schedule,
        sampler_cfg,
        x_t,
        y,
        cfg.batch_size,
        params=params,
        seed=cfg.seed,
        estimator=estimator,
        guidance=guidance,
        estimator_apply_fn=estimator_apply_fn,
        mesh=mesh,
        run_dir=run_dir,
        shard_offset=shard_offset,
        keep_in_memory=False,
        decode_fn=bundle.decode_fn,
        sampler=sampler,
    )
    log.info("done; artifacts in %s", run_dir)
    return run_dir


if __name__ == "__main__":
    main(sys.argv[1:])
