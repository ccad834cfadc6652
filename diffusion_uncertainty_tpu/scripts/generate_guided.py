"""Uncertainty-guided generation A/B: plain DDIM vs guided pipelines (+FID).

Parity: reference ``scripts/generate_images_with_uncertainty_threshold.py``
(§3.3) and ``generate_images_with_uncertainty_percentile.py``: generate the
same starting points twice — plain and guided (gradient / posterior /
second-order / percentile / epsilon-mask) — then FID both sets against cached
real statistics and append to ``results/uncertainty_guidance/results.json``.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Optional

import numpy as np

from ..diffusion.ddim import DiffusionConfig
from ..diffusion.sampler import SamplerConfig
from ..factory import instantiate_model_scheduler
from ..sampling import generate_uncertainty_dataset
from ..uncertainty import EstimatorConfig
from ..uncertainty.guidance import (
    make_mask_guidance,
    make_mc_dropout_gradient_guidance,
    make_model_gradient_guidance,
    make_percentile_guidance,
    make_second_order_guidance,
    make_threshold_guidance,
)
from ..utils import paths
from ..utils.config import parse_config
from ..utils.logging import MetricsSink, get_logger
from .generate_dataset_score_uncertainty import load_starting_points, select_apply_fn

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    dataset: str = "cifar10"
    guidance: str = "posterior"  # posterior | gradient | second_order | percentile | mask
    num_samples: int = 128
    batch_size: int = 32
    generation_steps: int = 50
    M: int = 5
    start_step_uc: int = 40
    num_steps_uc: int = 10
    threshold: float = 0.95  # float -> per-image quantile
    threshold_file: Optional[str] = None  # per-timestep pixel-wise thresholds npz
    threshold_type: str = "higher"
    lr: float = 1.0
    eta: float = 0.0
    seed: int = 0
    start_index: int = 0
    random_init: bool = False
    dtype: str = "bfloat16"
    compute_fid: bool = True


def build_guidance(cfg: Config):
    thr = cfg.threshold
    window_offset = 0
    if cfg.threshold_file:
        with np.load(cfg.threshold_file) as f:
            thr = f["data"]
            window_offset = int(f["window_offset"]) if "window_offset" in f else 0
    dcfg = DiffusionConfig(eta=cfg.eta)
    # threshold tables are indexed by the reference at the GLOBAL loop index i
    # (``calculate_threshold_map`` reads threshold[i]); our npz stamps the
    # producing run's start_step_uc as window_offset (row j = global step
    # window_offset + j), so the effective table offset for this run's window
    # [start_step_uc, ...) is their difference
    offset = cfg.start_step_uc - window_offset if cfg.threshold_file else 0
    if cfg.threshold_file and offset < 0:
        raise SystemExit(
            f"threshold table starts at global step {window_offset} but this run's"
            f" window starts earlier (start_step_uc={cfg.start_step_uc})"
        )
    if cfg.guidance == "posterior":
        return make_threshold_guidance(
            M=cfg.M, threshold=thr, threshold_type=cfg.threshold_type, dcfg=dcfg,
            step_index_offset=offset, num_window_steps=cfg.num_steps_uc,
        )
    if cfg.guidance == "gradient":
        return make_percentile_guidance(M=cfg.M, percentile=float(cfg.threshold), use_posterior=False, lr=cfg.lr, dcfg=dcfg)
    if cfg.guidance == "percentile":
        return make_percentile_guidance(M=cfg.M, percentile=float(cfg.threshold), use_posterior=True, dcfg=dcfg)
    if cfg.guidance == "second_order":
        return make_second_order_guidance(
            M=cfg.M, threshold=thr, threshold_type=cfg.threshold_type, dcfg=dcfg,
            step_index_offset=offset, num_window_steps=cfg.num_steps_uc,
        )
    if cfg.guidance == "mask":
        return make_mask_guidance(EstimatorConfig(name="infer_noise", M=cfg.M), dcfg=dcfg)
    if cfg.guidance == "mc_dropout_gradient":
        return make_mc_dropout_gradient_guidance(M=cfg.M, dcfg=dcfg)
    if cfg.guidance == "model_gradient":
        return make_model_gradient_guidance(M=cfg.M, dcfg=dcfg)
    raise SystemExit(f"unknown guidance {cfg.guidance!r}")


def main(argv=None):
    import jax.numpy as jnp

    cfg = parse_config(Config, argv)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
    bundle = instantiate_model_scheduler(cfg.dataset, dtype=dtype, random_init=cfg.random_init)
    apply_fn, _ = select_apply_fn(bundle, "plain")

    x_t, y = load_starting_points(cfg.dataset, cfg.start_index, cfg.start_index + cfg.num_samples)
    if bundle.num_classes is None:
        y = None

    sampler_cfg = SamplerConfig(
        num_inference_steps=cfg.generation_steps,
        num_train_timesteps=bundle.schedule.num_train_timesteps,
        diffusion=DiffusionConfig(eta=cfg.eta),
        after_step=cfg.start_step_uc,
        num_steps_uc=cfg.num_steps_uc,
    )

    def gen(guidance):
        return generate_uncertainty_dataset(
            apply_fn, bundle.schedule, sampler_cfg, x_t, y, cfg.batch_size,
            params=bundle.params, seed=cfg.seed, guidance=guidance, decode_fn=bundle.decode_fn,
        )

    log.info("generating plain baseline...")
    plain = gen(None)
    log.info("generating %s-guided...", cfg.guidance)
    guided = gen(build_guidance(cfg))

    record = {
        "dataset": cfg.dataset,
        "guidance": cfg.guidance,
        "threshold": cfg.threshold if not cfg.threshold_file else cfg.threshold_file,
        "num_samples": cfg.num_samples,
        "M": cfg.M,
        "start_step_uc": cfg.start_step_uc,
        "num_steps_uc": cfg.num_steps_uc,
    }
    if cfg.compute_fid:
        from ..metrics.fid import compute_statistics, extract_features, fid_from_stats, load_stats
        from .compute_fid import Config as FidConfig, make_extractor

        try:
            real_stats = load_stats(cfg.dataset)
        except FileNotFoundError:
            log.warning("no cached real stats for %s — comparing guided vs plain directly", cfg.dataset)
            real_stats = None
        ext = make_extractor(FidConfig(dataset=cfg.dataset))
        f_plain = extract_features(ext, plain.gen_images, cfg.batch_size)
        f_guided = extract_features(ext, guided.gen_images, cfg.batch_size)
        if real_stats is not None:
            record["fid_plain"] = fid_from_stats(compute_statistics(f_plain), real_stats)
            record["fid_guided"] = fid_from_stats(compute_statistics(f_guided), real_stats)
        record["fid_guided_vs_plain"] = fid_from_stats(
            compute_statistics(f_guided), compute_statistics(f_plain)
        )
    MetricsSink(paths.results() / "uncertainty_guidance" / "results.json").append(record)
    log.info("results: %s", record)
    return record


if __name__ == "__main__":
    main(sys.argv[1:])
