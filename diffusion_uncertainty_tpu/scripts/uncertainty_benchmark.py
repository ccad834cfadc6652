"""Grid benchmark across estimators/guiders on one dataset.

Parity: reference ``scripts/uncertainty_benchmark_imagenet.py`` (407 LoC grid
over schedulers incl. threshold/score-model/mc-dropout-grad variants with its
own registry): run each named method over the same starting points, record
wall-clock + mean uncertainty (+FID when real stats are cached) into
``results/uncertainty_benchmark.json``.
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np

from ..diffusion.sampler import SamplerConfig
from ..factory import instantiate_model_scheduler
from ..sampling import generate_uncertainty_dataset
from ..uncertainty import EstimatorConfig, make_estimator
from ..uncertainty.guidance import GUIDANCE_FACTORIES
from ..utils import paths
from ..utils.config import parse_config
from ..utils.logging import MetricsSink, get_logger
from .generate_dataset_score_uncertainty import load_starting_points, select_apply_fn

log = get_logger(__name__)

ESTIMATOR_METHODS = (
    "uncertainty_centered",
    "uncertainty_zigzag_centered",
    "mc_dropout",
    "flip",
    "infer_noise",
    "uncertainty_image",
)
GUIDED_METHODS = ("uncertainty_threshold", "multiscale_threshold", "mc_dropout_gradient", "model_gradient_guided")


@dataclasses.dataclass
class Config:
    dataset: str = "cifar10"
    methods: tuple = ESTIMATOR_METHODS
    num_samples: int = 64
    batch_size: int = 32
    generation_steps: int = 20
    M: int = 5
    start_step_uc: int = 0
    num_steps_uc: int = 20
    seed: int = 0
    start_index: int = 0
    random_init: bool = False
    dtype: str = "bfloat16"


def main(argv=None):
    import jax.numpy as jnp

    cfg = parse_config(Config, argv)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
    sink = MetricsSink(paths.results() / "uncertainty_benchmark.json")
    x_t, y = load_starting_points(cfg.dataset, cfg.start_index, cfg.start_index + cfg.num_samples)
    results = []
    for method in cfg.methods:
        bundle = instantiate_model_scheduler(
            cfg.dataset, dropout=0.1 if "dropout" in method else 0.0,
            dtype=dtype, random_init=cfg.random_init,
        )
        yy = y if bundle.num_classes is not None else None
        sampler_cfg = SamplerConfig(
            num_inference_steps=cfg.generation_steps,
            num_train_timesteps=bundle.schedule.num_train_timesteps,
            after_step=cfg.start_step_uc,
            num_steps_uc=cfg.num_steps_uc,
        )
        estimator = guidance = None
        if method in GUIDANCE_FACTORIES:
            factory = GUIDANCE_FACTORIES[method]
            if method in ("uncertainty_threshold", "multiscale_threshold"):
                guidance = factory(EstimatorConfig(name="infer_noise", M=cfg.M))
            else:
                guidance = factory(M=cfg.M)
        else:
            estimator = make_estimator(EstimatorConfig(name=method, M=cfg.M))
        apply_fn, estimator_apply_fn = select_apply_fn(bundle, method)

        t0 = time.perf_counter()
        res = generate_uncertainty_dataset(
            apply_fn, bundle.schedule, sampler_cfg, x_t, yy, cfg.batch_size,
            params=bundle.params, seed=cfg.seed, estimator=estimator, guidance=guidance,
            estimator_apply_fn=estimator_apply_fn, decode_fn=bundle.decode_fn,
        )
        elapsed = time.perf_counter() - t0
        rec = {
            "dataset": cfg.dataset,
            "method": method,
            "num_samples": cfg.num_samples,
            "wall_s": round(elapsed, 2),
            "images_per_sec": round(cfg.num_samples / elapsed, 3),
            "mean_uncertainty": float(np.mean(res.uncertainty)) if res.uncertainty is not None else None,
        }
        sink.append(rec)
        results.append(rec)
        log.info("%s: %s", method, rec)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
