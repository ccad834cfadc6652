"""Wall-clock comparison: uncertainty sampling vs plain DDIM.

Parity: reference ``scripts/measure_times_{imagenet,cifar10}.py:88-134`` —
times one full generation with the uncertainty scheduler and one with the
plain scheduler, appends to ``results/times.json``. TPU discipline: jitted
end-to-end, ``block_until_ready`` bracketed, compile excluded via one warmup.
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax

from ..diffusion.ddim import DiffusionConfig
from ..diffusion.sampler import SamplerConfig, sample_ddim
from ..factory import instantiate_model_scheduler
from ..uncertainty import EstimatorConfig, make_estimator
from ..utils import paths
from ..utils.config import parse_config
from ..utils.logging import MetricsSink, get_logger
from .generate_dataset_score_uncertainty import select_apply_fn

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    dataset: str = "cifar10"
    scheduler_type: str = "uncertainty_centered"
    batch_size: int = 32
    generation_steps: int = 50
    M: int = 5
    start_step_uc: int = 40
    num_steps_uc: int = 10
    num_zigzag: int = 3
    seed: int = 0
    repeats: int = 3
    baseline: str = "ddim"  # ddim | kdpm2 (the reference times both plain baselines)
    random_init: bool = False
    dtype: str = "bfloat16"


def _time(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out.sample)  # warmup/compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out.sample)
        times.append(time.perf_counter() - t0)
    return min(times)


def main(argv=None):
    import jax.numpy as jnp

    cfg = parse_config(Config, argv)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
    bundle = instantiate_model_scheduler(
        cfg.dataset, dropout=0.1 if cfg.scheduler_type == "mc_dropout" else 0.0,
        dtype=dtype, random_init=cfg.random_init,
    )
    apply_fn, estimator_apply_fn = select_apply_fn(bundle, cfg.scheduler_type)
    size = bundle.image_size
    xT = jax.random.normal(jax.random.key(cfg.seed), (cfg.batch_size, size, size, 3))
    y = jnp.zeros((cfg.batch_size,), jnp.int32)

    from ..uncertainty import resolve_scheduler_transform

    est, guid = resolve_scheduler_transform(
        EstimatorConfig(name=cfg.scheduler_type, M=cfg.M, num_zigzag=cfg.num_zigzag)
    )
    uc_cfg = SamplerConfig(
        num_inference_steps=cfg.generation_steps,
        num_train_timesteps=bundle.schedule.num_train_timesteps,
        after_step=cfg.start_step_uc,
        num_steps_uc=cfg.num_steps_uc,
        diffusion=DiffusionConfig(),
    )
    plain_cfg = dataclasses.replace(uc_cfg, num_steps_uc=0)

    def mf(p):
        return lambda x, t, k: apply_fn(p, x, t, y, k)

    def emf(p):
        if estimator_apply_fn is None:
            return None
        return lambda x, t, k: estimator_apply_fn(p, x, t, y, k)

    f_uc = jax.jit(lambda p, x, k: sample_ddim(mf(p), bundle.schedule, x, k, uc_cfg, estimator=est, guidance=guid, estimator_model_fn=emf(p)))
    if cfg.baseline == "kdpm2":
        from ..diffusion.kdpm2 import KDPM2Config, sample_kdpm2

        k_cfg = KDPM2Config(
            num_inference_steps=cfg.generation_steps,
            num_train_timesteps=bundle.schedule.num_train_timesteps,
        )
        f_plain = jax.jit(lambda p, x, k: sample_kdpm2(mf(p), bundle.schedule, x, k, k_cfg))
    else:
        f_plain = jax.jit(lambda p, x, k: sample_ddim(mf(p), bundle.schedule, x, k, plain_cfg))

    key = jax.random.key(cfg.seed + 1)
    t_uc = _time(f_uc, bundle.params, xT, key, repeats=cfg.repeats)
    t_plain = _time(f_plain, bundle.params, xT, key, repeats=cfg.repeats)

    record = {
        "dataset": cfg.dataset,
        "scheduler_type": cfg.scheduler_type,
        "baseline": cfg.baseline,
        "batch_size": cfg.batch_size,
        "generation_steps": cfg.generation_steps,
        "M": cfg.M,
        "num_steps_uc": cfg.num_steps_uc,
        "time_uncertainty_s": round(t_uc, 4),
        "time_plain_s": round(t_plain, 4),
        "overhead_x": round(t_uc / t_plain, 3),
        "images_per_sec_uncertainty": round(cfg.batch_size / t_uc, 3),
        "images_per_sec_plain": round(cfg.batch_size / t_plain, 3),
        "device": str(jax.devices()[0]),
    }
    MetricsSink(paths.results() / "times.json").append(record)
    log.info("times: %s", record)
    return record


if __name__ == "__main__":
    main(sys.argv[1:])
