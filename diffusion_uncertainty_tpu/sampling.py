"""Batched uncertainty-map generation — the orchestration layer.

One function replaces the reference's 8 near-duplicate sampling loops
(``generate_samples.py:18,127,236,366,469,721,861,989`` — class-conditional /
from-tensor / classifier-guided / uvit / percentile / threshold variants): the
variations are expressed through the conditioned ``apply_fn``, the estimator,
and the guidance, not through copied loops.

TPU design vs the reference loop (``generate_samples.py:159-195``):
  * the whole T-step chain runs inside ONE jit (scan), with the window's
    uncertainty maps accumulated on device and transferred once per batch —
    the reference ships every step's maps to CPU (``:83-89``);
  * batches are padded to a fixed shape so the program compiles once;
  * per-batch keys follow the reference's resumable seed-per-batch scheme
    (``:49-55``): already-written shards are skipped on restart;
  * an optional mesh shards the batch across devices (the reference's
    process-per-GPU DP, SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .diffusion.sampler import SamplerConfig, sample_ddim, to_uint8
from .diffusion.schedule import NoiseSchedule
from .parallel.mesh import batch_sharding, replicated
from .utils.experiments import save_shard
from .utils.logging import get_logger
from .utils.rng import batch_key, run_key

log = get_logger(__name__)

# conditioned model: (params, x, t, y, key) -> epsilon [B,H,W,C]; params flow
# as an explicit jit argument so weights are never embedded as constants
ApplyFn = Callable[..., jnp.ndarray]

__all__ = ["GenerationResult", "generate_uncertainty_dataset"]


@dataclasses.dataclass
class GenerationResult:
    gen_images: np.ndarray  # [N, H, W, C] uint8
    uncertainty: Optional[np.ndarray]  # [N, num_steps_uc, H, W, C]
    pred_epsilon: Optional[np.ndarray]
    x_t: np.ndarray  # the starting noises actually used
    y: Optional[np.ndarray]
    timesteps: Optional[np.ndarray]  # window timesteps [num_steps_uc]


def generate_uncertainty_dataset(
    apply_fn: ApplyFn,
    schedule: NoiseSchedule,
    sampler_cfg: SamplerConfig,
    X_T: np.ndarray,  # [N, H, W, C]
    y: Optional[np.ndarray],  # [N] int labels or None (unconditional)
    batch_size: int,
    params: Any = None,  # bundle params dict, threaded through the jit
    seed: int = 0,
    estimator=None,
    guidance=None,
    mesh=None,
    run_dir: Optional[Path] = None,
    shard_offset: int = 0,
    keep_in_memory: bool = True,
    collect_eps: bool = True,
    decode_fn=None,  # latent models: latents -> images before uint8
    sampler: str = "ddim",  # ddim | dpm (DPM-Solver++ order 2)
    fid_evaluator=None,  # metrics.fid.FIDEvaluator updated per batch (ref generate_samples.py:203-218)
    estimator_apply_fn: ApplyFn = None,  # stochastic-variant model for the u ensemble only
) -> GenerationResult:
    n = X_T.shape[0]
    num_batches = (n + batch_size - 1) // batch_size
    base_key = run_key(seed)

    if sampler == "dpm":
        from .diffusion.dpm_solver import DPMSolverConfig, sample_dpm_solver

        dpm_cfg = DPMSolverConfig(
            num_inference_steps=sampler_cfg.num_inference_steps,
            num_train_timesteps=sampler_cfg.num_train_timesteps,
            after_step=sampler_cfg.after_step,
            num_steps_uc=sampler_cfg.num_steps_uc,
        )

    def sample_fn(p, xT, yb, key):
        model_fn = lambda x, t, k: apply_fn(p, x, t, yb, k)
        # the reference's stochastic variants (mc_dropout / activation-noise)
        # enable their noise only inside the uncertainty block — the
        # trajectory forward stays deterministic (scheduling_ddim_mc_dropout
        # .py:499,519; scheduling_ddim_uncertainty.py:520-542)
        est_fn = (
            (lambda x, t, k: estimator_apply_fn(p, x, t, yb, k))
            if estimator_apply_fn is not None else None
        )
        if sampler == "dpm":
            res = sample_dpm_solver(model_fn, schedule, xT, key, dpm_cfg, estimator=estimator, guidance=guidance, estimator_model_fn=est_fn)
        else:
            res = sample_ddim(model_fn, schedule, xT, key, sampler_cfg, estimator=estimator, guidance=guidance, estimator_model_fn=est_fn)
        if decode_fn is not None:
            res = res._replace(sample=decode_fn(p, res.sample))
        return res

    in_shardings = None
    if mesh is not None:
        in_shardings = (
            replicated(mesh),
            batch_sharding(mesh, 4),
            batch_sharding(mesh, 1),
            replicated(mesh),
        )
    sample_jit = jax.jit(sample_fn, in_shardings=in_shardings)

    images, uncs, epss, used_x, used_y = [], [], [], [], []
    window_ts = None
    for b in range(num_batches):
        shard_id = shard_offset + b
        if run_dir is not None and (Path(run_dir) / f"gen_images_{shard_id}.npz").exists():
            log.info("shard %d exists, skipping (resume)", shard_id)
            continue
        lo, hi = b * batch_size, min((b + 1) * batch_size, n)
        xb = np.asarray(X_T[lo:hi], np.float32)
        yb = np.asarray(y[lo:hi], np.int32) if y is not None else np.zeros(hi - lo, np.int32)
        pad = batch_size - (hi - lo)
        if pad:
            xb = np.concatenate([xb, np.repeat(xb[-1:], pad, axis=0)])
            yb = np.concatenate([yb, np.repeat(yb[-1:], pad, axis=0)])

        key = batch_key(base_key, b)
        res = sample_fn_run(sample_jit, params, xb, yb, key, mesh)
        imgs = np.asarray(jax.device_get(to_uint8(res.sample)))[: hi - lo]
        u = (
            np.asarray(jax.device_get(res.uncertainty)).swapaxes(0, 1)[: hi - lo]
            if res.uncertainty is not None
            else None
        )
        eps = (
            np.asarray(jax.device_get(res.pred_epsilon)).swapaxes(0, 1)[: hi - lo]
            if (collect_eps and res.pred_epsilon is not None)
            else None
        )
        window_ts = res.window_timesteps

        if run_dir is not None:
            save_shard(run_dir, "gen_images", shard_id, imgs)
            if u is not None:
                save_shard(run_dir, "uncertainty", shard_id, u)
            if eps is not None:
                save_shard(run_dir, "score", shard_id, eps)
            if window_ts is not None and b == 0:
                np.savez(Path(run_dir) / "timestep.npz", data=np.asarray(window_ts))
        if fid_evaluator is not None:
            fid_evaluator.update(imgs)
        if keep_in_memory:
            images.append(imgs)
            used_x.append(xb[: hi - lo])
            used_y.append(yb[: hi - lo])
            if u is not None:
                uncs.append(u)
            if eps is not None:
                epss.append(eps)
        log.info("batch %d/%d done (%d images)", b + 1, num_batches, hi - lo)

    cat = lambda xs: np.concatenate(xs, axis=0) if xs else None
    return GenerationResult(
        gen_images=cat(images) if keep_in_memory else None,
        uncertainty=cat(uncs),
        pred_epsilon=cat(epss),
        x_t=cat(used_x),
        y=cat(used_y),
        timesteps=np.asarray(window_ts) if window_ts is not None else None,
    )


def sample_fn_run(sample_jit, params, xb, yb, key, mesh):
    if mesh is None:
        return sample_jit(params, jnp.asarray(xb), jnp.asarray(yb), key)
    xd = jax.device_put(jnp.asarray(xb), batch_sharding(mesh, 4))
    yd = jax.device_put(jnp.asarray(yb), batch_sharding(mesh, 1))
    return sample_jit(params, xd, yd, key)
