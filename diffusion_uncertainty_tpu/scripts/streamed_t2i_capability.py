"""Full-size streamed T2I capability run (Flux-dev 11.9B / SD3.5-large 8.1B).

Drives ``pipelines/streamed.py`` at the FULL model config on one chip through
the guided flow-match step math (identical to
``sample_flow_match_stepwise``: same ``_sigmas``/``_guided_velocity``/RNG
split pattern, imported from ``diffusion/flow_match.py`` so the math is
single-sourced), with two environment adaptations this tunneled chip needs:

* params cache on disk (one ``.npy`` per leaf, bf16 as uint16) so the 23.8GB
  tree mmap-loads in seconds instead of ~13 min of regeneration;
* one subprocess per sampling step: the axon tunnel's client pins a host
  copy of every H2D transfer for process lifetime (measured ~24GB leaked per
  full-size forward), so a bounded number of forwards per process keeps the
  host under its 125GB. On a real TPU host (PCIe, no relay) the plain
  ``--streamed`` path in ``generate_t2i_guided.py`` does this in ONE process.

Reference parity target: ``pipeline_uncertainty/pipeline_flux_uncertainty.py
:204-249`` + ``scripts/generate_with_uncertainty_threshold_flux.py`` at the
true FLUX.1-dev scale.

Usage (driver mode spawns build + one subprocess per step):

    python -m diffusion_uncertainty_tpu.scripts.streamed_t2i_capability \
        --model flux --num-steps 4 --start-step-uc 2 --num-steps-uc 2 --M 1
"""

from __future__ import annotations

import dataclasses
import json
import subprocess
import sys
import time
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils.config import parse_config
from ..utils.logging import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    model: str = "flux"  # flux | sd35
    phase: str = "drive"  # drive | build | step
    cache_dir: str = "/tmp/streamed_params"
    out_dir: str = "/tmp/streamed_capability"
    height: int = 512
    width: int = 512
    seq_txt: int = 16
    num_steps: int = 4
    start_step_uc: int = 2
    num_steps_uc: int = 2
    M: int = 1
    percentile: float = 0.9
    guidance_scale: float = 3.5
    seed: int = 0
    step_index: int = 0  # phase=step only
    depth_override: int = 0  # >0: reduced-depth dry config (tests)


def _model_cfg(cfg: Config):
    import dataclasses as dc

    import jax.numpy as jnp

    if cfg.model == "flux":
        from ..models import FluxConfig

        mcfg = dc.replace(FluxConfig.flux_dev(), dtype=jnp.bfloat16)
        if cfg.depth_override:
            mcfg = dc.replace(
                mcfg, num_layers=cfg.depth_override, num_single_layers=cfg.depth_override
            )
        return mcfg
    from ..models import MMDiTConfig

    mcfg = dc.replace(MMDiTConfig.sd35_large(), dtype=jnp.bfloat16)
    if cfg.depth_override:
        mcfg = dc.replace(mcfg, num_layers=cfg.depth_override)
    return mcfg


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def save_params(params, cache: Path) -> None:
    """One .npy per leaf (bf16 stored as uint16 for numpy compat)."""
    import ml_dtypes

    for path, leaf in _flatten(params):
        f = cache.joinpath(*path[:-1])
        f.mkdir(parents=True, exist_ok=True)
        a = np.asarray(leaf)
        if a.dtype == ml_dtypes.bfloat16:
            a = a.view(np.uint16)
            np.save(f / f"{path[-1]}.bf16.npy", a)
        else:
            np.save(f / f"{path[-1]}.npy", a)


def load_params(cache: Path) -> dict:
    """mmap-load the cached tree (bf16 leaves restored by uint16 view)."""
    import ml_dtypes

    def walk(d: Path):
        out = {}
        for child in sorted(d.iterdir()):
            if child.is_dir():
                out[child.name] = walk(child)
            elif child.name.endswith(".bf16.npy"):
                out[child.name[: -len(".bf16.npy")]] = np.load(
                    child, mmap_mode="r"
                ).view(ml_dtypes.bfloat16)
            elif child.name.endswith(".npy"):
                out[child.name[: -len(".npy")]] = np.load(child, mmap_mode="r")
        return out

    return walk(cache)


def _build(cfg: Config) -> None:
    from ..pipelines.streamed import random_flux_params, random_mmdit_params

    mcfg = _model_cfg(cfg)
    t0 = time.perf_counter()
    if cfg.model == "flux":
        params = random_flux_params(mcfg, seq_txt=cfg.seq_txt, latent=cfg.height // 8, seed=cfg.seed)
    else:
        params = random_mmdit_params(mcfg, seq_txt=cfg.seq_txt, seed=cfg.seed)
    n = sum(int(np.prod(l.shape)) for _, l in _flatten(params))
    log.info("built %d params in %.0fs", n, time.perf_counter() - t0)
    cache = Path(cfg.cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    save_params(params, cache)
    (cache / "meta.json").write_text(json.dumps({"model": cfg.model, "n_params": n}))
    print(f"cached {n/1e9:.2f}B params to {cache} in {time.perf_counter()-t0:.0f}s")


def _fm_config(cfg: Config, mcfg):
    from ..diffusion.flow_match import FlowMatchConfig

    latent = cfg.height // 8
    return FlowMatchConfig(
        num_inference_steps=cfg.num_steps,
        use_dynamic_shifting=cfg.model == "flux",
        image_seq_len=(latent // 2) ** 2,
        after_step=cfg.start_step_uc,
        num_steps_uc=cfg.num_steps_uc,
        M=cfg.M,
        percentile=cfg.percentile,
        use_posterior=True,  # gradient mode would trace the streamed loop
    )


def _step(cfg: Config) -> None:
    """Run ONE sampling step (possibly 1+M forwards) and persist the state."""
    import jax
    import jax.numpy as jnp

    from ..diffusion.flow_match import _guided_velocity, _sigmas, uncertainty_window
    from ..pipelines.streamed import StreamedFlux, StreamedMMDiT
    from ..pipelines.text_encoder import pseudo_text_embeddings

    mcfg = _model_cfg(cfg)
    params = load_params(Path(cfg.cache_dir))
    exe = (StreamedFlux if cfg.model == "flux" else StreamedMMDiT)(mcfg, params)

    latent = cfg.height // 8
    ctx = jnp.asarray(
        pseudo_text_embeddings(["a photo of a cat"], seq_len=cfg.seq_txt, dim=mcfg.joint_attention_dim),
        jnp.bfloat16,
    )
    pooled = jnp.asarray(
        pseudo_text_embeddings(["a photo of a cat"], seq_len=1, dim=mcfg.pooled_projection_dim)[:, 0],
        jnp.bfloat16,
    )
    if cfg.model == "flux":
        g = jnp.asarray(cfg.guidance_scale * 1000.0)
        vfn = lambda x, t, key: exe(x, t, ctx, pooled, g)
    else:
        vfn = lambda x, t, key: exe(x, t, ctx, pooled)

    out = Path(cfg.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    state_f = out / "state.npz"
    fm = _fm_config(cfg, mcfg)
    sigmas = _sigmas(fm)
    i = cfg.step_index
    if i == 0:
        x = jax.random.normal(
            jax.random.key(cfg.seed), (1, latent, latent, mcfg.in_channels), jnp.float32
        ).astype(jnp.bfloat16)
        key = jax.random.key(cfg.seed + 1)
    else:
        st = np.load(state_f)
        x = jnp.asarray(st["x"]).astype(jnp.bfloat16)
        key = jax.random.wrap_key_data(jnp.asarray(st["key"]))

    w0, w1 = uncertainty_window(fm.after_step, fm.num_steps_uc, fm.num_inference_steps)
    sigma = float(sigmas[i])
    t = jnp.asarray(sigma * fm.num_train_timesteps)
    in_w = w0 <= i < w1
    t0 = time.perf_counter()
    if not in_w:
        key, k_m = jax.random.split(key)
        v = vfn(x, t, k_m).astype(jnp.float32)
        u = None
        n_fwd = 1
    else:
        key, k_m, k_n, k_e = jax.random.split(key, 4)
        v0 = vfn(x, t, k_m).astype(jnp.float32)
        v, u = _guided_velocity(vfn, x, v0, sigma, t, fm, k_n, k_e, sequential=True)
        n_fwd = 1 + fm.M
    x = (x.astype(jnp.float32) + (float(sigmas[i + 1]) - sigma) * v).astype(jnp.bfloat16)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0

    np.savez(
        state_f,
        x=np.asarray(x, np.float32),
        key=np.asarray(jax.random.key_data(key)),
    )
    if u is not None:
        np.savez(out / f"uncertainty_{i}.npz", data=np.asarray(u))
    rec = {
        "step": i, "in_window": bool(in_w), "forwards": n_fwd,
        "seconds": round(dt, 1), "sec_per_forward": round(dt / n_fwd, 1),
        "finite": bool(jnp.isfinite(x).all()),
    }
    with open(out / "steps.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    assert rec["finite"], "non-finite sample"


def _drive(cfg: Config, argv_rest) -> int:
    """Build (if needed) then run every step in its own subprocess."""
    cache = Path(cfg.cache_dir)
    base_args = [
        sys.executable, "-m", "diffusion_uncertainty_tpu.scripts.streamed_t2i_capability",
        "--model", cfg.model, "--cache-dir", cfg.cache_dir, "--out-dir", cfg.out_dir,
        "--height", str(cfg.height), "--width", str(cfg.width),
        "--seq-txt", str(cfg.seq_txt), "--num-steps", str(cfg.num_steps),
        "--start-step-uc", str(cfg.start_step_uc), "--num-steps-uc", str(cfg.num_steps_uc),
        "--M", str(cfg.M), "--seed", str(cfg.seed),
    ]
    if cfg.depth_override:
        base_args += ["--depth-override", str(cfg.depth_override)]
    if not (cache / "meta.json").exists():
        log.info("building param cache…")
        rc = subprocess.run(base_args + ["--phase", "build"]).returncode
        if rc:
            return rc
    # resume: steps already recorded in steps.jsonl (with state.npz present)
    # are not re-run, so an interrupted drive continues where it stopped
    steps_f = Path(cfg.out_dir) / "steps.jsonl"
    done = set()
    if steps_f.exists() and (Path(cfg.out_dir) / "state.npz").exists():
        done = {json.loads(l)["step"] for l in steps_f.read_text().splitlines()}
    for i in range(cfg.num_steps):
        if i in done:
            log.info("step %d/%d already recorded, skipping", i, cfg.num_steps)
            continue
        log.info("step %d/%d (own process)…", i, cfg.num_steps)
        rc = subprocess.run(base_args + ["--phase", "step", "--step-index", str(i)]).returncode
        if rc:
            return rc
    by_step = {}
    for l in (Path(cfg.out_dir) / "steps.jsonl").read_text().splitlines():
        r = json.loads(l)
        by_step[r["step"]] = r  # last record per step wins
    recs = [by_step[i] for i in range(cfg.num_steps)]
    total_fwd = sum(r["forwards"] for r in recs)
    total_s = sum(r["seconds"] for r in recs)
    meta = json.loads((cache / "meta.json").read_text())
    summary = {
        "model": cfg.model, "n_params": meta["n_params"],
        "steps": cfg.num_steps, "forwards": total_fwd,
        "total_seconds": round(total_s, 1),
        "sec_per_forward": round(total_s / total_fwd, 1),
        "all_finite": all(r["finite"] for r in recs),
    }
    (Path(cfg.out_dir) / "capability.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))
    return 0


def main(argv=None) -> int:
    # persistent compile cache: the step subprocesses share the 4 block-family
    # programs instead of each re-compiling through the relay
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", str(Path.cwd() / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    cfg = parse_config(Config, argv)
    if cfg.phase == "build":
        _build(cfg)
        return 0
    if cfg.phase == "step":
        _step(cfg)
        return 0
    return _drive(cfg, argv)


if __name__ == "__main__":
    raise SystemExit(main())
