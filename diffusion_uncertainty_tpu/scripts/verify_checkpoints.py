"""One-command weights-day parity verification (VERDICT r3 #7).

Given a mounted ``models/`` directory (the reference's checkpoint layout —
``init_model.py:21-52``, ``uvit/load_pretrained_models.py:24-81``,
``compute_dataset_fid.py:56``), runs for every artifact that is PRESENT:

  converter (strict key accounting) → per-block activation diff vs the
  reference torch module loaded with the same weights → whole-loop sampling
  smoke → small metric reproductions (Inception-FID sanity, AUSE protocol)

and writes one machine-readable parity report
(``results/parity_report.yaml``). Artifacts that are absent are reported as
``skipped`` — in zero-egress environments the command still runs and prints
what WOULD be verified. Exit code 1 if any present artifact fails.

Usage::

    python -m diffusion_uncertainty_tpu.scripts.verify_checkpoints \
        --models-dir /mnt/models [--skip-block-diffs false] [--out report.yaml]
"""

from __future__ import annotations

import dataclasses
import time
import traceback
from pathlib import Path
from typing import Callable, Optional

from ..utils import paths
from ..utils.config import parse_config
from ..utils.logging import get_logger

log = get_logger(__name__)

# reference checkpoint layout (factory._CHECKPOINTS + compute_dataset_fid)
ARTIFACTS = {
    "adm64": "64x64_diffusion.pt",
    "adm128": "128x128_diffusion.pt",
    "classifier64": "64x64_classifier.pt",
    "classifier128": "128x128_classifier.pt",
    "cifar10": "ddpm-cifar10-32.bin",
    "uvit256": "imagenet256_uvit_huge.pth",
    "uvit512": "imagenet512_uvit_huge.pth",
    "autoencoder": "autoencoder_kl_ema.pth",
    "inception": "pt_inception-2015-12-05-6726825d.pth",
    "vgg16": "vgg16-397923af.pth",
}


@dataclasses.dataclass
class Config:
    models_dir: Optional[str] = None
    out: Optional[str] = None  # report path (default results/parity_report.yaml)
    block_diffs: bool = True  # per-block activation diffs (needs /root/reference + torch)
    sampling: bool = True  # 50-step sampling smokes
    metrics: bool = True  # Inception-FID / AUSE small reproductions
    block_diff_tol: float = 5e-3  # bf16-free f32 forwards; full-size models
    seed: int = 0


class Report:
    def __init__(self):
        self.rows = []

    def run(self, name: str, artifact: str, present: bool, fn: Callable[[], dict]):
        if not present:
            self.rows.append({"check": name, "artifact": artifact, "status": "skipped",
                              "detail": "checkpoint not mounted"})
            log.info("SKIP %s (%s not mounted)", name, artifact)
            return
        t0 = time.perf_counter()
        try:
            detail = fn() or {}
            self.rows.append({"check": name, "artifact": artifact, "status": "pass",
                              "seconds": round(time.perf_counter() - t0, 1), **detail})
            log.info("PASS %s (%.1fs) %s", name, time.perf_counter() - t0, detail)
        except Exception as e:  # noqa: BLE001 — every failure belongs in the report
            self.rows.append({"check": name, "artifact": artifact, "status": "fail",
                              "seconds": round(time.perf_counter() - t0, 1),
                              "detail": f"{type(e).__name__}: {e}",
                              "traceback": traceback.format_exc(limit=6)})
            log.error("FAIL %s: %s", name, e)

    @property
    def failed(self):
        return [r for r in self.rows if r["status"] == "fail"]


def _sd(path: Path) -> dict:
    from ..models.convert import load_torch_state_dict

    return load_torch_state_dict(path)


def main(argv=None) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from ..utils.activation_diff import reference_available

    cfg = parse_config(Config, argv)
    models_dir = Path(cfg.models_dir or paths.models_dir())
    rep = Report()
    have = {k: (models_dir / v).exists() for k, v in ARTIFACTS.items()}
    log.info("models dir %s: %d/%d artifacts present", models_dir,
             sum(have.values()), len(have))
    ref_ok = reference_available()
    if cfg.block_diffs and not ref_ok:
        log.warning("reference tree not mounted — block-diff checks will be skipped")

    # ---- ADM UNets: convert + block diff + whole-loop sampling -------------
    for name, dataset in (("adm64", "imagenet64"), ("adm128", "imagenet128")):
        art = ARTIFACTS[name]
        present = have[name]

        def check(dataset=dataset, art=art):
            from ..factory import instantiate_model_scheduler

            bundle = instantiate_model_scheduler(
                dataset, dtype=jnp.float32, models_dir=models_dir
            )
            detail = {}
            x = jax.random.normal(jax.random.key(cfg.seed), (2,) + (bundle.image_size,) * 2 + (3,))
            eps = bundle.apply_fn(bundle.params, x, jnp.asarray(500), jnp.asarray([1, 2]),
                                  jax.random.key(1))
            std = float(jnp.std(eps))
            assert np.isfinite(np.asarray(eps)).all(), "non-finite eps"
            assert 0.2 < std < 3.0, f"eps std {std} out of trained-model range"
            detail["eps_std"] = round(std, 3)
            if cfg.block_diffs and ref_ok:
                import dataclasses as dc

                from ..models import ADMUNetConfig
                from ..utils.activation_diff import adm_block_diffs

                mcfg = getattr(ADMUNetConfig, dataset)()
                diffs = adm_block_diffs(dc.replace(mcfg, dtype=jnp.float32),
                                        state_dict=_sd(models_dir / art))
                worst = max(d for _, d in diffs)
                assert worst < cfg.block_diff_tol, f"block diff {worst}"
                detail["worst_block_diff"] = float(worst)
            if cfg.sampling:
                from ..diffusion import SamplerConfig, sample_ddim, to_uint8

                scfg = SamplerConfig(num_inference_steps=50)
                fn = lambda xx, t, k: bundle.apply_fn(bundle.params, xx, t, jnp.asarray([1, 2]), k)
                res = sample_ddim(fn, bundle.schedule,
                                  jax.random.normal(jax.random.key(2), x.shape),
                                  jax.random.key(3), scfg)
                img = np.asarray(to_uint8(res.sample))
                assert img.std() > 20 and 30 < img.mean() < 225, "degenerate samples"
                detail["sample_px_std"] = float(img.std())
            return detail

        rep.run(name, art, present, check)

    # ---- classifiers: convert + logits + guidance gradient -----------------
    for name, dataset in (("classifier64", "imagenet64"), ("classifier128", "imagenet128")):
        def check(dataset=dataset):
            from ..factory import load_classifier

            model, params, ccfg = load_classifier(dataset, dtype=jnp.float32,
                                                  models_dir=models_dir)
            size = ccfg.image_size
            x = jax.random.normal(jax.random.key(0), (2, size, size, 3))
            logits = model.apply(params, x, jnp.asarray(500))
            assert np.isfinite(np.asarray(logits)).all()

            # the cond_fn gradient the guided sampler uses (generate_samples
            # .py:255-270): grad of selected log-prob wrt x must be finite
            def selected_logp(xi):
                lg = model.apply(params, xi, jnp.asarray(500))
                logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
                return jnp.sum(logp[jnp.arange(2), jnp.asarray([1, 2])])

            g = jax.grad(selected_logp)(x.astype(jnp.float32))
            assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
            return {"logits_std": round(float(jnp.std(logits)), 3)}

        rep.run(name, ARTIFACTS[name], have[name], check)

    # ---- CIFAR-10 UNet2D ----------------------------------------------------
    def check_cifar():
        from ..diffusion import SamplerConfig, sample_ddim, to_uint8
        from ..factory import instantiate_model_scheduler

        bundle = instantiate_model_scheduler("cifar10", dtype=jnp.float32,
                                             models_dir=models_dir)
        fn = lambda x, t, k: bundle.apply_fn(bundle.params, x, t, None, k)
        res = sample_ddim(fn, bundle.schedule,
                          jax.random.normal(jax.random.key(0), (4, 32, 32, 3)),
                          jax.random.key(1), SamplerConfig(num_inference_steps=50))
        img = np.asarray(to_uint8(res.sample))
        assert img.std() > 20 and 30 < img.mean() < 225
        return {"sample_px_std": float(img.std())}

    rep.run("cifar10", ARTIFACTS["cifar10"], have["cifar10"], check_cifar)

    # ---- U-ViT + KL autoencoder --------------------------------------------
    for name, dataset in (("uvit256", "imagenet256"), ("uvit512", "imagenet512")):
        def check(dataset=dataset, name=name):
            from ..factory import instantiate_model_scheduler

            bundle = instantiate_model_scheduler(dataset, dtype=jnp.float32,
                                                 models_dir=models_dir)
            z = jax.random.normal(jax.random.key(0), (1,) + tuple(bundle.sample_shape))
            eps = bundle.apply_fn(bundle.params, z, jnp.asarray(500), jnp.asarray([1]),
                                  jax.random.key(1))
            assert np.isfinite(np.asarray(eps)).all()
            detail = {"eps_std": round(float(jnp.std(eps)), 3)}
            if cfg.block_diffs and ref_ok:
                from ..models import UViTConfig
                from ..utils.activation_diff import uvit_block_diffs

                ucfg = UViTConfig.imagenet256() if name == "uvit256" else UViTConfig.imagenet512()
                diffs = uvit_block_diffs(ucfg, state_dict=_sd(models_dir / ARTIFACTS[name]))
                worst = max(d for _, d in diffs)
                assert worst < cfg.block_diff_tol, f"block diff {worst}"
                detail["worst_block_diff"] = float(worst)
            return detail

        rep.run(name, ARTIFACTS[name], have[name] and have["autoencoder"], check)

    def check_vae():
        detail = {}
        if cfg.block_diffs and ref_ok:
            from ..models import AutoencoderKLConfig
            from ..utils.activation_diff import vae_diffs

            diffs = vae_diffs(AutoencoderKLConfig.sd_kl_ema(),
                              state_dict=_sd(models_dir / ARTIFACTS["autoencoder"]))
            worst = max(d for _, d in diffs)
            assert worst < cfg.block_diff_tol, f"vae diff {worst}"
            detail["worst_block_diff"] = float(worst)
        return detail

    rep.run("autoencoder", ARTIFACTS["autoencoder"], have["autoencoder"], check_vae)

    # ---- metrics: Inception FID sanity + VGG16 P&R sanity -------------------
    def check_inception():
        from ..metrics import compute_statistics, frechet_distance
        from ..metrics.features import InceptionV3Features

        ext = InceptionV3Features(models_dir / ARTIFACTS["inception"])
        rng = np.random.RandomState(0)
        a = rng.randint(0, 256, (64, 64, 64, 3), np.uint8)
        b = np.clip(a.astype(np.int32) + 64, 0, 255).astype(np.uint8)
        fa = np.asarray(ext(jnp.asarray(a)))
        assert fa.shape == (64, 2048) and np.isfinite(fa).all()
        mu_a, s_a = compute_statistics(fa)
        fid_same = frechet_distance(mu_a, s_a, *compute_statistics(
            np.asarray(ext(jnp.asarray(a)))))
        fid_diff = frechet_distance(mu_a, s_a, *compute_statistics(
            np.asarray(ext(jnp.asarray(b)))))
        assert fid_same < 1e-3 < fid_diff, (fid_same, fid_diff)
        return {"fid_identical": float(fid_same), "fid_shifted": float(fid_diff)}

    rep.run("inception_fid", ARTIFACTS["inception"], have["inception"] and cfg.metrics,
            check_inception)

    def check_vgg():
        from ..metrics import precision_recall
        from ..metrics.features import VGG16Features

        ext = VGG16Features(models_dir / ARTIFACTS["vgg16"])
        rng = np.random.RandomState(1)
        imgs = rng.randint(0, 256, (32, 64, 64, 3), np.uint8)
        f = np.asarray(ext(jnp.asarray(imgs)))
        assert f.shape == (32, 4096) and np.isfinite(f).all()
        pr = precision_recall(f, f, k=3)
        assert pr.precision > 0.9 and pr.recall > 0.9  # identical manifolds
        return {"self_precision": pr.precision}

    rep.run("vgg16_pr", ARTIFACTS["vgg16"], have["vgg16"] and cfg.metrics, check_vgg)

    # ---- AUSE protocol reproduction (needs a denoiser) -----------------------
    def check_ause():
        from ..diffusion import SamplerConfig, sample_ddim
        from ..factory import instantiate_model_scheduler
        from ..metrics.ause import compute_aucs
        from ..uncertainty import EstimatorConfig, make_estimator

        bundle = instantiate_model_scheduler("imagenet64", dtype=jnp.float32,
                                             models_dir=models_dir)
        rng = np.random.RandomState(0)
        x0 = (rng.rand(4, 64, 64, 3).astype(np.float32) * 2 - 1)
        steps = 20
        scfg = SamplerConfig(
            num_inference_steps=steps, start_step=steps // 2,
            after_step=steps // 2, num_steps_uc=steps - steps // 2,
        )
        est = make_estimator(EstimatorConfig(name="uncertainty_centered", M=2))
        y = jnp.asarray([1, 2, 3, 4])
        fn = lambda x, t, k: bundle.apply_fn(bundle.params, x, t, y, k)
        t_mid = bundle.schedule.num_train_timesteps // 2
        noise = jax.random.normal(jax.random.key(0), x0.shape, jnp.float32)
        x_t = bundle.schedule.add_noise(jnp.asarray(x0), noise, jnp.asarray(t_mid))
        res = sample_ddim(fn, bundle.schedule, x_t, jax.random.key(1), scfg, estimator=est)
        recon = np.asarray(res.sample)
        u = np.asarray(res.uncertainty.sum(axis=0))
        aucs, _ = compute_aucs((x0 + 1) / 2, (recon + 1) / 2, u)
        ause, aurg = aucs["rmse"]
        assert np.isfinite(ause) and np.isfinite(aurg)
        return {"ause": float(ause), "aurg": float(aurg)}

    rep.run("ause_protocol", ARTIFACTS["adm64"], have["adm64"] and cfg.metrics, check_ause)

    # ---- report --------------------------------------------------------------
    out = Path(cfg.out) if cfg.out else paths.ensure(paths.results()) / "parity_report.yaml"
    summary = {
        "models_dir": str(models_dir),
        "present": {k: v for k, v in have.items()},
        "passed": sum(r["status"] == "pass" for r in rep.rows),
        "failed": len(rep.failed),
        "skipped": sum(r["status"] == "skipped" for r in rep.rows),
        "checks": rep.rows,
    }
    with open(out, "w") as f:
        yaml.safe_dump(summary, f, sort_keys=False)
    print(f"parity report -> {out}")
    for r in rep.rows:
        print(f"  {r['status']:7s} {r['check']:16s} {r.get('detail', '')}")
    if rep.failed:
        print(f"{len(rep.failed)} checks FAILED")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
