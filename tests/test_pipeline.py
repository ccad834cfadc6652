"""End-to-end pipeline tests: factory -> orchestrated generation -> artifacts
-> thresholds -> resume -> mesh sharding, all on the tiny fixture model."""

import os

import numpy as np
import pytest
import yaml

from diffusion_uncertainty_tpu.diffusion.sampler import SamplerConfig
from diffusion_uncertainty_tpu.factory import instantiate_model_scheduler
from diffusion_uncertainty_tpu.parallel.mesh import local_shard_bounds, make_mesh
from diffusion_uncertainty_tpu.sampling import generate_uncertainty_dataset
from diffusion_uncertainty_tpu.uncertainty import EstimatorConfig, make_estimator
from diffusion_uncertainty_tpu.utils.experiments import (
    clean_empty_runs,
    find_runs,
    load_run_arrays,
    new_run_dir,
    save_shard,
)


@pytest.fixture()
def root(tmp_path, monkeypatch):
    monkeypatch.setenv("DIFFUSION_UNCERTAINTY_ROOT", str(tmp_path))
    return tmp_path


@pytest.fixture(scope="module")
def bundle():
    import jax.numpy as jnp

    return instantiate_model_scheduler("tiny", random_init=True, dtype=jnp.float32)


def _gen(bundle, run_dir=None, mesh=None, n=5, batch=2, keep=True):
    rng = np.random.RandomState(0)
    x_t = rng.randn(n, 16, 16, 3).astype(np.float32)
    y = rng.randint(0, 10, n)
    cfg = SamplerConfig(num_inference_steps=6, after_step=2, num_steps_uc=3)
    est = make_estimator(EstimatorConfig(name="uncertainty_centered", M=2))
    return generate_uncertainty_dataset(
        bundle.apply_fn, bundle.schedule, cfg, x_t, y, batch,
        params=bundle.params, estimator=est, run_dir=run_dir, mesh=mesh, keep_in_memory=keep,
    )


def test_generation_shapes_and_artifacts(root, bundle):
    run_dir = new_run_dir(config=None)
    res = _gen(bundle, run_dir=run_dir)
    assert res.gen_images.shape == (5, 16, 16, 3)
    assert res.gen_images.dtype == np.uint8
    assert res.uncertainty.shape == (5, 3, 16, 16, 3)
    assert res.pred_epsilon.shape == (5, 3, 16, 16, 3)
    # shards on disk: ceil(5/2) = 3 shards, ragged final batch trimmed
    imgs = load_run_arrays(run_dir, "gen_images")
    assert imgs.shape == (5, 16, 16, 3)
    u = load_run_arrays(run_dir, "uncertainty")
    np.testing.assert_array_equal(u, res.uncertainty)


def test_generation_resume_skips_existing_shards(root, bundle):
    run_dir = new_run_dir()
    res1 = _gen(bundle, run_dir=run_dir)
    # corrupt-resistant resume: re-running writes nothing new
    before = sorted(p.name for p in run_dir.glob("*.npz"))
    _gen(bundle, run_dir=run_dir, keep=False)
    after = sorted(p.name for p in run_dir.glob("*.npz"))
    assert before == after


def test_generation_on_mesh_matches_single_device(bundle):
    mesh = make_mesh(data=4)
    res_mesh = _gen(bundle, mesh=mesh, n=4, batch=4)
    res_single = _gen(bundle, mesh=None, n=4, batch=4)
    np.testing.assert_allclose(
        np.asarray(res_mesh.gen_images, np.int32),
        np.asarray(res_single.gen_images, np.int32),
        atol=1,  # one uint8 step of tolerance for cross-sharding reduction order
    )


def test_run_discovery_and_cleanup(root):
    from dataclasses import dataclass

    @dataclass
    class Meta:
        dataset: str = "tiny"
        scheduler_type: str = "uncertainty_centered"

    r1 = new_run_dir(config=Meta(), timestamp="2026-01-01_00-00-00")
    save_shard(r1, "uncertainty", 0, np.zeros((1, 2)))
    r2 = new_run_dir(config=Meta(dataset="other"), timestamp="2026-01-01_00-00-01")
    save_shard(r2, "uncertainty", 0, np.zeros((1, 2)))
    r_empty = new_run_dir(config=Meta(), timestamp="2026-01-01_00-00-02")

    found = list(find_runs(dataset="tiny"))
    assert r1 in found and r2 not in found and r_empty in found

    removed = clean_empty_runs()
    assert r_empty in removed and r1.exists()


def test_threshold_script_end_to_end(root, bundle):
    from dataclasses import dataclass

    from diffusion_uncertainty_tpu.scripts.compute_threshold_pixel_wise import main as thr_main

    @dataclass
    class Meta:
        dataset: str = "tiny"
        scheduler_type: str = "uncertainty_centered"

    run_dir = new_run_dir(config=Meta())
    _gen(bundle, run_dir=run_dir, keep=False)
    out = thr_main(["--run-dirs", str(run_dir), "--perc", "0.5"])
    with np.load(out) as f:
        thr = f["data"]
    assert thr.shape == (3, 16, 16, 3)
    u = load_run_arrays(run_dir, "uncertainty")
    # order statistic: value ranked at floor(N*perc)
    expected = np.sort(u, axis=0)[int(u.shape[0] * 0.5)]
    np.testing.assert_allclose(thr, expected)


def test_local_shard_bounds():
    assert local_shard_bounds(10, 0, 3) == (0, 3)
    assert local_shard_bounds(10, 2, 3) == (6, 10)  # last rank takes remainder


def test_plot_scripts(root, bundle):
    from dataclasses import dataclass

    from diffusion_uncertainty_tpu.scripts.plot_results import main as plot_main

    @dataclass
    class Meta:
        dataset: str = "tiny"
        scheduler_type: str = "uncertainty_centered"

    run_dir = new_run_dir(config=Meta())
    _gen(bundle, run_dir=run_dir, keep=False)
    for kind in ("uncertainty_schedule", "image_grid", "uncertainty_maps"):
        out = plot_main(["--kind", kind, "--run-dir", str(run_dir), "--num-images", "4"])
        assert out.exists() and out.stat().st_size > 0, kind
    # per-timestep strip (ref plot_denoising_schedule.py): stride through the
    # window steps of one sample
    out = plot_main(["--kind", "denoising_schedule", "--run-dir", str(run_dir), "--stride", "1"])
    assert out.exists() and out.stat().st_size > 0


def test_unknown_plot_kind(root):
    import pytest as _pytest

    from diffusion_uncertainty_tpu.scripts.plot_results import main as plot_main

    with _pytest.raises(SystemExit):
        plot_main(["--kind", "nope"])


def test_sharded_feature_stats_matches_single_device():
    import jax
    import jax.numpy as jnp

    from diffusion_uncertainty_tpu.metrics.fid import RunningStats
    from diffusion_uncertainty_tpu.parallel.distributed import sharded_feature_stats
    from diffusion_uncertainty_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=8)
    dim = 16

    def extract(imgs):
        # toy extractor: spatial means projected by a fixed matrix
        flat = imgs.reshape(imgs.shape[0], -1)
        w = jnp.arange(flat.shape[1] * dim, dtype=jnp.float32).reshape(flat.shape[1], dim)
        return flat @ (w / w.size)

    imgs = jax.random.uniform(jax.random.key(0), (16, 4, 4, 3))
    s1, s2, n = sharded_feature_stats(extract, imgs, mesh, dim)
    assert n == 16

    rs = RunningStats(dim)
    rs.update(np.asarray(extract(imgs)))
    np.testing.assert_allclose(s1, rs.s1, rtol=1e-5)
    np.testing.assert_allclose(s2, rs.s2, rtol=1e-5)


def test_fid_evaluator_hook_in_generation(root, bundle):
    from diffusion_uncertainty_tpu.metrics.features import RandomConvFeatures
    from diffusion_uncertainty_tpu.metrics.fid import FIDEvaluator, compute_statistics, extract_features

    ext = RandomConvFeatures(dim=32)
    real = (np.random.RandomState(0).rand(32, 16, 16, 3) * 255).astype(np.uint8)
    real_stats = compute_statistics(extract_features(ext, real))
    ev = FIDEvaluator(ext, real_stats, batch_size=8)

    rng = np.random.RandomState(1)
    x_t = rng.randn(4, 16, 16, 3).astype(np.float32)
    y = rng.randint(0, 10, 4)
    cfg = SamplerConfig(num_inference_steps=4)
    generate_uncertainty_dataset(
        bundle.apply_fn, bundle.schedule, cfg, x_t, y, 2,
        params=bundle.params, fid_evaluator=ev, keep_in_memory=False,
    )
    assert ev.stats.n == 4
    assert np.isfinite(ev.compute())


def test_npz_images_dataset(tmp_path):
    from diffusion_uncertainty_tpu.datasets import NpzImagesDataset

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (6, 3, 8, 8), np.uint8)  # NCHW on purpose
    labels = rng.randint(0, 10, 6)
    np.savez(tmp_path / "d.npz", data=imgs, labels=labels)
    ds = NpzImagesDataset(tmp_path / "d.npz")
    assert len(ds) == 6
    rec = ds[0]
    assert rec["image"].shape == (8, 8, 3)
    assert 0.0 <= rec["image"].max() <= 1.0
    assert rec["label"] == int(labels[0])


def test_plot_pr_curve(root, bundle):
    from dataclasses import dataclass

    from diffusion_uncertainty_tpu.scripts.compute_precision_recall import main as pr_main
    from diffusion_uncertainty_tpu.scripts.plot_results import main as plot_main

    @dataclass
    class Meta:
        dataset: str = "tiny"
        scheduler_type: str = "uncertainty_centered"

    run_dir = new_run_dir(config=Meta())
    _gen(bundle, run_dir=run_dir, keep=False)
    # cache a (random-extractor) real manifold, then plot grouped P&R
    pr_main(["--mode", "real", "--dataset", "tiny", "--num-samples", "12", "--batch-size", "6"])
    out = plot_main([
        "--kind", "pr_curve", "--run-dir", str(run_dir), "--dataset", "tiny",
        "--group-size", "4", "--num-groups", "2", "--k", "2",
    ])
    assert out.exists() and out.stat().st_size > 0


def test_plot_sd_grids(root):
    import yaml
    from PIL import Image

    from diffusion_uncertainty_tpu.scripts.plot_results import main as plot_main
    from diffusion_uncertainty_tpu.utils import paths

    base = paths.ensure(paths.sd_uncertainty_guidance())
    rng = np.random.RandomState(0)
    for i, (prompt, perc) in enumerate(
        [("a cat", 0.9), ("a cat", 0.95), ("a dog", 0.9), ("a dog", 0.95)]
    ):
        d = base / str(i)
        d.mkdir()
        (d / "args.yaml").write_text(yaml.safe_dump({"prompt": prompt, "percentile": perc}))
        for name in ("output_sd_uc.png", "output_sd.png"):
            Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(d / name)

    out = plot_main(["--kind", "sd_prompt_grid"])
    assert out.exists() and out.stat().st_size > 0
    out2 = plot_main(["--kind", "sd_row", "--prompt", "a cat", "--out", str(base / "row.png")])
    assert out2.exists() and out2.stat().st_size > 0
