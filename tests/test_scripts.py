"""CLI smoke tests on the tiny fixture + synthetic data (CPU, fast shapes)."""

import numpy as np
import pytest


@pytest.fixture()
def root(tmp_path, monkeypatch):
    monkeypatch.setenv("DIFFUSION_UNCERTAINTY_ROOT", str(tmp_path))
    # tiny starting points for the "tiny" dataset
    from diffusion_uncertainty_tpu.utils import paths

    d = paths.ensure(paths.starting_points() / "tiny")
    rng = np.random.RandomState(49394)
    np.savez(d / "X_T.npz", data=rng.randn(12, 16, 16, 3).astype(np.float32))
    np.savez(d / "y.npz", data=rng.randint(0, 10, 12).astype(np.int32))
    return tmp_path


COMMON = ["--dataset", "tiny", "--random-init", "true", "--dtype", "float32"]


def test_generate_starting_points(root):
    from diffusion_uncertainty_tpu.scripts.generate_starting_points import main

    main(["--num-samples", "4", "--extra-samples", "2", "--datasets", "cifar10"])
    from diffusion_uncertainty_tpu.utils import paths

    with np.load(paths.starting_points() / "cifar10" / "X_T.npz") as f:
        assert f["data"].shape == (6, 32, 32, 3)


def test_compute_ause_synthetic(root):
    from diffusion_uncertainty_tpu.scripts.compute_ause import main

    ause, aurg = main(COMMON + [
        "--scheduler-type", "uncertainty_centered", "--num-samples", "4",
        "--batch-size", "2", "--num-steps-uc", "4", "--M", "2",
    ])
    assert np.isfinite(ause) and np.isfinite(aurg)
    from diffusion_uncertainty_tpu.utils import paths

    assert (paths.ause() / "tiny" / "results_uncertainty_centered.yaml").exists()


def test_generate_uncertainty_grad_guidance_path(root):
    """scheduler_type=uncertainty_grad routes through the fork-exact guidance
    (trajectory eps update + Var map) rather than a pure estimator."""
    from diffusion_uncertainty_tpu.scripts.generate_dataset_score_uncertainty import main as gen

    run_dir = gen(COMMON + [
        "--scheduler-type", "uncertainty_grad", "--num-samples", "4",
        "--batch-size", "2", "--generation-steps", "4", "--M", "2",
        "--start-step-uc", "1", "--num-steps-uc", "2",
    ])
    u_files = sorted(run_dir.glob("uncertainty_*.npz"))
    assert u_files, list(run_dir.iterdir())
    with np.load(u_files[0]) as f:
        u = f[f.files[0]]
    assert np.isfinite(u).all()
    assert (u >= 0).all()  # Var map, not a signed gradient


def test_fid_stats_and_drop(root):
    from diffusion_uncertainty_tpu.scripts.compute_fid import main as fid_main
    from diffusion_uncertainty_tpu.scripts.generate_dataset_score_uncertainty import main as gen

    run_dir = gen(COMMON + [
        "--scheduler-type", "uncertainty_centered", "--num-samples", "6",
        "--batch-size", "3", "--generation-steps", "4", "--M", "2",
        "--start-step-uc", "1", "--num-steps-uc", "2",
    ])
    fid_main(["--mode", "stats", "--dataset", "tiny", "--num-samples", "16", "--batch-size", "8"])
    res = fid_main(["--mode", "drop", "--dataset", "tiny", "--run-dir", str(run_dir),
                    "--drop-fraction", "0.34", "--drop-mode", "most"])
    assert np.isfinite(res["fid_drop_most"]) and np.isfinite(res["fid_drop_random"])


def test_compute_nll_synthetic(root):
    from diffusion_uncertainty_tpu.scripts.compute_nll import main

    # tiny model emits 3 channels; use fixed_small (no variance channels)
    bpd = main(COMMON + ["--num-samples", "2", "--batch-size", "2", "--variance-type", "fixed_small"])
    assert np.isfinite(bpd) and bpd > 0


def test_precision_recall_scripts(root):
    from diffusion_uncertainty_tpu.scripts.compute_precision_recall import main as pr_main
    from diffusion_uncertainty_tpu.scripts.generate_dataset_score_uncertainty import main as gen

    run_dir = gen(COMMON + [
        "--scheduler-type", "uncertainty_centered", "--num-samples", "6",
        "--batch-size", "3", "--generation-steps", "4", "--M", "2",
        "--start-step-uc", "1", "--num-steps-uc", "2",
    ])
    pr_main(["--mode", "real", "--dataset", "tiny", "--num-samples", "16", "--batch-size", "8"])
    res = pr_main(["--mode", "generated", "--dataset", "tiny", "--run-dir", str(run_dir),
                   "--drop-fraction", "0.34", "--k", "2"])
    for k in ("precision_drop_most", "recall_drop_most"):
        assert 0.0 <= res[k] <= 1.0


def test_generate_guided_ab(root):
    from diffusion_uncertainty_tpu.scripts.generate_guided import main

    rec = main(COMMON + [
        "--guidance", "percentile", "--num-samples", "4", "--batch-size", "2",
        "--generation-steps", "4", "--M", "2", "--start-step-uc", "1",
        "--num-steps-uc", "2", "--threshold", "0.8",
    ])
    assert np.isfinite(rec["fid_guided_vs_plain"])


def test_uncertainty_benchmark_grid(root):
    from diffusion_uncertainty_tpu.scripts.uncertainty_benchmark import main

    rows = main(COMMON + [
        "--methods", "uncertainty_centered,flip", "--num-samples", "4",
        "--batch-size", "2", "--generation-steps", "4", "--M", "2",
        "--num-steps-uc", "4",
    ])
    assert len(rows) == 2 and all(r["images_per_sec"] > 0 for r in rows)


def test_measure_times(root):
    from diffusion_uncertainty_tpu.scripts.measure_times import main

    rec = main(COMMON + [
        "--scheduler-type", "uncertainty_centered", "--batch-size", "2",
        "--generation-steps", "4", "--M", "2", "--start-step-uc", "1",
        "--num-steps-uc", "2", "--repeats", "1",
    ])
    assert rec["overhead_x"] > 0.0


def test_train_score_uncertainty_cli(root):
    from diffusion_uncertainty_tpu.scripts.generate_dataset_score_uncertainty import main as gen
    from diffusion_uncertainty_tpu.scripts.train_score_uncertainty import main as train

    run_dir = gen(COMMON + [
        "--scheduler-type", "uncertainty_centered", "--num-samples", "6",
        "--batch-size", "3", "--generation-steps", "4", "--M", "2",
        "--start-step-uc", "1", "--num-steps-uc", "2",
    ])
    ckpt = train(["--run-dir", str(run_dir), "--epochs", "2", "--batch-size", "4"])
    assert ckpt.exists()

    # the checkpoint restores and drives the score-model-gradient guidance
    from diffusion_uncertainty_tpu.utils.checkpoint import load_params

    params = load_params(ckpt)
    assert "params" in params


def test_finetune_noise_cli(root):
    from diffusion_uncertainty_tpu.scripts.finetune_noise import main

    out = main(COMMON + [
        "--epochs", "1", "--steps-per-epoch", "2", "--batch-size", "2", "--M", "2",
    ])
    assert any(out.glob("ckpt_epoch0/**/*")) or (out / "ckpt_epoch0").exists()


def test_generate_t2i_guided_tiny_sd(root):
    """SD1.5-family script end-to-end at the tiny config (guided + plain PNGs,
    numbered run dir, args.yaml — ref generate_with_uncertainty_threshold_
    stable_diffusion.py:44-74 protocol)."""
    pytest.importorskip("PIL")
    from diffusion_uncertainty_tpu.scripts.generate_t2i_guided import main
    from diffusion_uncertainty_tpu.utils import paths

    rc = main([
        "--model", "tiny", "--random-init", "true", "--num-steps", "6",
        "--start-step-threshold", "2", "--num-steps-threshold", "2",
        "--M", "2", "--dtype", "float32",
    ])
    assert rc == 0
    run = paths.sd_uncertainty_guidance() / "0"
    assert (run / "output_sd_uc.png").exists()
    assert (run / "output_sd.png").exists()
    assert (run / "args.yaml").exists()
    assert (run / "uncertainty.npz").exists()


@pytest.mark.parametrize("model,stem", [("sd3-tiny", "sd3"), ("flux-tiny", "flux")])
def test_generate_t2i_guided_flow_match_family(root, model, stem):
    """SD3/Flux flow-matching script paths (ref generate_with_uncertainty_
    threshold_stable_diffusion_3.py / _flux.py)."""
    pytest.importorskip("PIL")
    from diffusion_uncertainty_tpu.scripts.generate_t2i_guided import main
    from diffusion_uncertainty_tpu.utils import paths

    rc = main([
        "--model", model, "--random-init", "true", "--num-steps", "6",
        "--start-step-threshold", "2", "--num-steps-threshold", "2",
        "--M", "2", "--dtype", "float32",
    ])
    assert rc == 0
    base = paths.sd3_uncertainty_guidance() if stem == "sd3" else paths.flux_uncertainty_guidance()
    run = base / "0"
    # no VAE weights in this environment -> raw latent channels, named
    # latent_preview_* to make the random-init limitation explicit
    assert (run / f"output_latent_preview_{stem}_uc.png").exists()
    assert (run / f"output_latent_preview_{stem}.png").exists()
    assert (run / "uncertainty.npz").exists()


def test_plot_ause_vs_m(root):
    """AUSE-vs-M curve plot (ref scripts/plot_curve_M.py) from the JSONL
    records compute_ause appends."""
    import json

    from diffusion_uncertainty_tpu.scripts.plot_results import main as plot_main
    from diffusion_uncertainty_tpu.utils import paths

    d = paths.ensure(paths.ause() / "tiny")
    with open(d / "ause_vs_M_uncertainty_centered.jsonl", "w") as f:
        for m, a in ((2, 0.5), (5, 0.4), (10, 0.35)):
            f.write(json.dumps({"M": m, "ause": a, "aurg": 0.1}) + "\n")
    out = plot_main(["--kind", "ause_vs_m", "--dataset", "tiny"])
    assert out.exists() and out.stat().st_size > 0


def test_intrinsic_lora_inference_tiny(root):
    """Intrinsic-LoRA single-image inference path end-to-end at the tiny
    config (ref intrinsic_lora/inference_sd_single.py protocol: one forward
    at t=T-1, VAE decode, depth postprocess)."""
    pytest.importorskip("PIL")
    from diffusion_uncertainty_tpu.scripts.intrinsic_lora_inference import main
    from diffusion_uncertainty_tpu.utils import paths

    rc = main(["--model", "tiny", "--task", "depth", "--size", "16"])
    assert rc == 0
    dest = paths.results() / "intrinsic_lora" / "depth" / "predicted"
    assert (dest / "synthetic_depth.png").exists()
