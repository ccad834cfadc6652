import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.metrics import compute_aucs, sparsification_curves_fast
from diffusion_uncertainty_tpu.metrics.ause import ause_aurg_from_curves


def _synth(n=20000, seed=0, informative=True):
    rng = np.random.RandomState(seed)
    gt = rng.rand(n).astype(np.float64) + 0.5
    err = rng.randn(n) * 0.1
    pred = gt + err
    if informative:
        # uncertainty correlates with |error| (good estimator)
        uncert = np.abs(err) + 0.01 * rng.rand(n)
    else:
        uncert = rng.rand(n)
    return gt, pred, uncert


def test_oracle_uncertainty_gives_near_zero_ause():
    gt, pred, _ = _synth()
    uncert = (gt - pred) ** 2  # exactly the true error ranking
    aucs, _ = compute_aucs(gt, pred, uncert)
    ause, aurg = aucs["rmse"]
    assert ause == pytest.approx(0.0, abs=1e-9)
    assert aurg > 0


def test_informative_beats_random_uncertainty():
    gt, pred, u_good = _synth(informative=True)
    _, _, u_rand = _synth(seed=1, informative=False)
    aucs_good, _ = compute_aucs(gt, pred, u_good)
    aucs_rand, _ = compute_aucs(gt, pred, u_rand)
    assert aucs_good["rmse"][0] < aucs_rand["rmse"][0]  # lower AUSE
    assert aucs_good["rmse"][1] > aucs_rand["rmse"][1]  # higher AURG
    # random uncertainty: sparse curve ~ flat -> AURG ~ 0
    assert abs(aucs_rand["rmse"][1]) < 0.02


def test_random_curve_is_constant_rmse():
    gt, pred, u = _synth()
    _, curves = compute_aucs(gt, pred, u)
    rnd = curves["rmse"][1]
    expected = np.sqrt(((gt - pred) ** 2).mean())
    np.testing.assert_allclose(rnd, expected, rtol=1e-12)


def test_fast_path_matches_exact():
    gt, pred, u = _synth(n=50000)
    aucs, _ = compute_aucs(gt, pred, u)
    opt, rnd, sparse = sparsification_curves_fast(
        jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(u)
    )
    ause_f, aurg_f = ause_aurg_from_curves(np.asarray(opt), np.asarray(rnd), np.asarray(sparse))
    assert ause_f == pytest.approx(aucs["rmse"][0], abs=2e-3)
    assert aurg_f == pytest.approx(aucs["rmse"][1], abs=2e-3)


def test_curve_shapes_and_terminal_zero():
    gt, pred, u = _synth(n=5000)
    _, curves = compute_aucs(gt, pred, u, intervals=20)
    opt, rnd, sparse = curves["rmse"]
    assert len(sparse) == 21 and sparse[-1] == 0.0 and opt[-1] == 0.0
    o, r, s = sparsification_curves_fast(jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(u), intervals=20)
    assert o.shape == (21,) and float(s[-1]) == 0.0
