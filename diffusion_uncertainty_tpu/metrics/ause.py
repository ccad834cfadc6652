"""AUSE / AURG sparsification metrics.

Parity target: reference ``metrics/ause.py`` (vendored from
mattpoggi/mono-uncertainty): build sparsification curves by repeatedly keeping
the (100-q)% least-uncertain pixels, compare against the oracle ordering by
true error, and report

    AUSE = ∫ sparse_curve − ∫ oracle_curve      (lower is better)
    AURG = rnd_curve[0] − ∫ sparse_curve        (higher is better)

Two implementations:
  * ``compute_aucs`` — exact reference semantics (numpy, percentile-threshold
    masks with linear interpolation), used for reported numbers.
  * ``sparsification_curves_fast`` — one sort + cumulative sums instead of
    ``intervals`` full-array masked passes; O(N log N) once vs O(intervals·N),
    jit-able on TPU. Matches the exact path to ~1/N (tie/interpolation edge).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["compute_aucs", "sparsification_curves_fast", "ause_aurg_from_curves"]

_METRICS = ("rmse",)  # the reference evaluates rmse only (ause.py:10)


def _metric_values(gt: np.ndarray, pred: np.ndarray, metric: str) -> np.ndarray:
    if metric == "rmse":
        return (gt - pred) ** 2
    if metric == "abs_rel":
        return np.abs(gt - pred) / gt
    if metric == "a1":
        return np.maximum(gt / pred, pred / gt)
    raise ValueError(metric)


def _reduce(vals: np.ndarray, metric: str) -> float:
    if metric == "rmse":
        return float(np.sqrt(vals.mean()))
    if metric == "abs_rel":
        return float(vals.mean())
    if metric == "a1":
        return float((vals >= 1.25).mean())
    raise ValueError(metric)


def compute_aucs(
    gt: np.ndarray,
    pred: np.ndarray,
    uncert: np.ndarray,
    intervals: int = 50,
    metrics: Sequence[str] = _METRICS,
) -> Tuple[Dict[str, list], Dict[str, list]]:
    """Exact reference-semantics AUSE/AURG (``metrics/ause.py:91-146``).

    Returns ``({metric: [AUSE, AURG]}, {metric: [opt, rnd, sparse]})``.
    """
    gt = np.asarray(gt, np.float64).ravel()
    pred = np.asarray(pred, np.float64).ravel()
    uncert = -np.asarray(uncert, np.float64).ravel()  # high uncertainty first

    true_uncert = {m: -_metric_values(gt, pred, m) for m in metrics}
    quants = [100.0 / intervals * t for t in range(intervals)]
    plotx = [1.0 / intervals * t for t in range(intervals + 1)]

    thresholds = [np.percentile(uncert, q) for q in quants]
    subs = [uncert >= t for t in thresholds]
    sparse_curve = {
        m: [_reduce(_metric_values(gt, pred, m)[s], m) for s in subs] + [0.0] for m in metrics
    }

    opt_curve = {}
    for m in metrics:
        opt_thr = [np.percentile(true_uncert[m], q) for q in quants]
        opt_subs = [true_uncert[m] >= t for t in opt_thr]
        opt_curve[m] = [_reduce(_metric_values(gt, pred, m)[s], m) for s in opt_subs] + [0.0]

    rnd_curve = {m: [_reduce(_metric_values(gt, pred, m), m)] * (intervals + 1) for m in metrics}

    aucs = {}
    for m in metrics:
        ause = np.trapezoid(sparse_curve[m], x=plotx) - np.trapezoid(opt_curve[m], x=plotx)
        aurg = rnd_curve[m][0] - np.trapezoid(sparse_curve[m], x=plotx)
        aucs[m] = [float(ause), float(aurg)]
    curves = {m: [opt_curve[m], rnd_curve[m], sparse_curve[m]] for m in metrics}
    return aucs, curves


def sparsification_curves_fast(
    gt: jnp.ndarray,
    pred: jnp.ndarray,
    uncert: jnp.ndarray,
    intervals: int = 50,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """TPU-fast (sort + cumsum) RMSE sparsification curves.

    Returns ``(opt_curve, rnd_curve, sparse_curve)`` each of length
    ``intervals + 1`` (final point 0, reference convention). The curve value at
    quantile q keeps the ``N·(1−q)`` least-uncertain pixels.
    """
    err2 = (gt.astype(jnp.float32) - pred.astype(jnp.float32)) ** 2
    err2 = err2.ravel()
    u = uncert.astype(jnp.float32).ravel()
    n = err2.shape[0]

    def curve(order_vals: jnp.ndarray) -> jnp.ndarray:
        # ascending sort => prefix i holds the i least-"uncertain" pixels
        order = jnp.argsort(order_vals)
        sorted_err = err2[order]
        csum = jnp.cumsum(sorted_err)
        # kept counts at each quantile cut (q = t/intervals, keep N·(1-q))
        t = jnp.arange(intervals, dtype=jnp.float32)
        counts = jnp.round(n * (1.0 - t / intervals)).astype(jnp.int32)
        counts = jnp.clip(counts, 1, n)
        vals = jnp.sqrt(csum[counts - 1] / counts.astype(jnp.float32))
        return jnp.concatenate([vals, jnp.zeros((1,), jnp.float32)])

    sparse = curve(u)
    opt = curve(err2)
    rnd = jnp.full((intervals + 1,), jnp.sqrt(err2.mean()), jnp.float32)
    return opt, rnd, sparse


def ause_aurg_from_curves(
    opt: np.ndarray, rnd: np.ndarray, sparse: np.ndarray
) -> tuple[float, float]:
    """Integrate curves into (AUSE, AURG) — reference ``compute_aucs_from_curve``."""
    intervals = len(sparse) - 1
    plotx = np.arange(intervals + 1) / intervals
    ause = np.trapezoid(sparse, x=plotx) - np.trapezoid(opt, x=plotx)
    aurg = float(rnd[0]) - np.trapezoid(sparse, x=plotx)
    return float(ause), float(aurg)
