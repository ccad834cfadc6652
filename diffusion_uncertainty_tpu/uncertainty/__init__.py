"""Pixel-wise uncertainty estimators and uncertainty-guided sampling transforms."""

from .estimators import EstimatorConfig, make_estimator, ESTIMATORS  # noqa: F401
