"""Evaluation metrics: AUSE/AURG sparsification, FID, precision/recall, NLL."""

from .ause import compute_aucs, sparsification_curves_fast  # noqa: F401
