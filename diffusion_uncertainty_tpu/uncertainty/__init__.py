"""Pixel-wise uncertainty estimators and uncertainty-guided sampling transforms."""

from .estimators import EstimatorConfig, make_estimator, ESTIMATORS  # noqa: F401


def resolve_scheduler_transform(cfg: EstimatorConfig, timesteps=None, dcfg=None):
    """(estimator, guidance) for a reference ``--scheduler-type`` name.

    One resolver for every CLI entry point, so the names that are GUIDANCES
    in this framework cannot silently fall back to an estimator: the
    reference's ``uncertainty_grad`` fork both updates the trajectory
    (eps += grad·ᾱ_t) and records Var_m as the map
    (``scheduling_ddim_uncertainty_grad.py:517-571``) — that is
    ``guidance.make_uncertainty_grad_guidance`` here, not a pure estimator.
    Exactly one of the returned pair is non-None.
    """
    if cfg.name == "uncertainty_grad":
        from ..diffusion.ddim import DiffusionConfig
        from .guidance import make_uncertainty_grad_guidance

        guidance = make_uncertainty_grad_guidance(
            M=cfg.M,
            dcfg=dcfg if dcfg is not None else DiffusionConfig(),
            ensemble_chunk=cfg.ensemble_chunk,
        )
        return None, guidance
    return make_estimator(cfg, timesteps=timesteps), None
