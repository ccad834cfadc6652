"""TPU-native framework for pixel-wise aleatoric uncertainty in diffusion models.

Re-designed from scratch for JAX/XLA/Pallas/pjit with the capabilities of the
reference PyTorch codebase (Michedev/diffusion-uncertainty, WACV 2025).

Layout:
  diffusion/    pure-function noise schedules + DDIM/DDPM/DPM-solver steps and
                ``lax.scan`` sampling loops (replaces the reference's 16
                stateful ~650-line scheduler classes, see SURVEY.md §2.2)
  uncertainty/  pixel-wise uncertainty estimators and guidance transforms
  models/       flax model zoo (ADM UNet, HF-style UNet2D, U-ViT, classifier)
  ops/          Pallas TPU kernels (flash attention, fused GroupNorm+SiLU)
  parallel/     device-mesh / sharding helpers (data-parallel sampling)
  metrics/      AUSE/AURG, FID, precision/recall, NLL evaluation
  utils/        config system, paths/artifacts, rng, logging
"""

__version__ = "0.1.0"
