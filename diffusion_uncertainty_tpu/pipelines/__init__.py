"""Generation pipelines: class-conditional and text-to-image latent diffusion."""

from .text_to_image import (  # noqa: F401
    T2IPipelineConfig,
    TextToImageUncertaintyPipeline,
    cfg_combine,
)
