"""Training modules (peripheral in the reference, optax-native here)."""

from .score_uncertainty import ScoreUncertaintyModel, ScoreUncertaintyConfig, ScoreUncertaintyTrainer  # noqa: F401
from .finetune_noise import FinetuneNoiseConfig, make_finetune_step  # noqa: F401
from .resample import (  # noqa: F401
    SamplerState,
    init_sampler_state,
    sample_timesteps,
    sampler_weights,
    update_sampler_state,
)
