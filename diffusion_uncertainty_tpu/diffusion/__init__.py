"""Pure-function diffusion math: schedules, DDIM/DDPM steps, scan samplers."""

from .schedule import (  # noqa: F401
    NoiseSchedule,
    make_schedule,
    make_betas,
    betas_for_alpha_bar,
    cosine_schedule,
    spaced_timesteps,
    uncertainty_window,
)
from .ddim import DiffusionConfig, DDIMStep, ddim_step, ddim_variance, predict_x0_eps  # noqa: F401
from .ddpm import DDPMStep, ddpm_step, posterior_log_variance  # noqa: F401
from .sampler import (  # noqa: F401
    SamplerConfig,
    SampleResult,
    StepState,
    sample_ddim,
    sample_ddpm,
    to_uint8,
)
