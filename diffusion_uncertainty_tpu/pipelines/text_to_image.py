"""Text-to-image latent diffusion with uncertainty-guided denoising.

Parity target: the reference's forked diffusers pipelines
(``pipeline_stable_diffusion_uncertainty_guided.py:577-819`` for SD1.5,
``pipeline_stable_diffusion_3_uncertainty_guided.py:260-300`` for the
flow-matching SD3, ``pipeline_flux_uncertainty.py:46-49,246`` for Flux): a
classifier-free-guided denoise loop that, on steps
``[start_step_uc, start_step_uc + num_steps_uc)``, replaces the predicted
noise with ``get_uncertainty_guided_score_with_percentile`` (M re-noised
forwards around pred_x0, per-image percentile mask, posterior reweighting or
lr-gradient update — ``uncertainty_guidance.py:61-131``), then decodes through
the VAE.

This module is model-agnostic by design: the reference hard-forks one pipeline
per diffusers model family only to re-plumb the same loop through different
UNet/transformer call signatures (the ``predict_model_*`` adapters,
``uncertainty_guidance.py:135-182``). Here the denoiser is one
``denoise_fn(z, t, cond, key) -> eps`` contract; CFG double-batching and the
SD/SD3/Flux timestep conventions live in small adapters, so SD-class weights
plug in through a converter without forking the loop. Text encoders run as a
host-side preprocessing step producing ``cond``/``uncond`` embeddings
(``transformers`` is available for that; the loop only sees arrays).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..diffusion.ddim import DiffusionConfig
from ..diffusion.sampler import SamplerConfig, sample_ddim
from ..diffusion.schedule import NoiseSchedule
from ..uncertainty.guidance import make_percentile_guidance

__all__ = ["T2IPipelineConfig", "TextToImageUncertaintyPipeline", "cfg_combine"]


def cfg_combine(eps_uncond: jnp.ndarray, eps_cond: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Classifier-free guidance recombination (ref ``pipeline_stable_diffusion_
    uncertainty_guided.py:760-766``)."""
    return eps_uncond + scale * (eps_cond - eps_uncond)


@dataclasses.dataclass(frozen=True)
class T2IPipelineConfig:
    num_inference_steps: int = 50
    guidance_scale: float = 7.5
    # uncertainty window + percentile guidance knobs (the extra __call__
    # kwargs the reference adds: start_step_uc, num_steps_uc, percentile, lr —
    # ``pipeline_stable_diffusion_uncertainty_guided.py:598-601``)
    start_step_uc: int = 0
    num_steps_uc: int = 0
    percentile: float = 0.9
    use_posterior: bool = True
    lr: float = 1.0
    M: int = 5
    latent_channels: int = 4
    latent_size: int = 64  # 512px / 8
    eta: float = 0.0
    timestep_spacing: str = "leading"
    steps_offset: int = 1  # SD convention


class T2IResult(NamedTuple):
    images: jnp.ndarray  # decoded [B, H, W, 3] float in [-1, 1]
    latents: jnp.ndarray
    uncertainty: Optional[jnp.ndarray]


class TextToImageUncertaintyPipeline:
    """Orchestrates: CFG denoiser wrap -> windowed percentile guidance ->
    DDIM scan -> VAE decode. The denoiser/decoder are injected contracts so
    SD1.5-class checkpoints (via a flax UNet + converter) and toy test models
    share the loop.
    """

    def __init__(
        self,
        denoise_fn: Callable,  # (z[B,h,w,c], t, embeds[B,L,D], key) -> eps
        schedule: NoiseSchedule,
        decode_fn: Optional[Callable] = None,  # latents -> images
        cfg: T2IPipelineConfig = T2IPipelineConfig(),
    ):
        self.denoise_fn = denoise_fn
        self.schedule = schedule
        self.decode_fn = decode_fn
        self.cfg = cfg

    def _cfg_model_fn(self, cond, uncond):
        scale = self.cfg.guidance_scale

        def model_fn(z, t, key):
            if uncond is None or scale <= 1.0:
                return self.denoise_fn(z, t, cond, key)
            # CFG double-batch: one folded forward over [uncond | cond]
            # (ref ``:746-766``; also the predict-model adapters ``:135-177``)
            z2 = jnp.concatenate([z, z], axis=0)
            emb2 = jnp.concatenate([uncond, cond], axis=0)
            eps2 = self.denoise_fn(z2, t, emb2, key)
            eps_u, eps_c = jnp.split(eps2, 2, axis=0)
            return cfg_combine(eps_u, eps_c, scale)

        return model_fn

    def __call__(
        self,
        cond_embeds: jnp.ndarray,  # [B, L, D] text-encoder output
        key: jax.Array,
        uncond_embeds: Optional[jnp.ndarray] = None,
        latents: Optional[jnp.ndarray] = None,
    ) -> T2IResult:
        c = self.cfg
        b = cond_embeds.shape[0]
        k_init, k_sample = jax.random.split(key)
        if latents is None:
            latents = jax.random.normal(
                k_init, (b, c.latent_size, c.latent_size, c.latent_channels), jnp.float32
            )

        model_fn = self._cfg_model_fn(cond_embeds, uncond_embeds)
        scfg = SamplerConfig(
            num_inference_steps=c.num_inference_steps,
            num_train_timesteps=self.schedule.num_train_timesteps,
            diffusion=DiffusionConfig(
                clip_sample=False,  # SD latents are unclipped
                eta=c.eta,
                timestep_spacing=c.timestep_spacing,
                steps_offset=c.steps_offset,
            ),
            after_step=c.start_step_uc,
            num_steps_uc=c.num_steps_uc,
        )
        guidance = None
        if c.num_steps_uc > 0:
            guidance = make_percentile_guidance(
                M=c.M,
                percentile=c.percentile,
                use_posterior=c.use_posterior,
                lr=c.lr,
                dcfg=scfg.diffusion,
            )
        res = sample_ddim(model_fn, self.schedule, latents, k_sample, scfg, guidance=guidance)
        images = self.decode_fn(res.sample) if self.decode_fn else res.sample
        u = res.uncertainty.swapaxes(0, 1) if res.uncertainty is not None else None
        return T2IResult(images=images, latents=res.sample, uncertainty=u)
