"""SD1.5 safety-checker stage (post-decode NSFW filter).

Parity target: the reference pipeline's ``run_safety_checker``
(``pipeline_stable_diffusion_uncertainty_guided.py:443-455``), which feeds
VAE-decoded images through transformers' ``CLIPImageProcessor`` and
diffusers' ``StableDiffusionSafetyChecker`` (declared at ``:41,100-109``)
and blacks out flagged images before ``:800-819`` saves them.

The checker is a CLIP ViT-L/14 vision tower + visual projection
(``models/clip_vision.py``) with fixed "concept" (17) and "special care"
(3) embedding heads. The head math (diffusers
``stable_diffusion/safety_checker.py`` forward):

    img    = normalize(visual_projection(pooled))
    s_dist = img @ normalize(special_care_embeds).T
    c_dist = img @ normalize(concept_embeds).T
    special    = any(s_dist - special_care_embeds_weights + adj > 0)
    adjustment = 0.01 where special (lowers every concept threshold)
    nsfw       = any(c_dist - concept_embeds_weights + adjustment > 0)

Flagged images are replaced with black (the diffusers behavior). The tower
runs on-device; the 20-row head math is trivial. ``adj`` is the checker's
global strictness knob (0.0 default, matching diffusers).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "SafetyCheckerParams",
    "clip_preprocess",
    "run_safety_checker",
    "safety_scores",
]

# transformers CLIPImageProcessor defaults (OPENAI_CLIP_MEAN/STD)
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


class SafetyCheckerParams(NamedTuple):
    vision: dict  # CLIPVisionEncoder params (with visual_projection)
    concept_embeds: jnp.ndarray  # [17, proj]
    special_care_embeds: jnp.ndarray  # [3, proj]
    concept_embeds_weights: jnp.ndarray  # [17]
    special_care_embeds_weights: jnp.ndarray  # [3]


def clip_preprocess(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[B, H, W, 3] images in [0, 1] -> CLIP-normalized [B, size, size, 3].

    Bicubic shortest-side resize + center crop + mean/std normalization —
    the ``CLIPImageProcessor`` pipeline the reference's ``run_safety_checker``
    applies (``:448-451``). Runs as jax ops so the whole stage jits.
    """
    import jax

    b, h, w, c = images.shape
    scale = size / min(h, w)
    nh, nw = max(int(round(h * scale)), size), max(int(round(w * scale)), size)
    x = jax.image.resize(images.astype(jnp.float32), (b, nh, nw, c), "bicubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top : top + size, left : left + size, :]
    x = jnp.clip(x, 0.0, 1.0)
    return (x - CLIP_MEAN) / CLIP_STD


def _normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def safety_scores(
    cfg, params: SafetyCheckerParams, clip_input: jnp.ndarray, adjustment: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(has_nsfw [B] bool, concept_scores [B, 17], special_scores [B, 3]) for
    CLIP-preprocessed inputs — the diffusers forward, vectorized."""
    from ..models.clip_vision import CLIPVisionEncoder

    out = CLIPVisionEncoder(cfg).apply(params.vision, clip_input)
    img = _normalize(out.image_embeds.astype(jnp.float32))
    s_dist = img @ _normalize(params.special_care_embeds.astype(jnp.float32)).T
    c_dist = img @ _normalize(params.concept_embeds.astype(jnp.float32)).T
    special_scores = s_dist - params.special_care_embeds_weights[None] + adjustment
    special_care = jnp.any(special_scores > 0, axis=-1)
    special_adj = jnp.where(special_care, 0.01, 0.0)[:, None]
    concept_scores = c_dist - params.concept_embeds_weights[None] + special_adj
    has_nsfw = jnp.any(concept_scores > 0, axis=-1)
    return has_nsfw, concept_scores, special_scores


def run_safety_checker(
    cfg,
    params: Optional[SafetyCheckerParams],
    images: jnp.ndarray,  # [B, H, W, 3] in [0, 1] (post VAE decode)
    adjustment: float = 0.0,
) -> Tuple[jnp.ndarray, Optional[np.ndarray]]:
    """(filtered images, has_nsfw_concept) — flagged images blacked out, the
    reference/diffusers behavior. ``params=None`` skips the stage and returns
    ``has_nsfw_concept=None`` (the pipeline's documented safety_checker=None
    mode, ``pipeline_stable_diffusion_uncertainty_guided.py:151-158``)."""
    if params is None:
        return images, None
    clip_input = clip_preprocess(images, size=cfg.image_size)
    has_nsfw, _, _ = safety_scores(cfg, params, clip_input, adjustment)
    filtered = jnp.where(has_nsfw[:, None, None, None], jnp.zeros_like(images), images)
    return filtered, np.asarray(has_nsfw)
