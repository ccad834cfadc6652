"""Flax CLIP vision transformer (the SD1.5 safety-checker backbone).

The reference's SD1.5 pipeline declares and runs a
``StableDiffusionSafetyChecker`` + ``CLIPImageProcessor`` stage after VAE
decode (``pipeline_stable_diffusion_uncertainty_guided.py:41,100-109`` and
``run_safety_checker`` at ``:443-455``). That checker is a CLIP ViT vision
tower + visual projection with fixed concept-embedding heads; this module is
the TPU-native tower (pixel values in, pooled/projected embeddings out),
converted from transformers state dicts by ``convert.convert_clip_vision``.
The threshold head lives in ``pipelines/safety_checker.py``.

Architecture (transformers ``CLIPVisionModel``): class token + conv patch
embedding + learned position embeddings, pre-LN ("pre_layrnorm"), the same
pre-LN quick-GELU encoder blocks as the text tower but with NO causal mask,
post-LN on the CLS token as the pooled output, optional no-bias visual
projection (``CLIPVisionModelWithProjection``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax.numpy as jnp
from flax import linen as nn

from .clip_text import CLIPTextConfig, _CLIPLayer

__all__ = ["CLIPVisionConfig", "CLIPVisionEncoder", "CLIPVisionOutput"]


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768  # 0: plain CLIPVisionModel (no projection)
    dtype: Any = jnp.float32

    @staticmethod
    def vit_l_14() -> "CLIPVisionConfig":
        """openai/clip-vit-large-patch14 vision tower — the backbone of
        diffusers' ``StableDiffusionSafetyChecker``."""
        return CLIPVisionConfig()

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=16, patch_size=4, projection_dim=24,
        )

    def as_text_cfg(self) -> CLIPTextConfig:
        """The shared encoder-layer hyperparameters, in the text config type
        (the blocks are identical — only the mask differs)."""
        return CLIPTextConfig(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            hidden_act=self.hidden_act,
            layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype,
        )


class CLIPVisionOutput(NamedTuple):
    last_hidden: jnp.ndarray  # [B, 1+P, D] f32 (NOT post-LN'd — transformers)
    pooled: jnp.ndarray  # [B, D] post_layernorm(CLS)
    image_embeds: jnp.ndarray  # [B, projection_dim] (== pooled when no proj)


class CLIPVisionEncoder(nn.Module):
    """apply(params, pixel_values[B, H, W, 3] — NHWC, CLIP-normalized) ->
    :class:`CLIPVisionOutput`."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixel_values) -> CLIPVisionOutput:
        cfg = self.cfg
        b = pixel_values.shape[0]
        d = cfg.hidden_size
        grid = cfg.image_size // cfg.patch_size
        num_pos = grid * grid + 1

        patches = nn.Conv(
            d, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=False, dtype=cfg.dtype, name="patch_embedding",
        )(pixel_values.astype(cfg.dtype)).reshape(b, grid * grid, d)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (d,))
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (num_pos, d)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, d)), patches], axis=1
        )
        x = x + pos[None].astype(cfg.dtype)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="pre_layrnorm"
        )(x).astype(cfg.dtype)

        lcfg = self.cfg.as_text_cfg()
        mask = jnp.ones((1, 1, num_pos, num_pos), bool)  # bidirectional
        for i in range(cfg.num_layers):
            x = _CLIPLayer(lcfg, name=f"layer_{i}")(x, mask)

        pooled = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="post_layernorm"
        )(x[:, 0]).astype(jnp.float32)
        embeds = pooled
        if cfg.projection_dim > 0:
            embeds = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=jnp.float32,
                name="visual_projection",
            )(pooled)
        return CLIPVisionOutput(x.astype(jnp.float32), pooled, embeds)
