"""Flax CLIP text encoder (SD1.5/SD2.1 conditioning path).

The reference's SD pipelines encode prompts with transformers'
``CLIPTextModel`` (``pipeline_stable_diffusion_uncertainty_guided.py:577``ff
``encode_prompt`` usage). This is the TPU-native equivalent: token ids in,
``[B, L, D]`` hidden states out, so the day CLIP weights are mountable the
whole conditioning path runs on-device through ``convert.convert_clip_text``
— nothing needs writing (tokenization stays host-side; it needs vocab files
and runs once per prompt).

Architecture (CLIP text transformer): token + learned position embeddings,
pre-LN causal transformer blocks with quick-GELU MLPs, final LN. The pooled
output is the hidden state at each sequence's highest token id (the eot
token, transformers' ``CLIPTextModel`` convention).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["CLIPTextConfig", "CLIPTextEncoder", "CLIPTextOutput"]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # ViT-L/14; SD2/bigG's OpenCLIP uses "gelu"
    eos_token_id: int = -1  # -1: legacy argmax pooling (eos == highest id)
    layer_norm_eps: float = 1e-5
    # > 0: CLIPTextModelWithProjection — pooled output projected (no bias)
    # to this width, the SD3/Flux conditioning convention
    projection_dim: int = 0
    dtype: Any = jnp.float32

    @staticmethod
    def vit_l_14() -> "CLIPTextConfig":
        """openai/clip-vit-large-patch14 text tower (SD1.5)."""
        return CLIPTextConfig()

    @staticmethod
    def vit_l_14_projected() -> "CLIPTextConfig":
        """SD3/Flux text_encoder: CLIP ViT-L with a 768-d text projection
        (``pipeline_stable_diffusion_3_uncertainty_guided.py:90-93``)."""
        return CLIPTextConfig(eos_token_id=49407, projection_dim=768)

    @staticmethod
    def vit_bigg_14() -> "CLIPTextConfig":
        """SD3 text_encoder_2: OpenCLIP bigG/14 text tower with a 1280-d
        projection (laion/CLIP-ViT-bigG-14-laion2B-39B-b160k)."""
        return CLIPTextConfig(
            hidden_size=1280, num_layers=32, num_heads=20,
            intermediate_size=5120, hidden_act="gelu",
            eos_token_id=49407, projection_dim=1280,
        )

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=99, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=16,
        )


class CLIPTextOutput(NamedTuple):
    last_hidden: jnp.ndarray  # [B, L, D] f32, after the final LN
    pooled: jnp.ndarray  # [B, D] (projected to projection_dim when configured)
    penultimate: jnp.ndarray  # [B, L, D] hidden_states[-2] (pre-final-layer,
    # no final LN) — what SD3 feeds the MMDiT context (diffusers clip_skip=None)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    if name == "gelu":
        # transformers ACT2FN["gelu"] is the exact erf GELU (flax defaults to
        # the tanh approximation)
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class _CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        d, h = cfg.hidden_size, cfg.num_heads
        hd = d // h
        dense = lambda name: nn.Dense(d, dtype=cfg.dtype, name=name)
        b, L, _ = x.shape
        q = dense("q_proj")(x).reshape(b, L, h, hd)
        k = dense("k_proj")(x).reshape(b, L, h, hd)
        v = dense("v_proj")(x).reshape(b, L, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / jnp.sqrt(hd)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        attn = nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, L, d)
        return dense("out_proj")(out)


class _CLIPLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name=name
        )
        x = x + _CLIPAttention(cfg, name="self_attn")(ln("layer_norm1")(x), mask)
        h = ln("layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """apply(params, input_ids[B, L] int32) -> :class:`CLIPTextOutput`.

    ``out[:2]`` unpacks as the historical ``(last_hidden, pooled)`` pair."""

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids) -> CLIPTextOutput:
        cfg = self.cfg
        b, L = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        x = tok + pos[None, :L].astype(cfg.dtype)
        mask = jnp.tril(jnp.ones((L, L), bool))[None, None]  # causal
        penultimate = x
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x  # transformers hidden_states[-2]
            x = _CLIPLayer(cfg, name=f"layer_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="final_layer_norm")(x)
        x = x.astype(jnp.float32)
        # eot pooling (transformers convention): first eos position when the
        # config carries a real eos id, else the legacy highest-id argmax
        if cfg.eos_token_id >= 0:
            eot = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        else:
            eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(b), eot]
        if cfg.projection_dim > 0:
            pooled = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=jnp.float32,
                name="text_projection",
            )(pooled)
        return CLIPTextOutput(x, pooled, penultimate.astype(jnp.float32))
