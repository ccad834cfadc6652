"""Flax T5 text encoder (SD3 ``text_encoder_3`` / Flux ``text_encoder_2``).

The reference's SD3/Flux pipelines encode prompts through transformers'
``T5EncoderModel`` (``pipeline_stable_diffusion_3_uncertainty_guided.py:
90-93,118-121`` uses tokenizer_3/text_encoder_3; ``pipeline_flux_uncertainty
.py:60`` uses tokenizer_2/text_encoder_2 — both t5-v1_1-xxl). This is the
TPU-native tower: token ids in, ``[B, L, D]`` final hidden states out, with
``convert.convert_t5_encoder`` consuming the transformers state dict
unmodified the day weights are mountable (parity test:
``tests/test_models.py::test_t5_encoder_matches_transformers``).

Architecture (T5 v1.1 encoder): shared token embedding, pre-RMSNorm blocks of
{self-attention with a bucketed relative position bias owned by block 0 and
shared by all blocks, gated-GELU feed-forward}, final RMSNorm. No biases
anywhere; attention logits are NOT 1/sqrt(d_kv)-scaled (T5 folds the scale
into initialization).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["T5Config", "T5Encoder"]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    feed_forward_proj: str = "gated-gelu"  # v1.1; original T5 uses "relu"
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @staticmethod
    def v1_1_xxl() -> "T5Config":
        """google/t5-v1_1-xxl (the SD3/Flux conditioning tower; 4.7B)."""
        return T5Config()

    @staticmethod
    def tiny() -> "T5Config":
        return T5Config(
            vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=2,
            num_heads=4, relative_attention_num_buckets=8,
            relative_attention_max_distance=20,
        )


def _rel_pos_bucket(rel_pos: np.ndarray, num_buckets: int, max_distance: int) -> np.ndarray:
    """T5's bidirectional relative-position bucketing (host-side: buckets
    depend only on the static sequence length)."""
    nb = num_buckets // 2
    buckets = np.where(rel_pos > 0, nb, 0).astype(np.int64)
    rel = np.abs(rel_pos)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return buckets + np.where(is_small, rel, large)


class _T5LayerNorm(nn.Module):
    """RMSNorm: no mean subtraction, no bias; variance in float32."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jnp.reciprocal(jnp.sqrt(var + self.eps)) * scale).astype(x.dtype)


class _T5Attention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, position_bias, mask):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda d, name: nn.Dense(d, use_bias=False, dtype=cfg.dtype, name=name)
        b, L, _ = x.shape
        q = dense(inner, "q")(x).reshape(b, L, cfg.num_heads, cfg.d_kv)
        k = dense(inner, "k")(x).reshape(b, L, cfg.num_heads, cfg.d_kv)
        v = dense(inner, "v")(x).reshape(b, L, cfg.num_heads, cfg.d_kv)
        # NO 1/sqrt(d_kv): T5 folds the scale into the init
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits + position_bias
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, jnp.finfo(jnp.float32).min)
        attn = nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, L, inner)
        return dense(cfg.d_model, "o")(out)


class _T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, position_bias, mask):
        cfg = self.cfg
        h = _T5LayerNorm(cfg.layer_norm_eps, name="attn_norm")(x)
        x = x + _T5Attention(cfg, name="attention")(h, position_bias, mask)
        h = _T5LayerNorm(cfg.layer_norm_eps, name="ff_norm")(x)
        if cfg.feed_forward_proj == "gated-gelu":
            g = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi_0")(h)
            lin = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi_1")(h)
            h = nn.gelu(g, approximate=True) * lin  # transformers "gelu_new"
        else:
            h = nn.relu(nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi")(h))
        h = nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype, name="wo")(h)
        return x + h


class T5Encoder(nn.Module):
    """apply(params, input_ids[B, L] int32, mask[B, L] bool | None) ->
    last_hidden [B, L, d_model] float32.

    The SD3/Flux pipelines call the encoder on max-length-padded ids WITHOUT
    an attention mask (transformers then uses all-ones), so ``mask=None``
    reproduces the reference conditioning exactly.
    """

    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids, mask: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        x = nn.Embed(
            cfg.vocab_size, cfg.d_model, dtype=cfg.dtype, name="token_embedding"
        )(input_ids)
        L = input_ids.shape[1]
        # bucketed relative position bias, owned by block 0 and shared
        rel = np.arange(L)[None, :] - np.arange(L)[:, None]  # memory - query
        buckets = _rel_pos_bucket(
            rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        bias_table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(0.02),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        position_bias = bias_table[jnp.asarray(buckets)].transpose(2, 0, 1)[None]
        position_bias = position_bias.astype(jnp.float32)
        for i in range(cfg.num_layers):
            x = _T5Block(cfg, name=f"block_{i}")(x, position_bias, mask)
        x = _T5LayerNorm(cfg.layer_norm_eps, name="final_layer_norm")(x)
        return x.astype(jnp.float32)
