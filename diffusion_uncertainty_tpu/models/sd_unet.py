"""Stable-Diffusion-class conditional UNet (diffusers ``UNet2DConditionModel``
family) in flax/NHWC.

This is the model behind the reference's T2I uncertainty pipelines
(``pipeline_uncertainty/pipeline_stable_diffusion_uncertainty_guided.py:577-819``
drives the diffusers SD1.5 UNet; the SD2.x variant differs only in linear
transformer projections and head layout). Re-designed for TPU rather than
ported: NHWC convs, bf16 activations with f32 norms/softmax, fused
group-norm+SiLU, the shared (Pallas-backed) attention kernel for both self-
and cross-attention, and optional per-block remat.

Blocks: ``ResnetBlock2D`` (reused from ``unet2d.py`` — identical family),
``Transformer2D`` = GroupNorm → proj_in → N× BasicTransformerBlock
(self-attn, cross-attn, GEGLU FF, pre-LN) → proj_out → residual.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from ..ops.groupnorm import group_norm_silu
from .layers import Conv3x3, nearest_upsample, timestep_embedding
from .unet2d import ResnetBlock2D

Dtype = Any

__all__ = ["SDUNetConfig", "SDUNet"]


@dataclasses.dataclass(frozen=True)
class SDUNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    cross_attention_dim: int = 768
    transformer_layers_per_block: int = 1
    # int -> same head count everywhere (SD1.x "attention_head_dim: 8" really
    # means 8 heads); tuple -> per-level head counts (SD2.x: 64-dim heads)
    num_attention_heads: Union[int, Tuple[int, ...]] = 8
    use_linear_projection: bool = False
    norm_num_groups: int = 32
    dropout: float = 0.0
    dtype: Any = jnp.float32
    remat: bool = False

    @staticmethod
    def sd15() -> "SDUNetConfig":
        """runwayml/stable-diffusion-v1-5 UNet (859.5M params)."""
        return SDUNetConfig()

    @staticmethod
    def sd21() -> "SDUNetConfig":
        """stabilityai/stable-diffusion-2-1-base UNet: 1024-dim CLIP context,
        64-channel heads, linear transformer projections."""
        return SDUNetConfig(
            cross_attention_dim=1024,
            num_attention_heads=(5, 10, 20, 20),
            use_linear_projection=True,
        )

    @staticmethod
    def tiny() -> "SDUNetConfig":
        return SDUNetConfig(
            sample_size=8,
            block_out_channels=(32, 64),
            layers_per_block=1,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            cross_attention_dim=16,
            num_attention_heads=2,
        )

    def heads_at(self, level: int) -> int:
        if isinstance(self.num_attention_heads, tuple):
            return self.num_attention_heads[level]
        return self.num_attention_heads


class _CrossAttention(nn.Module):
    """diffusers ``Attention``: bias-free q/k/v projections, biased out."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):  # x [B,L,C], context [B,S,Cctx]
        b, l, c = x.shape
        ctx = x if context is None else context
        hd = c // self.num_heads
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        q = q.reshape(b, l, self.num_heads, hd)
        k = k.reshape(b, -1, self.num_heads, hd)
        v = v.reshape(b, -1, self.num_heads, hd)
        out = dot_product_attention(q, k, v).reshape(b, l, c)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


class _BasicTransformerBlock(nn.Module):
    """diffusers ``BasicTransformerBlock``: pre-LN self-attn → pre-LN
    cross-attn → pre-LN GEGLU feed-forward, all residual."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
        x = x + _CrossAttention(self.num_heads, dtype=self.dtype, name="attn1")(
            ln("norm1")(x).astype(self.dtype)
        )
        x = x + _CrossAttention(self.num_heads, dtype=self.dtype, name="attn2")(
            ln("norm2")(x).astype(self.dtype), context
        )
        h = ln("norm3")(x).astype(self.dtype)
        c = x.shape[-1]
        # GEGLU: one 8c projection split into value/gate halves (exact gelu)
        hg = nn.Dense(8 * c, dtype=self.dtype, name="ff_proj")(h)
        val, gate = jnp.split(hg, 2, axis=-1)
        h = val * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(self.dtype)
        h = nn.Dense(c, dtype=self.dtype, name="ff_out")(h)
        return x + h


class Transformer2D(nn.Module):
    """diffusers ``Transformer2DModel``: GroupNorm → proj in → token
    transformer stack → proj out → residual. The conv-1×1 vs linear projection
    variants are the same matmul in NHWC, so one Dense serves both — the
    converter reshapes conv kernels (``use_linear_projection`` only affects
    checkpoint layout)."""

    num_heads: int
    depth: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        y = group_norm_silu(
            x,
            self.param("norm_scale", nn.initializers.ones, (c,), jnp.float32),
            self.param("norm_bias", nn.initializers.zeros, (c,), jnp.float32),
            num_groups=self.groups,
            eps=1e-6,
            apply_silu=False,
        )
        tokens = nn.Dense(c, dtype=self.dtype, name="proj_in")(y.reshape(b, h * w, c))
        for k in range(self.depth):
            tokens = _BasicTransformerBlock(self.num_heads, dtype=self.dtype, name=f"block_{k}")(
                tokens, context
            )
        tokens = nn.Dense(c, dtype=self.dtype, name="proj_out")(tokens)
        return x + tokens.reshape(b, h, w, c)


class SDUNet(nn.Module):
    """``__call__(x[B,H,W,C], t[()|B], encoder_hidden_states[B,S,Dctx])`` ->
    [B,H,W,out_channels] f32 epsilon."""

    cfg: SDUNetConfig

    @nn.compact
    def __call__(self, x, t, encoder_hidden_states, deterministic: bool = True):
        cfg = self.cfg
        b0 = cfg.block_out_channels[0]
        time_dim = 4 * b0

        ctx = encoder_hidden_states.astype(cfg.dtype)
        temb = timestep_embedding(t, b0, cos_first=True)  # SD: flip_sin_to_cos, shift 0
        temb = nn.Dense(time_dim, dtype=cfg.dtype, name="time_dense_0")(temb.astype(cfg.dtype))
        temb = nn.Dense(time_dim, dtype=cfg.dtype, name="time_dense_1")(nn.silu(temb))
        if temb.shape[0] == 1 and x.shape[0] > 1:
            temb = jnp.broadcast_to(temb, (x.shape[0],) + temb.shape[1:])

        res_block = nn.remat(ResnetBlock2D) if cfg.remat else ResnetBlock2D
        xf_block = nn.remat(Transformer2D) if cfg.remat else Transformer2D

        def transformer(level, name):
            return xf_block(
                cfg.heads_at(level),
                cfg.transformer_layers_per_block,
                cfg.norm_num_groups,
                dtype=cfg.dtype,
                name=name,
            )

        h = nn.Conv(b0, (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(x.astype(cfg.dtype))
        skips = [h]
        for bi, (btype, out_ch) in enumerate(zip(cfg.down_block_types, cfg.block_out_channels)):
            for li in range(cfg.layers_per_block):
                h = res_block(
                    out_ch, cfg.dropout, cfg.norm_num_groups, dtype=cfg.dtype,
                    name=f"down_{bi}_res_{li}",
                )(h, temb, deterministic)
                if btype == "CrossAttnDownBlock2D":
                    h = transformer(bi, f"down_{bi}_attn_{li}")(h, ctx)
                skips.append(h)
            if bi != len(cfg.down_block_types) - 1:
                h = nn.Conv(
                    out_ch, (3, 3), strides=2, padding=1, dtype=cfg.dtype,
                    name=f"down_{bi}_downsample",
                )(h)
                skips.append(h)

        mid_ch = cfg.block_out_channels[-1]
        h = res_block(mid_ch, cfg.dropout, cfg.norm_num_groups, dtype=cfg.dtype, name="mid_res_0")(
            h, temb, deterministic
        )
        h = transformer(len(cfg.block_out_channels) - 1, "mid_attn_0")(h, ctx)
        h = res_block(mid_ch, cfg.dropout, cfg.norm_num_groups, dtype=cfg.dtype, name="mid_res_1")(
            h, temb, deterministic
        )

        rev = tuple(reversed(cfg.block_out_channels))
        n_levels = len(cfg.block_out_channels)
        for bi, (btype, out_ch) in enumerate(zip(cfg.up_block_types, rev)):
            for li in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = res_block(
                    out_ch, cfg.dropout, cfg.norm_num_groups, dtype=cfg.dtype,
                    name=f"up_{bi}_res_{li}",
                )(jnp.concatenate([h, skip], axis=-1), temb, deterministic)
                if btype == "CrossAttnUpBlock2D":
                    h = transformer(n_levels - 1 - bi, f"up_{bi}_attn_{li}")(h, ctx)
            if bi != len(cfg.up_block_types) - 1:
                # fused sub-pixel upsample+conv (ops/fused_upsample.py)
                h = Conv3x3(out_ch, dtype=cfg.dtype, up2=True, name=f"up_{bi}_upsample")(h)

        h = group_norm_silu(
            h,
            self.param("out_norm_scale", nn.initializers.ones, (h.shape[-1],), jnp.float32),
            self.param("out_norm_bias", nn.initializers.zeros, (h.shape[-1],), jnp.float32),
            num_groups=cfg.norm_num_groups,
            eps=1e-5,
        )
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, kernel_init=nn.initializers.zeros,
            dtype=cfg.dtype, name="conv_out",
        )(h)
        return h.astype(jnp.float32)
