"""HF-diffusers ``UNet2DModel``-compatible UNet in flax/NHWC.

The reference loads ``google/ddpm-cifar10-32`` via diffusers with a dropout
override for MC-dropout (``init_model.py:160-179``). This is a from-scratch
flax implementation of that architecture family (DDPM UNet: ResnetBlock2D with
additive time conditioning, single-head attention blocks, asymmetric-padding
downsample convs) so those checkpoints convert weight-for-weight.

Config parity for ddpm-cifar10-32: block_out_channels (128,256,256,256),
layers_per_block 2, down (Down, AttnDown, Down, Down), up (Up, Up, AttnUp, Up),
sinusoidal embedding with sin-first order and freq_shift=1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from ..ops.groupnorm import group_norm_silu
from .layers import Conv3x3, nearest_upsample, timestep_embedding, zeros_init

Dtype = Any

__all__ = ["UNet2DConfig", "UNet2D"]


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    sample_size: int = 32
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 256)
    layers_per_block: int = 2
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D",
        "AttnDownBlock2D",
        "DownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "UpBlock2D",
        "AttnUpBlock2D",
        "UpBlock2D",
    )
    attention_head_dim: Optional[int] = None  # None -> one head over all channels
    dropout: float = 0.0
    norm_num_groups: int = 32
    flip_sin_to_cos: bool = False
    freq_shift: float = 1.0
    downsample_padding: int = 0  # 0 -> DDPM asymmetric (0,1,0,1) padding
    num_class_embeds: Optional[int] = None
    dtype: Any = jnp.float32

    @staticmethod
    def ddpm_cifar10(dropout: float = 0.0) -> "UNet2DConfig":
        """google/ddpm-cifar10-32 with the reference's dropout override
        (``init_model.py:160-179``)."""
        return UNet2DConfig(dropout=dropout)

    @staticmethod
    def tiny() -> "UNet2DConfig":
        return UNet2DConfig(
            sample_size=16,
            block_out_channels=(32, 64),
            layers_per_block=1,
            down_block_types=("DownBlock2D", "AttnDownBlock2D"),
            up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        )


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D, additive time conditioning ("default" norm)."""

    out_channels: int
    dropout: float
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True):
        c_in = x.shape[-1]
        h = group_norm_silu(
            x,
            self.param("norm1_scale", nn.initializers.ones, (c_in,), jnp.float32),
            self.param("norm1_bias", nn.initializers.zeros, (c_in,), jnp.float32),
            num_groups=self.groups,
            eps=1e-6,
        )
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :].astype(h.dtype)
        h = group_norm_silu(
            h,
            self.param("norm2_scale", nn.initializers.ones, (self.out_channels,), jnp.float32),
            self.param("norm2_bias", nn.initializers.zeros, (self.out_channels,), jnp.float32),
            num_groups=self.groups,
            eps=1e-6,
        )
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        # residual add fused into the Winograd conv epilogue
        return Conv3x3(self.out_channels, dtype=self.dtype, name="conv2")(h, res=x)


class SelfAttention2D(nn.Module):
    """diffusers legacy AttnBlock: GroupNorm + (single-head by default) SA."""

    head_dim: Optional[int]
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = group_norm_silu(
            x,
            self.param("norm_scale", nn.initializers.ones, (c,), jnp.float32),
            self.param("norm_bias", nn.initializers.zeros, (c,), jnp.float32),
            num_groups=self.groups,
            eps=1e-6,
            apply_silu=False,
        )
        tokens = y.reshape(b, h * w, c)
        heads = 1 if self.head_dim is None else max(c // self.head_dim, 1)
        hd = c // heads
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(tokens).reshape(b, h * w, heads, hd)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(tokens).reshape(b, h * w, heads, hd)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(tokens).reshape(b, h * w, heads, hd)
        out = dot_product_attention(q, k, v).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(b, h, w, c)


class _Down(nn.Module):
    padding: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.padding == 0:
            # DDPM asymmetric padding: pad bottom/right by 1, then VALID conv
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(x.shape[-1], (3, 3), strides=2, padding="VALID", dtype=self.dtype, name="conv")(x)
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=self.padding, dtype=self.dtype, name="conv")(x)


class UNet2D(nn.Module):
    """``__call__(x[B,H,W,C], t[()|B], y=None)`` -> epsilon [B,H,W,out_channels].

    Rng collection 'dropout' drives MC-dropout when ``deterministic=False``.
    """

    cfg: UNet2DConfig

    @nn.compact
    def __call__(self, x, t, y=None, deterministic: bool = True):
        cfg = self.cfg
        b0 = cfg.block_out_channels[0]
        time_dim = 4 * b0

        temb = timestep_embedding(
            t, b0, cos_first=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift
        )
        temb = nn.Dense(time_dim, dtype=cfg.dtype, name="time_dense_0")(temb.astype(cfg.dtype))
        temb = nn.Dense(time_dim, dtype=cfg.dtype, name="time_dense_1")(nn.silu(temb))
        if cfg.num_class_embeds is not None:
            if y is None:
                raise ValueError("class-conditional model requires y")
            temb = temb + nn.Embed(cfg.num_class_embeds, time_dim, dtype=cfg.dtype, name="class_emb")(y)
        if temb.shape[0] == 1 and x.shape[0] > 1:
            temb = jnp.broadcast_to(temb, (x.shape[0],) + temb.shape[1:])

        h = nn.Conv(b0, (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(x.astype(cfg.dtype))
        skips = [h]

        for bi, (btype, out_ch) in enumerate(zip(cfg.down_block_types, cfg.block_out_channels)):
            for li in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    out_ch, cfg.dropout, cfg.norm_num_groups, dtype=cfg.dtype,
                    name=f"down_{bi}_res_{li}",
                )(h, temb, deterministic)
                if btype == "AttnDownBlock2D":
                    h = SelfAttention2D(
                        cfg.attention_head_dim, cfg.norm_num_groups, dtype=cfg.dtype,
                        name=f"down_{bi}_attn_{li}",
                    )(h)
                skips.append(h)
            if bi != len(cfg.down_block_types) - 1:
                h = _Down(cfg.downsample_padding, dtype=cfg.dtype, name=f"down_{bi}_downsample")(h)
                skips.append(h)

        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid_ch, cfg.dropout, cfg.norm_num_groups, dtype=cfg.dtype, name="mid_res_0")(h, temb, deterministic)
        h = SelfAttention2D(cfg.attention_head_dim, cfg.norm_num_groups, dtype=cfg.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(mid_ch, cfg.dropout, cfg.norm_num_groups, dtype=cfg.dtype, name="mid_res_1")(h, temb, deterministic)

        rev_channels = tuple(reversed(cfg.block_out_channels))
        for bi, (btype, out_ch) in enumerate(zip(cfg.up_block_types, rev_channels)):
            for li in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = ResnetBlock2D(
                    out_ch, cfg.dropout, cfg.norm_num_groups, dtype=cfg.dtype,
                    name=f"up_{bi}_res_{li}",
                )(jnp.concatenate([h, skip], axis=-1), temb, deterministic)
                if btype == "AttnUpBlock2D":
                    h = SelfAttention2D(
                        cfg.attention_head_dim, cfg.norm_num_groups, dtype=cfg.dtype,
                        name=f"up_{bi}_attn_{li}",
                    )(h)
            if bi != len(cfg.up_block_types) - 1:
                # fused sub-pixel upsample+conv (ops/fused_upsample.py)
                h = Conv3x3(out_ch, dtype=cfg.dtype, up2=True, name=f"up_{bi}_upsample")(h)

        h = group_norm_silu(
            h,
            self.param("out_norm_scale", nn.initializers.ones, (h.shape[-1],), jnp.float32),
            self.param("out_norm_bias", nn.initializers.zeros, (h.shape[-1],), jnp.float32),
            num_groups=cfg.norm_num_groups,
            eps=1e-6,
        )
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, kernel_init=zeros_init(), dtype=cfg.dtype, name="conv_out")(h)
        return h.astype(jnp.float32)
