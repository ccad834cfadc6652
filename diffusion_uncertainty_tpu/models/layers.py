"""Shared flax layers for the diffusion model zoo.

TPU-first re-designs of the reference's torch building blocks
(``guided_diffusion/nn.py``: GroupNorm32, timestep_embedding, zero_module;
``guided_diffusion/unet_openai.py:260-395``: attention blocks). Everything is
NHWC; norms and softmax run in float32 regardless of activation dtype
(bf16-safe), matching the reference's GroupNorm32 float32 upcast.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention

Dtype = Any

__all__ = [
    "timestep_embedding",
    "GroupNorm32",
    "zeros_init",
    "AttentionBlock",
    "nearest_upsample",
    "avg_pool_2x",
    "Conv3x3",
]


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    *,
    cos_first: bool = True,
    freq_shift: float = 0.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, float32.

    Two conventions in the model zoo:
      * ADM (reference ``guided_diffusion/nn.py:timestep_embedding``):
        freqs = exp(-ln(P) * arange(half)/half), output ``[cos, sin]``
        → ``cos_first=True, freq_shift=0``.
      * DDPM/HF ``Timesteps`` (CIFAR-10 UNet2DModel): denominator
        ``half - freq_shift`` with ``freq_shift=1`` and output ``[sin, cos]``
        → ``cos_first=False, freq_shift=1``.
    """
    t = timesteps.astype(jnp.float32)
    if t.ndim == 0:
        t = t[None]
    half = dim // 2
    denom = jnp.maximum(half - freq_shift, 1.0)
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / denom)
    args = t[:, None] * freqs[None, :]
    parts = (jnp.cos(args), jnp.sin(args)) if cos_first else (jnp.sin(args), jnp.cos(args))
    emb = jnp.concatenate(parts, axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def zeros_init() -> Callable:
    """Zero weight init — the reference zeroes the final conv of every block
    (``zero_module``, ``guided_diffusion/nn.py``) so residual branches start
    as identity; checkpoints overwrite these anyway."""
    return nn.initializers.zeros


class _GNParams(nn.Module):
    """Scale/bias holder with ``nn.GroupNorm``'s exact param layout, so the
    kernel-backed ``GroupNorm32`` keeps checkpoint-identical trees."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32),
        )


class GroupNorm32(nn.Module):
    """GroupNorm with float32 statistics over min(32, C) groups
    (reference ``GroupNorm32``/``normalization``, ``guided_diffusion/nn.py``).

    Routed through the Pallas GN kernel (no SiLU). An earlier A/B measured
    this as a net loss when the kernel demanded row-major [B,HW,C] inputs
    (layout copies at every attention entry); with the layout-native [HW,N,C]
    kernel reading conv-native bytes directly it is re-tested via
    ``DU_TPU_GN32_XLA=1`` to force the old nn.GroupNorm path."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        groups = min(self.num_groups, x.shape[-1])
        if os.environ.get("DU_TPU_GN32_XLA") == "1" or x.ndim != 4:
            y = nn.GroupNorm(
                num_groups=groups,
                epsilon=self.epsilon,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name="GroupNorm_0",
            )(x.astype(jnp.float32))
            return y.astype(self.dtype)
        from ..ops.groupnorm import group_norm_silu

        scale, bias = _GNParams(x.shape[-1], name="GroupNorm_0")()
        y = group_norm_silu(
            x, scale, bias, num_groups=groups, eps=self.epsilon, apply_silu=False
        )
        return y.astype(self.dtype)


def nearest_upsample(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour ×factor spatial upsample (NHWC).

    (An interior-pad+add formulation was A/B'd on chip: XLA does NOT fuse
    interior pads — the pad bucket grew 4.5 ms/fwd on the ADM-128 b48 loop —
    so the broadcast+reshape form stays.)"""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2×2 stride-2 average pool (NHWC) — ADM's non-conv Downsample.

    Dispatches to the layout-native Pallas kernel (``ops/avgpool.py``) on
    TPU — every XLA formulation loses on the conv-native layout: the
    6D-reshape slice-add form costs a relayout copy (2×1.23 ms/fwd at 128²
    on ADM-128 b48), 4D strided slices fuse into consumers as uncoalesced
    scans (+2.5 ms/fwd whole-model), and ``lax.reduce_window`` ran ~4× its
    streaming ideal."""
    from ..ops.avgpool import avg_pool_2x2

    return avg_pool_2x2(x)


class Conv3x3(nn.Module):
    """3×3 stride-1 SAME conv, routable through the Winograd F(2,3) pallas
    kernel (``ops/winograd_conv.py``, opt-in via ``DU_TPU_WINOGRAD=1`` —
    measured slower than XLA's direct conv on v5e), with an optional fused
    residual-add epilogue. Param tree is identical to
    ``nn.Conv(features, (3, 3))`` — ``kernel [3,3,Cin,K]`` + ``bias [K]`` —
    so checkpoints convert unchanged. Defaults to ``lax.conv`` inside the
    op, which XLA fuses with the epilogue exactly as it would ``nn.Conv``."""

    features: int
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    # fuse a nearest-2x upsample INTO the conv (sub-pixel phase decomposition,
    # ops/fused_upsample.py): same math as conv3x3(nearest_upsample(x)) with
    # 2.25x fewer MACs and no materialized upsampled tensor
    up2: bool = False

    @nn.compact
    def __call__(self, x, res=None):
        from ..ops.winograd_conv import conv3x3_winograd

        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, x.shape[-1], self.features), jnp.float32
        ).astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        if self.up2:
            assert res is None, "up2 conv has no fused residual epilogue"
            from ..ops.fused_upsample import conv3x3_nearest_up2

            return conv3x3_nearest_up2(x, kernel, bias.astype(self.dtype))
        return conv3x3_winograd(
            x, kernel, bias.astype(self.dtype), None if res is None else res.astype(self.dtype)
        )


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened H*W tokens.

    Re-design of the reference's ``AttentionBlock``+``QKVAttention(Legacy)``
    (``guided_diffusion/unet_openai.py:260-395``): GroupNorm → fused qkv
    projection → multi-head attention → zero-init output projection →
    residual. Both reference head orders (legacy: per-head interleaved qkv;
    new: qkv-major split) reduce to the same math once the projection weights
    are laid out accordingly — the converter handles the permutation, so one
    kernel serves both (``use_new_attention_order`` only affects weight
    layout, not the computation).
    """

    num_heads: int = 1
    num_head_channels: int = -1  # overrides num_heads when > 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        if self.num_head_channels > 0:
            assert c % self.num_head_channels == 0, (c, self.num_head_channels)
            heads = c // self.num_head_channels
        else:
            heads = self.num_heads
        head_dim = c // heads

        y = GroupNorm32(dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y.reshape(b, h * w, c))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, h * w, heads, head_dim)
        k = k.reshape(b, h * w, heads, head_dim)
        v = v.reshape(b, h * w, heads, head_dim)
        # 1/sqrt(d) scaling matches both reference attention orders (:362-395)
        out = dot_product_attention(q, k, v)
        out = out.reshape(b, h * w, c)
        out = nn.Dense(c, kernel_init=zeros_init(), dtype=self.dtype, name="proj_out")(out)
        return x + out.reshape(b, h, w, c)
