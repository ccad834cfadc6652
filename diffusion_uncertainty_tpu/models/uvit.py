"""U-ViT (skip-connected ViT diffusion backbone) in flax, NHWC tokens.

Architecture parity with the reference's ``uvit/uvit.py`` (``UViT`` :138-231,
``Block`` :95-120, ``Attention`` :54-92, ``PatchEmbed`` :123-135) at the two
checkpointed configs (``uvit/load_pretrained_models.py:34-37``):

  imagenet256 — latent 32×32×4, patch 2, width 1152, depth 28, 16 heads,
                1001 classes, no final conv
  imagenet512 — latent 64×64×4, patch 4, otherwise identical

TPU-first notes: the whole model is token-space matmuls, so it maps straight
onto the MXU — no Pallas needed beyond the shared attention kernel; bf16
activations with f32 LayerNorms; optional per-block ``jax.checkpoint`` remat
for the gradient-based estimators. Token order matches the reference exactly:
``[label, time, patches]`` with a single learned pos_embed over all of them.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from .layers import timestep_embedding

Dtype = Any

__all__ = ["UViTConfig", "UViT"]


@dataclasses.dataclass(frozen=True)
class UViTConfig:
    img_size: int = 32  # latent-space side the transformer sees
    patch_size: int = 2
    in_chans: int = 4
    embed_dim: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    mlp_time_embed: bool = False
    num_classes: Optional[int] = 1001
    final_conv: bool = False  # reference ``conv`` arg (huge ckpts use False)
    dtype: Any = jnp.float32
    remat: bool = False

    @staticmethod
    def imagenet256() -> "UViTConfig":
        """U-ViT-huge/2 for ImageNet-256 latents (load_pretrained_models.py:34-37)."""
        return UViTConfig(img_size=32, patch_size=2)

    @staticmethod
    def imagenet512() -> "UViTConfig":
        """U-ViT-huge/4 for ImageNet-512 latents (load_pretrained_models.py:34-37)."""
        return UViTConfig(img_size=64, patch_size=4)

    @staticmethod
    def tiny(num_classes: Optional[int] = 16) -> "UViTConfig":
        return UViTConfig(
            img_size=8,
            patch_size=2,
            in_chans=4,
            embed_dim=32,
            depth=4,
            num_heads=2,
            num_classes=num_classes,
        )


class _Attention(nn.Module):
    """Reference ``Attention`` (uvit.py:54-92): fused qkv (K-major, head-major
    within each of q/k/v — identical to our split+reshape layout), 1/√d scale."""

    num_heads: int
    qkv_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, L, D]
        b, l, d = x.shape
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, self.num_heads, hd)
        k = k.reshape(b, l, self.num_heads, hd)
        v = v.reshape(b, l, self.num_heads, hd)
        out = dot_product_attention(q, k, v).reshape(b, l, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


def _gelu(h):
    """GELU (reference timm ``Mlp`` default is exact erf, uvit.py:95-120).

    Default policy ("auto"): tanh-approximate for bf16 activations, exact
    erf otherwise. XLA's erf lowers to an f32 polynomial that runs ~20 ms/fwd
    of pure VPU time on U-ViT-huge b64 (measured 160.0 exact vs 139.8 tanh
    vs 140.2 no-GELU on a v5e — tanh rides the hardware-accelerated
    transcendental path and is effectively free). The tanh form's max error
    vs exact GELU is ~3e-4 — an order below the ~4e-3 rounding the bf16
    activations themselves carry — so bf16 runs are distribution-identical
    while f32 runs (the CPU parity oracles) stay reference-exact.
    DU_TPU_GELU=exact|tanh|sigmoid|none overrides for A/Bs."""
    import os

    mode = os.environ.get("DU_TPU_GELU", "auto")
    if mode == "auto":
        mode = "tanh" if h.dtype == jnp.bfloat16 else "exact"
    if mode == "none":
        return h
    if mode == "tanh":
        return jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(h.dtype)
    if mode == "sigmoid":
        hf = h.astype(jnp.float32)
        return (hf * jax.nn.sigmoid(1.702 * hf)).astype(h.dtype)
    return jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)


class _SkipJoin(nn.Module):
    """Concat-free skip join: ``Dense(concat([x, skip]))`` computed as two
    clean GEMMs sharing one [2d, d] kernel (reference ``uvit.py:99,110`` —
    ``skip_linear(torch.cat([x, skip], dim=-1))``; identical math since a
    dot distributes over the operand-concat axis).

    TPU-first: the fused-concat form compiles to a windowed emitter that
    profiled at ~51 TFLOP/s on v5e (the concat becomes two strided window
    inputs of one convolution fusion); two ordinary [B·S, d] x [d, d]
    matmuls run at the MXU's ~174 TFLOP/s dense rate and the add folds into
    the second GEMM's epilogue. Param shapes/paths stay exactly Dense-like
    ([2d, d] kernel at ``skip_linear/kernel``), so checkpoint converters are
    unaffected."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        d = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (d + skip.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        k = kernel.astype(self.dtype)
        return (
            x @ k[:d]
            + skip @ k[d:]
            + bias.astype(self.dtype)
        )


class _Block(nn.Module):
    """Reference ``Block`` (uvit.py:95-120): optional skip-concat linear, then
    pre-LN attention and pre-LN exact-GELU MLP residuals. LayerNorm stats in
    f32 with torch's 1e-5 epsilon."""

    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    skip: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        d = x.shape[-1]
        if self.skip:
            x = _SkipJoin(d, dtype=self.dtype, name="skip_linear")(x, skip)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
        x = x + _Attention(self.num_heads, self.qkv_bias, dtype=self.dtype, name="attn")(
            ln("norm1")(x).astype(self.dtype)
        )
        h = ln("norm2")(x).astype(self.dtype)
        hidden = int(d * self.mlp_ratio)
        h = nn.Dense(hidden, dtype=self.dtype, name="mlp_fc1")(h)
        h = _gelu(h)
        h = nn.Dense(d, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class UViT(nn.Module):
    """``__call__(x[B,H,W,C], t[()|B], y[B])`` -> [B,H,W,C] epsilon.

    Skip topology: in_blocks push onto a static Python stack, out_blocks pop —
    traced once under jit, so the stack unrolls at compile time exactly like
    the reference's ModuleList loop (uvit.py:215-223).
    """

    cfg: UViTConfig

    @nn.compact
    def __call__(self, x, t, y=None):
        cfg = self.cfg
        b = x.shape[0]
        p, d = cfg.patch_size, cfg.embed_dim
        grid = cfg.img_size // p
        num_patches = grid * grid

        tokens = nn.Conv(
            d, (p, p), strides=(p, p), padding="VALID", dtype=cfg.dtype, name="patch_embed"
        )(x.astype(cfg.dtype)).reshape(b, num_patches, d)

        temb = timestep_embedding(t, d, cos_first=True).astype(cfg.dtype)
        if cfg.mlp_time_embed:
            temb = nn.Dense(4 * d, dtype=cfg.dtype, name="time_dense_0")(temb)
            temb = nn.Dense(d, dtype=cfg.dtype, name="time_dense_1")(nn.silu(temb))
        if temb.shape[0] == 1 and b > 1:
            temb = jnp.broadcast_to(temb, (b, d))
        seq = [temb[:, None, :], tokens]

        extras = 1
        if cfg.num_classes:
            if y is None:
                raise ValueError("class-conditional U-ViT requires y")
            lab = nn.Embed(cfg.num_classes, d, dtype=cfg.dtype, name="label_emb")(y)
            seq.insert(0, lab[:, None, :])
            extras = 2

        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, extras + num_patches, d),
            jnp.float32,
        )
        h = jnp.concatenate(seq, axis=1) + pos.astype(cfg.dtype)

        block = nn.remat(_Block) if cfg.remat else _Block
        mk = lambda skip, name: block(
            cfg.num_heads, cfg.mlp_ratio, cfg.qkv_bias, skip=skip, dtype=cfg.dtype, name=name
        )

        skips = []
        for i in range(cfg.depth // 2):
            h = mk(False, f"in_block_{i}")(h)
            skips.append(h)
        h = mk(False, "mid_block")(h)
        for i in range(cfg.depth // 2):
            h = mk(True, f"out_block_{i}")(h, skips.pop())

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(h)
        h = nn.Dense(p * p * cfg.in_chans, dtype=cfg.dtype, name="decoder_pred")(
            h.astype(cfg.dtype)
        )
        h = h[:, extras:, :]
        # unpatchify — reference token order is (p1, p2, C) per patch (uvit.py:46-51)
        h = h.reshape(b, grid, grid, p, p, cfg.in_chans)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(b, cfg.img_size, cfg.img_size, cfg.in_chans)
        if cfg.final_conv:
            h = nn.Conv(cfg.in_chans, (3, 3), padding=1, dtype=cfg.dtype, name="final_layer")(h)
        return h.astype(jnp.float32)
