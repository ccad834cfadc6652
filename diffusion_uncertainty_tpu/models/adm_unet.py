"""ADM (OpenAI guided-diffusion) UNet, re-designed for TPU in flax/NHWC.

Architecture parity with the reference's vendored ``guided_diffusion/
unet_openai.py`` (``UNetModel`` :397-666, ``ResBlock`` :144-258,
``AttentionBlock`` :260-327, ``EncoderUNetModel`` classifier :685-786) under
the two configs the reference instantiates (``init_model.py:21,45-47``):

  ImageNet-128: mc=256, out=6 (learned variance), num_res_blocks=2,
    attention ds (4,8,16), channel_mult (1,1,2,3,4), heads=4, scale-shift
    norm, resblock up/down, legacy attention order
  ImageNet-64:  mc=192, out=6, num_res_blocks=3, attention ds (2,4,8),
    channel_mult (1,2,3,4), head_channels=64, new attention order

TPU adaptations (not a port): NHWC layout, bf16 activations with f32 norms,
Pallas flash attention via ``ops.attention``, activation-noise injection as an
explicit rng-driven option instead of forward hooks (the reference's original
estimator perturbs four fixed blocks with N(0, 0.01²),
``scheduling_ddim_uncertainty.py:36-40,520-530``), and optional
``jax.checkpoint`` rematerialisation per block for the grad-based estimators.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.groupnorm import group_norm_silu
from .layers import (
    AttentionBlock,
    Conv3x3,
    avg_pool_2x,
    nearest_upsample,
    timestep_embedding,
    zeros_init,
)

Dtype = Any

__all__ = ["ADMUNetConfig", "ADMUNet", "ADMClassifierConfig", "ADMClassifier"]


@dataclasses.dataclass(frozen=True)
class ADMUNetConfig:
    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 192
    out_channels: int = 6
    num_res_blocks: int = 3
    attention_resolutions: Tuple[int, ...] = (2, 4, 8)  # downsample factors
    dropout: float = 0.1
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    num_classes: Optional[int] = 1000
    num_heads: int = 4
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    conv_resample: bool = True
    # affects checkpoint weight layout only (legacy head-major qkv vs qkv-major);
    # the flax attention kernel is order-agnostic, the converter permutes
    use_new_attention_order: bool = False
    # flip_grad estimator support: register zero "perturbation" taps at every
    # block output so activation gradients are reachable via jax.grad — the
    # flax-native replacement for the reference's backward hooks
    # (scheduling_ddim_flip_grad.py:292-296)
    grad_taps: bool = False
    dtype: Any = jnp.float32
    remat: bool = False
    # blocks whose output gets N(0, std²) noise when an 'act_noise' rng is
    # provided; defaults are the reference's four hook sites
    activation_noise_blocks: Tuple[str, ...] = ("in_8", "out_1", "out_4", "out_12")
    activation_noise_std: float = 0.01

    @staticmethod
    def imagenet128() -> "ADMUNetConfig":
        """Reference ``init_guided_diffusion_imagenet128`` (init_model.py:21)."""
        return ADMUNetConfig(
            image_size=128,
            model_channels=256,
            num_res_blocks=2,
            attention_resolutions=(4, 8, 16),
            dropout=0.0,
            channel_mult=(1, 1, 2, 3, 4),
            num_heads=4,
            num_head_channels=-1,
            num_heads_upsample=4,
        )

    @staticmethod
    def imagenet64(dropout: float = 0.1) -> "ADMUNetConfig":
        """Reference ``init_guided_diffusion_imagenet64`` (init_model.py:45-47)."""
        return ADMUNetConfig(
            image_size=64,
            model_channels=192,
            num_res_blocks=3,
            attention_resolutions=(2, 4, 8),
            dropout=dropout,
            channel_mult=(1, 2, 3, 4),
            num_heads=4,
            num_head_channels=64,
            num_heads_upsample=4,
            use_new_attention_order=True,
        )

    @staticmethod
    def tiny(num_classes: Optional[int] = 10) -> "ADMUNetConfig":
        """Small random-init fixture for tests (SURVEY.md §4 test pyramid)."""
        return ADMUNetConfig(
            image_size=16,
            model_channels=32,
            out_channels=3,
            num_res_blocks=1,
            attention_resolutions=(2,),
            dropout=0.1,
            channel_mult=(1, 2),
            num_classes=num_classes,
            num_heads=2,
            activation_noise_blocks=("in_1", "out_1"),
        )


class _SplitInputConv(nn.Module):
    """Conv over the (virtual) channel-concat of two inputs WITHOUT
    materializing the concat: ``y = conv(a, W[:,:,:C1]) + conv(b, W[:,:,C1:])
    + bias``. The param tree is identical to ``nn.Conv`` on the concatenated
    input (kernel ``[k,k,C1+C2,out]``), so checkpoints convert unchanged.
    XLA lowers a channel-concatenate feeding the big out-block convs as a
    pad+maximum fusion plus a re-tiling copy (~3 ms/forward at the 128² level
    of the ADM-128 b32 loop, profiled) — summing two partial convs keeps the
    same FLOPs on the MXU and skips that traffic entirely."""

    features: int
    kernel_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        k = self.kernel_size
        c_in = a.shape[-1] + b.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, c_in, self.features), jnp.float32
        ).astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if k == 3:
            # two Winograd partial convs, the second fusing the first as its
            # residual epilogue (falls back to lax.conv per-partial inside)
            from ..ops.winograd_conv import conv3x3_winograd

            ya = conv3x3_winograd(
                a.astype(self.dtype),
                kernel[:, :, : a.shape[-1], :],
                jnp.zeros((self.features,), self.dtype),
            )
            return conv3x3_winograd(
                b.astype(self.dtype),
                kernel[:, :, a.shape[-1] :, :],
                bias.astype(self.dtype),
                res=ya,
            )
        dn = jax.lax.conv_dimension_numbers(a.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        pad = [(k // 2, k // 2)] * 2
        ya = jax.lax.conv_general_dilated(
            a.astype(self.dtype), kernel[:, :, : a.shape[-1], :], (1, 1), pad, dimension_numbers=dn
        )
        yb = jax.lax.conv_general_dilated(
            b.astype(self.dtype), kernel[:, :, a.shape[-1] :, :], (1, 1), pad, dimension_numbers=dn
        )
        return ya + yb + bias.astype(ya.dtype)


def _split_skip_enabled() -> bool:
    import os

    return os.environ.get("DU_TPU_SPLIT_SKIP", "1") != "0"


class ResBlock(nn.Module):
    """ADM residual block with timestep scale-shift conditioning and optional
    in-block up/downsampling (reference ``ResBlock``, ``unet_openai.py:144-258``).

    Decoder blocks pass their skip tensor via ``skip=``: when the GroupNorm
    group size divides the first part's width (groups never straddle the
    concat seam), the block runs concat-free — split GN + split convs — which
    is exact up to float summation order; otherwise it falls back to the
    materialized concat. Param trees are identical either way."""

    out_channels: int
    dropout: float
    use_scale_shift_norm: bool
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True, skip=None):
        split = None
        if skip is not None:
            assert not (self.up or self.down)
            c1, c2 = x.shape[-1], skip.shape[-1]
            c_tot = c1 + c2
            gs = c_tot // min(32, c_tot)
            if (
                _split_skip_enabled()
                and c1 % gs == 0
                and c_tot % min(32, c_tot) == 0
                and c_tot != self.out_channels  # identity residual needs the real concat
            ):
                split = (c1, c2, gs)
            else:
                x = jnp.concatenate([x, skip], axis=-1)
                skip = None
        c_in = x.shape[-1] if split is None else split[0] + split[1]
        # Conv3x3 can route through the Winograd pallas kernel (opt-in via
        # DU_TPU_WINOGRAD=1; measured slower than XLA's direct conv on v5e —
        # see ops/winograd_conv.py); param tree identical to nn.Conv
        conv = lambda ch, name, init=None: Conv3x3(
            ch,
            dtype=self.dtype,
            kernel_init=init or nn.initializers.lecun_normal(),
            name=name,
        )

        gamma = self.param("in_norm_scale", nn.initializers.ones, (c_in,), jnp.float32)
        beta = self.param("in_norm_bias", nn.initializers.zeros, (c_in,), jnp.float32)
        if split is None:
            h = group_norm_silu(x, gamma, beta)
            if self.up:
                # sub-pixel fused upsample+conv (ops/fused_upsample.py): same
                # math as conv3x3(nearest_upsample(h)) with 2.25x fewer MACs
                # and no materialized upsampled tensor; the 1x1 skip conv
                # commutes with nearest upsampling so it runs at LOW res too
                h = Conv3x3(self.out_channels, dtype=self.dtype, up2=True, name="in_conv")(h)
                if c_in != self.out_channels:
                    x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
                from ..ops.fused_upsample import nearest_upsample_2x

                x = nearest_upsample_2x(x)
            else:
                if self.down:
                    h = avg_pool_2x(h)
                    x = avg_pool_2x(x)
                h = conv(self.out_channels, "in_conv")(h)
        else:
            c1, c2, gs = split
            h_a = group_norm_silu(x, gamma[:c1], beta[:c1], num_groups=c1 // gs)
            h_b = group_norm_silu(skip, gamma[c1:], beta[c1:], num_groups=c2 // gs)
            h = _SplitInputConv(self.out_channels, 3, dtype=self.dtype, name="in_conv")(h_a, h_b)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype,
            name="emb_proj",
        )(nn.silu(emb))

        gamma = self.param("out_norm_scale", nn.initializers.ones, (self.out_channels,), jnp.float32)
        beta = self.param("out_norm_bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = group_norm_silu(h, gamma, beta, scale=scale, shift=shift)
        else:
            h = h + emb_out[:, None, None, :].astype(h.dtype)
            h = group_norm_silu(h, gamma, beta)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        # residual path first, so the add fuses into out_conv's epilogue
        if split is not None:
            x = _SplitInputConv(self.out_channels, 1, dtype=self.dtype, name="skip")(x, skip)
        elif c_in != self.out_channels and not self.up:  # up applied it pre-upsample
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        return conv(self.out_channels, "out_conv", zeros_init())(h, res=x)


class _Downsample(nn.Module):
    use_conv: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1, dtype=self.dtype, name="op")(x)
        return avg_pool_2x(x)


class _Upsample(nn.Module):
    use_conv: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            # fused sub-pixel upsample+conv (ops/fused_upsample.py)
            return Conv3x3(x.shape[-1], dtype=self.dtype, up2=True, name="op")(x)
        return nearest_upsample(x)


class ADMUNet(nn.Module):
    """Class-conditional epsilon(+learned variance) UNet.

    ``__call__(x[B,H,W,C], t[()|B], y[B]|None)`` -> [B,H,W,out_channels].
    Learned-variance checkpoints emit 6 channels; samplers slice ``[..., :3]``
    like the reference (``generate_samples.py:76``).
    Rngs: 'dropout' (MC-dropout estimator), 'act_noise' (original estimator).
    """

    cfg: ADMUNetConfig

    def _maybe_noise(self, h, tag: str):
        cfg = self.cfg
        if tag in cfg.activation_noise_blocks and self.has_rng("act_noise"):
            key = self.make_rng("act_noise")
            h = h + cfg.activation_noise_std * jax.random.normal(key, h.shape, jnp.float32).astype(h.dtype)
        if cfg.grad_taps:
            h = self.perturb(f"tap_{tag}", h)
        return h

    @nn.compact
    def __call__(self, x, t, y=None, deterministic: bool = True):
        cfg = self.cfg
        mc = cfg.model_channels
        time_dim = 4 * mc

        emb = timestep_embedding(t, mc, cos_first=True)
        emb = nn.Dense(time_dim, dtype=cfg.dtype, name="time_dense_0")(emb.astype(cfg.dtype))
        emb = nn.Dense(time_dim, dtype=cfg.dtype, name="time_dense_1")(nn.silu(emb))
        if cfg.num_classes is not None:
            if y is None:
                raise ValueError("class-conditional model requires y")
            emb = emb + nn.Embed(cfg.num_classes, time_dim, dtype=cfg.dtype, name="label_emb")(y)
        if emb.shape[0] == 1 and x.shape[0] > 1:
            emb = jnp.broadcast_to(emb, (x.shape[0],) + emb.shape[1:])

        def heads_for(ch: int, upsample: bool) -> dict:
            if cfg.num_head_channels > 0:
                return dict(num_heads=ch // cfg.num_head_channels, num_head_channels=cfg.num_head_channels)
            n = cfg.num_heads_upsample if (upsample and cfg.num_heads_upsample > 0) else cfg.num_heads
            return dict(num_heads=n, num_head_channels=-1)

        res_block = nn.remat(ResBlock) if cfg.remat else ResBlock

        h = nn.Conv(mc, (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(x.astype(cfg.dtype))
        hs = [h]
        block_idx = 1
        ds = 1
        ch = mc
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                h = res_block(
                    mult * mc, cfg.dropout, cfg.use_scale_shift_norm, dtype=cfg.dtype,
                    name=f"in_{block_idx}_res",
                )(h, emb, deterministic)
                ch = mult * mc
                # noise/grad taps sit at the RESBLOCK output, before attention:
                # the reference hooks 'input_blocks.N.0' (the ResBlock child,
                # scheduling_ddim_uncertainty.py:520-529) and flip_grad's
                # backward hooks target ResBlock modules (:289-291); the
                # perturbed value then flows through attention and the skip
                h = self._maybe_noise(h, f"in_{block_idx}")
                if ds in cfg.attention_resolutions:
                    h = AttentionBlock(**heads_for(ch, False), dtype=cfg.dtype, name=f"in_{block_idx}_attn")(h)
                hs.append(h)
                block_idx += 1
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = res_block(
                        ch, cfg.dropout, cfg.use_scale_shift_norm, down=True, dtype=cfg.dtype,
                        name=f"in_{block_idx}_down",
                    )(h, emb, deterministic)
                else:
                    h = _Downsample(cfg.conv_resample, dtype=cfg.dtype, name=f"in_{block_idx}_down")(h)
                hs.append(h)
                block_idx += 1
                ds *= 2

        h = res_block(ch, cfg.dropout, cfg.use_scale_shift_norm, dtype=cfg.dtype, name="mid_res_0")(h, emb, deterministic)
        h = AttentionBlock(**heads_for(ch, False), dtype=cfg.dtype, name="mid_attn")(h)
        h = res_block(ch, cfg.dropout, cfg.use_scale_shift_norm, dtype=cfg.dtype, name="mid_res_1")(h, emb, deterministic)

        block_idx = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                h = res_block(
                    mult * mc, cfg.dropout, cfg.use_scale_shift_norm, dtype=cfg.dtype,
                    name=f"out_{block_idx}_res",
                )(h, emb, deterministic, skip)
                ch = mult * mc
                h = self._maybe_noise(h, f"out_{block_idx}")  # ResBlock output (see encoder note)
                if ds in cfg.attention_resolutions:
                    h = AttentionBlock(**heads_for(ch, True), dtype=cfg.dtype, name=f"out_{block_idx}_attn")(h)
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        h = res_block(
                            ch, cfg.dropout, cfg.use_scale_shift_norm, up=True, dtype=cfg.dtype,
                            name=f"out_{block_idx}_up",
                        )(h, emb, deterministic)
                    else:
                        h = _Upsample(cfg.conv_resample, dtype=cfg.dtype, name=f"out_{block_idx}_up")(h)
                    ds //= 2
                block_idx += 1

        h = group_norm_silu(
            h,
            self.param("out_norm_scale", nn.initializers.ones, (h.shape[-1],), jnp.float32),
            self.param("out_norm_bias", nn.initializers.zeros, (h.shape[-1],), jnp.float32),
        )
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, kernel_init=zeros_init(), dtype=cfg.dtype, name="conv_out")(h)
        return h.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class ADMClassifierConfig:
    """Reference ``create_classifier_openai_imagenet`` (init_model.py:60-126)."""

    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 128  # classifier_width
    out_channels: int = 1000
    num_res_blocks: int = 2  # classifier_depth
    attention_resolutions: Tuple[int, ...] = (2, 4, 8)  # ds of 32,16,8 px
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    pool: str = "attention"
    dtype: Any = jnp.float32

    @staticmethod
    def imagenet(image_size: int) -> "ADMClassifierConfig":
        mult = {64: (1, 2, 3, 4), 128: (1, 1, 2, 3, 4), 256: (1, 1, 2, 2, 4, 4)}[image_size]
        attention_ds = tuple(image_size // r for r in (32, 16, 8))
        return ADMClassifierConfig(
            image_size=image_size, channel_mult=mult, attention_resolutions=attention_ds
        )


class _AttentionPool(nn.Module):
    """CLIP-style attention pooling head (reference ``AttentionPool2d``)."""

    num_head_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c).astype(jnp.float32)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(1.0 / c**0.5),
            (h * w + 1, c),
            jnp.float32,
        )
        tokens = (tokens + pos[None]).astype(self.dtype)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        heads = c // self.num_head_channels
        from ..ops.attention import dot_product_attention

        q = q.reshape(b, -1, heads, self.num_head_channels)
        k = k.reshape(b, -1, heads, self.num_head_channels)
        v = v.reshape(b, -1, heads, self.num_head_channels)
        out = dot_product_attention(q, k, v).reshape(b, -1, c)
        out = nn.Dense(self.out_channels, dtype=self.dtype, name="proj")(out)
        return out[:, 0]


class ADMClassifier(nn.Module):
    """EncoderUNetModel: UNet encoder + pooled 1000-way head, used for
    classifier guidance (reference ``unet_openai.py:685-786``,
    ``generate_samples.py:255-270``)."""

    cfg: ADMClassifierConfig

    @nn.compact
    def __call__(self, x, t, deterministic: bool = True):
        cfg = self.cfg
        mc = cfg.model_channels
        time_dim = 4 * mc
        emb = timestep_embedding(t, mc, cos_first=True)
        emb = nn.Dense(time_dim, dtype=cfg.dtype, name="time_dense_0")(emb.astype(cfg.dtype))
        emb = nn.Dense(time_dim, dtype=cfg.dtype, name="time_dense_1")(nn.silu(emb))
        if emb.shape[0] == 1 and x.shape[0] > 1:
            emb = jnp.broadcast_to(emb, (x.shape[0],) + emb.shape[1:])

        h = nn.Conv(mc, (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(x.astype(cfg.dtype))
        ds = 1
        ch = mc
        idx = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                h = ResBlock(
                    mult * mc, 0.0, cfg.use_scale_shift_norm, dtype=cfg.dtype, name=f"in_{idx}_res"
                )(h, emb, deterministic)
                ch = mult * mc
                if ds in cfg.attention_resolutions:
                    h = AttentionBlock(
                        num_heads=max(ch // cfg.num_head_channels, 1),
                        num_head_channels=cfg.num_head_channels,
                        dtype=cfg.dtype,
                        name=f"in_{idx}_attn",
                    )(h)
                idx += 1
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = ResBlock(
                        ch, 0.0, cfg.use_scale_shift_norm, down=True, dtype=cfg.dtype, name=f"in_{idx}_down"
                    )(h, emb, deterministic)
                else:
                    h = _Downsample(True, dtype=cfg.dtype, name=f"in_{idx}_down")(h)
                idx += 1
                ds *= 2

        h = ResBlock(ch, 0.0, cfg.use_scale_shift_norm, dtype=cfg.dtype, name="mid_res_0")(h, emb, deterministic)
        h = AttentionBlock(
            num_heads=max(ch // cfg.num_head_channels, 1),
            num_head_channels=cfg.num_head_channels,
            dtype=cfg.dtype,
            name="mid_attn",
        )(h)
        h = ResBlock(ch, 0.0, cfg.use_scale_shift_norm, dtype=cfg.dtype, name="mid_res_1")(h, emb, deterministic)

        h = group_norm_silu(
            h,
            self.param("out_norm_scale", nn.initializers.ones, (ch,), jnp.float32),
            self.param("out_norm_bias", nn.initializers.zeros, (ch,), jnp.float32),
        )
        if cfg.pool == "attention":
            return _AttentionPool(cfg.num_head_channels, cfg.out_channels, dtype=cfg.dtype, name="pool")(h).astype(jnp.float32)
        # adaptive mean pool + dense head ("spatial" pools in the reference)
        h = h.mean(axis=(1, 2))
        return nn.Dense(cfg.out_channels, dtype=cfg.dtype, name="head")(h).astype(jnp.float32)
