"""KL autoencoder (Stable-Diffusion f8 VAE) in flax/NHWC.

Architecture parity with the reference's vendored ``uvit/autoencoder.py``
(``Encoder`` :209-300, ``Decoder`` :303-410, ``FrozenAutoencoderKL``
:412-460, ``get_model`` :463-476): GroupNorm(32, eps=1e-6) + SiLU resnet
blocks, single-head vanilla mid attention, asymmetric-padded stride-2
downsample convs, nearest-2× upsample convs, and the SD latent scale
0.18215 applied to sampled posteriors / unapplied before decoding.

TPU adaptations: NHWC convs, fused group-norm+SiLU via ``ops.groupnorm``,
float32 norm statistics under bf16 activations. The frozen-decode path is the
hot one (latent sampling pipelines call ``decode`` once per generated batch).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from ..ops.groupnorm import group_norm_silu

Dtype = Any

__all__ = ["AutoencoderKLConfig", "AutoencoderKL"]


@dataclasses.dataclass(frozen=True)
class AutoencoderKLConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    in_channels: int = 3
    out_channels: int = 3
    scale_factor: float = 0.18215
    shift_factor: float = 0.0  # SD3/Flux VAEs shift latents before scaling
    use_quant_conv: bool = True  # SD3/Flux VAEs drop the (post_)quant convs
    dtype: Any = jnp.float32

    @staticmethod
    def sd_kl_ema() -> "AutoencoderKLConfig":
        """The U-ViT paper's ``autoencoder_kl_ema.pth`` config
        (reference ``get_model``, autoencoder.py:463-476)."""
        return AutoencoderKLConfig()

    @staticmethod
    def sd3_kl() -> "AutoencoderKLConfig":
        """SD3's 16-channel AutoencoderKL (diffusers sd3 vae config:
        latent_channels=16, scaling_factor=1.5305, shift_factor=0.0609,
        use_quant_conv=False) — decodes the latents the MMDiT denoises."""
        return AutoencoderKLConfig(
            z_channels=16, embed_dim=16, scale_factor=1.5305, shift_factor=0.0609,
            use_quant_conv=False,
        )

    @staticmethod
    def flux_kl() -> "AutoencoderKLConfig":
        """Flux's 16-channel AutoencoderKL (scaling_factor=0.3611,
        shift_factor=0.1159, use_quant_conv=False)."""
        return AutoencoderKLConfig(
            z_channels=16, embed_dim=16, scale_factor=0.3611, shift_factor=0.1159,
            use_quant_conv=False,
        )

    @staticmethod
    def tiny() -> "AutoencoderKLConfig":
        return AutoencoderKLConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)


class _ResnetBlock(nn.Module):
    """Reference ``ResnetBlock`` with temb_channels=0 (autoencoder.py:75-134)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = group_norm_silu(
            x,
            self.param("norm1_scale", nn.initializers.ones, (c_in,), jnp.float32),
            self.param("norm1_bias", nn.initializers.zeros, (c_in,), jnp.float32),
            eps=1e-6,
        )
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = group_norm_silu(
            h,
            self.param("norm2_scale", nn.initializers.ones, (self.out_channels,), jnp.float32),
            self.param("norm2_bias", nn.initializers.zeros, (self.out_channels,), jnp.float32),
            eps=1e-6,
        )
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class _AttnBlock(nn.Module):
    """Reference single-head ``AttnBlock`` (autoencoder.py:143-195) — its four
    1×1 convs are Dense layers over flattened tokens here (same math)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = group_norm_silu(
            x,
            self.param("norm_scale", nn.initializers.ones, (c,), jnp.float32),
            self.param("norm_bias", nn.initializers.zeros, (c,), jnp.float32),
            eps=1e-6,
            apply_silu=False,
        )
        tokens = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="q")(tokens)[:, :, None, :]
        k = nn.Dense(c, dtype=self.dtype, name="k")(tokens)[:, :, None, :]
        v = nn.Dense(c, dtype=self.dtype, name="v")(tokens)[:, :, None, :]
        out = dot_product_attention(q, k, v).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj_out")(out)
        return x + out.reshape(b, h, w, c)


class _Encoder(nn.Module):
    cfg: AutoencoderKLConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.dtype
        h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=dt, name="conv_in")(x.astype(dt))
        for lv, mult in enumerate(cfg.ch_mult):
            for i in range(cfg.num_res_blocks):
                h = _ResnetBlock(cfg.ch * mult, dtype=dt, name=f"down_{lv}_block_{i}")(h)
            if lv != len(cfg.ch_mult) - 1:
                # asymmetric (0,1,0,1) pad + VALID stride-2 conv (autoencoder.py:65-71)
                hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    h.shape[-1], (3, 3), strides=2, padding="VALID", dtype=dt,
                    name=f"down_{lv}_downsample",
                )(hp)
        h = _ResnetBlock(h.shape[-1], dtype=dt, name="mid_block_1")(h)
        h = _AttnBlock(dtype=dt, name="mid_attn_1")(h)
        h = _ResnetBlock(h.shape[-1], dtype=dt, name="mid_block_2")(h)
        h = group_norm_silu(
            h,
            self.param("norm_out_scale", nn.initializers.ones, (h.shape[-1],), jnp.float32),
            self.param("norm_out_bias", nn.initializers.zeros, (h.shape[-1],), jnp.float32),
            eps=1e-6,
        )
        return nn.Conv(2 * cfg.z_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(h)


class _Decoder(nn.Module):
    cfg: AutoencoderKLConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dt = cfg.dtype
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=dt, name="conv_in")(z.astype(dt))
        h = _ResnetBlock(block_in, dtype=dt, name="mid_block_1")(h)
        h = _AttnBlock(dtype=dt, name="mid_attn_1")(h)
        h = _ResnetBlock(block_in, dtype=dt, name="mid_block_2")(h)
        for lv in reversed(range(len(cfg.ch_mult))):
            out_ch = cfg.ch * cfg.ch_mult[lv]
            for i in range(cfg.num_res_blocks + 1):
                h = _ResnetBlock(out_ch, dtype=dt, name=f"up_{lv}_block_{i}")(h)
            if lv != 0:
                b, hh, ww, c = h.shape
                h = jnp.broadcast_to(h[:, :, None, :, None, :], (b, hh, 2, ww, 2, c))
                h = h.reshape(b, hh * 2, ww * 2, c)
                h = nn.Conv(c, (3, 3), padding=1, dtype=dt, name=f"up_{lv}_upsample")(h)
        h = group_norm_silu(
            h,
            self.param("norm_out_scale", nn.initializers.ones, (h.shape[-1],), jnp.float32),
            self.param("norm_out_bias", nn.initializers.zeros, (h.shape[-1],), jnp.float32),
            eps=1e-6,
        )
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """Frozen KL autoencoder with string-dispatched methods, mirroring the
    reference's ``forward(inputs, fn)`` (autoencoder.py:452-460):

      apply(params, x, "encode_moments")      -> [B,h,w,2*embed_dim]
      apply(params, x, "encode", key)         -> scaled sampled posterior
      apply(params, z, "decode")              -> [B,H,W,out_channels] f32
      apply(params, x, "init", key)           -> runs every path (for init)
    """

    cfg: AutoencoderKLConfig

    @nn.compact
    def __call__(self, inputs, fn: str = "encode", key: Optional[jax.Array] = None):
        cfg = self.cfg
        encoder = _Encoder(cfg, name="encoder")
        decoder = _Decoder(cfg, name="decoder")
        if cfg.use_quant_conv:
            quant = nn.Conv(2 * cfg.embed_dim, (1, 1), dtype=cfg.dtype, name="quant_conv")
            post_quant = nn.Conv(cfg.z_channels, (1, 1), dtype=cfg.dtype, name="post_quant_conv")
        else:  # SD3/Flux-style VAE: moments come straight from the encoder
            quant = post_quant = lambda h: h

        def encode_moments(x):
            return quant(encoder(x)).astype(jnp.float32)

        def sample(moments, k):
            mean, logvar = jnp.split(moments, 2, axis=-1)
            logvar = jnp.clip(logvar, -30.0, 20.0)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(k, mean.shape, jnp.float32)
            return cfg.scale_factor * (z - cfg.shift_factor)

        def decode(z):
            z = post_quant((z / cfg.scale_factor + cfg.shift_factor).astype(cfg.dtype))
            return decoder(z).astype(jnp.float32)

        if fn == "init":
            moments = encode_moments(inputs)
            z = sample(moments, key if key is not None else jax.random.key(0))
            return decode(z)
        if fn == "encode_moments":
            return encode_moments(inputs)
        if fn == "encode":
            if key is None:
                raise ValueError("encode requires an rng key for posterior sampling")
            return sample(encode_moments(inputs), key)
        if fn == "decode":
            return decode(inputs)
        raise NotImplementedError(fn)
