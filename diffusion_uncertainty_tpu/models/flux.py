"""Flux transformer (diffusers ``FluxTransformer2DModel`` family) in flax.

The reference's Flux uncertainty pipeline
(``pipeline_uncertainty/pipeline_flux_uncertainty.py:204-249``) drives this
architecture through diffusers. TPU re-design notes: the model takes NHWC
latents ([B,h,w,16]) and does the 2×2 token packing / unpacking and the RoPE
id construction internally (the diffusers interface makes the *caller* pack
tokens and ship ``img_ids``/``txt_ids`` host-side — pointless under jit where
everything is traced); all token compute is MXU matmuls; bf16 activations
with f32 norms; optional per-block remat.

Structure: 19 double-stream blocks (separate image/text qkv, joint attention
with RoPE, AdaLN-Zero gates per stream) then 38 single-stream blocks over the
concatenated [text | image] sequence (fused attention+MLP with one output
projection), final AdaLN-Continuous head. Timestep/guidance/pooled-text
conditioning via sincos→MLP embeddings, summed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from .layers import timestep_embedding

Dtype = Any

__all__ = ["FluxConfig", "FluxTransformer"]


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 16  # latent channels BEFORE 2x2 packing (token dim 64)
    num_layers: int = 19  # double-stream blocks
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24  # width 3072
    joint_attention_dim: int = 4096  # T5 context width
    pooled_projection_dim: int = 768  # CLIP pooled width
    guidance_embeds: bool = True  # flux-dev; schnell has False
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    # sequence parallelism (parallel/sp.py): when set, apply under a shard_map
    # whose mesh has this axis, with x sharded on latent ROWS and
    # encoder_hidden_states sharded on text tokens; joint attention runs the
    # exact ring over the axis and the RoPE row ids offset by the shard's
    # rank. No reference analogue (SURVEY §2.4).
    sp_axis: Optional[str] = None
    dtype: Any = jnp.float32
    remat: bool = False

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @staticmethod
    def flux_dev() -> "FluxConfig":
        """black-forest-labs/FLUX.1-dev (11.9B)."""
        return FluxConfig()

    @staticmethod
    def flux_schnell() -> "FluxConfig":
        return FluxConfig(guidance_embeds=False)

    @staticmethod
    def tiny() -> "FluxConfig":
        return FluxConfig(
            in_channels=4,
            num_layers=2,
            num_single_layers=2,
            attention_head_dim=8,
            num_attention_heads=2,
            joint_attention_dim=24,
            pooled_projection_dim=16,
            axes_dims_rope=(4, 2, 2),
        )


def _rope_cos_sin(ids: jnp.ndarray, axes_dims, theta: float = 10000.0):
    """diffusers ``FluxPosEmbed``: per-axis rotary tables, channel-concat.

    ids [S, n_axes] float; returns (cos, sin) [S, sum(axes_dims)] with each
    frequency repeated twice (interleaved-pair rotation convention)."""
    parts_cos, parts_sin = [], []
    for a, d in enumerate(axes_dims):
        freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
        ang = ids[:, a : a + 1].astype(jnp.float32) * freqs[None, :]  # [S, d/2]
        parts_cos.append(jnp.repeat(jnp.cos(ang), 2, axis=-1))
        parts_sin.append(jnp.repeat(jnp.sin(ang), 2, axis=-1))
    return jnp.concatenate(parts_cos, axis=-1), jnp.concatenate(parts_sin, axis=-1)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, S, H, d]; interleaved-pair rotation (apply_rotary_emb use_real,
    unbind_dim=-1): out = x·cos + rotate_pairs(x)·sin, all in f32."""
    x32 = x.astype(jnp.float32)
    x1 = x32[..., 0::2]
    x2 = x32[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(x32.shape)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x32 * c + rotated * s).astype(x.dtype)


def _rms_qk(mdl: nn.Module, q, k, prefix: str):
    d = q.shape[-1]

    def rms(x, scale):
        x32 = x.astype(jnp.float32)
        x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + 1e-6)
        return (x32 * scale).astype(x.dtype)

    sq = mdl.param(f"{prefix}q_scale", nn.initializers.ones, (d,), jnp.float32)
    sk = mdl.param(f"{prefix}k_scale", nn.initializers.ones, (d,), jnp.float32)
    return rms(q, sq), rms(k, sk)


def _ln(name: str):
    return nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False, dtype=jnp.float32, name=name)


class _DoubleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, h, ctx, temb, cos, sin):
        cfg = self.cfg
        dim, heads, hd = cfg.dim, cfg.num_attention_heads, cfg.attention_head_dim
        b, s_img, _ = h.shape
        s_txt = ctx.shape[1]
        silu_t = nn.silu(temb)

        mod_h = nn.Dense(6 * dim, dtype=cfg.dtype, name="norm1_linear")(silu_t)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mod_h[:, None, :], 6, axis=-1)
        mod_c = nn.Dense(6 * dim, dtype=cfg.dtype, name="norm1_context_linear")(silu_t)
        csh_msa, csc_msa, cg_msa, csh_mlp, csc_mlp, cg_mlp = jnp.split(mod_c[:, None, :], 6, axis=-1)

        h_n = _ln("norm1")(h).astype(cfg.dtype) * (1 + sc_msa) + sh_msa
        c_n = _ln("norm1_context")(ctx).astype(cfg.dtype) * (1 + csc_msa) + csh_msa

        dense = lambda n, d=dim: nn.Dense(d, dtype=cfg.dtype, name=n)
        split_heads = lambda a: a.reshape(a.shape[0], a.shape[1], heads, hd)
        q, k, v = (split_heads(dense(n)(h_n)) for n in ("to_q", "to_k", "to_v"))
        cq, ck, cv = (
            split_heads(dense(n)(c_n)) for n in ("add_q_proj", "add_k_proj", "add_v_proj")
        )
        q, k = _rms_qk(self, q, k, "")
        cq, ck = _rms_qk(self, cq, ck, "added_")

        # joint order [text | image] (FluxAttnProcessor concat order)
        qj = _apply_rope(jnp.concatenate([cq, q], axis=1), cos, sin)
        kj = _apply_rope(jnp.concatenate([ck, k], axis=1), cos, sin)
        vj = jnp.concatenate([cv, v], axis=1)
        if cfg.sp_axis is not None:
            # each shard holds [txt_local | img_local]; the union over shards
            # is the full joint sequence exactly once, and softmax attention
            # is permutation-invariant in K/V, so the ring is exact
            from ..parallel.sp import ring_attention_shard

            out = ring_attention_shard(qj, kj, vj, cfg.sp_axis)
        else:
            out = dot_product_attention(qj, kj, vj)
        out = out.reshape(b, s_txt + s_img, dim)
        attn_c, attn_h = out[:, :s_txt], out[:, s_txt:]

        h = h + g_msa * dense("to_out")(attn_h)
        h_m = _ln("norm2")(h).astype(cfg.dtype) * (1 + sc_mlp) + sh_mlp
        h = h + g_mlp * dense("ff_out")(
            jax.nn.gelu(dense("ff_proj", 4 * dim)(h_m).astype(jnp.float32), approximate=True).astype(cfg.dtype)
        )

        ctx = ctx + cg_msa * dense("to_add_out")(attn_c)
        c_m = _ln("norm2_context")(ctx).astype(cfg.dtype) * (1 + csc_mlp) + csh_mlp
        ctx = ctx + cg_mlp * dense("ff_context_out")(
            jax.nn.gelu(dense("ff_context_proj", 4 * dim)(c_m).astype(jnp.float32), approximate=True).astype(cfg.dtype)
        )
        return h, ctx


class _SingleBlock(nn.Module):
    """Fused attention+MLP over the whole [text | image] sequence with a
    single gated output projection (diffusers ``FluxSingleTransformerBlock``)."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, temb, cos, sin):
        cfg = self.cfg
        dim, heads, hd = cfg.dim, cfg.num_attention_heads, cfg.attention_head_dim
        b, s, _ = x.shape
        mod = nn.Dense(3 * dim, dtype=cfg.dtype, name="norm_linear")(nn.silu(temb))
        sh, sc, gate = jnp.split(mod[:, None, :], 3, axis=-1)
        x_n = _ln("norm")(x).astype(cfg.dtype) * (1 + sc) + sh

        dense = lambda n, d=dim: nn.Dense(d, dtype=cfg.dtype, name=n)
        split_heads = lambda a: a.reshape(b, s, heads, hd)
        q, k, v = (split_heads(dense(n)(x_n)) for n in ("to_q", "to_k", "to_v"))
        q, k = _rms_qk(self, q, k, "")
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        if cfg.sp_axis is not None:
            from ..parallel.sp import ring_attention_shard

            attn = ring_attention_shard(q, k, v, cfg.sp_axis).reshape(b, s, dim)
        else:
            attn = dot_product_attention(q, k, v).reshape(b, s, dim)
        mlp = jax.nn.gelu(
            dense("proj_mlp", 4 * dim)(x_n).astype(jnp.float32), approximate=True
        ).astype(cfg.dtype)
        out = nn.Dense(dim, dtype=cfg.dtype, name="proj_out")(
            jnp.concatenate([attn, mlp], axis=-1)
        )
        return x + gate * out


class FluxTransformer(nn.Module):
    """``__call__(x[B,h,w,C], t[()|B], encoder_hidden_states[B,L,joint_dim],
    pooled_projections[B,pooled_dim], guidance[()|B]|None)`` ->
    [B,h,w,C] f32 velocity.

    ``t``/``guidance`` are raw train-timestep-scale values (the diffusers
    forward multiplies its /1000 inputs back by 1000 — we skip the round trip).
    h and w must be even (2×2 packing)."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, t, encoder_hidden_states, pooled_projections, guidance=None):
        cfg = self.cfg
        b, hh, ww, c = x.shape
        gh, gw = hh // 2, ww // 2
        dim = cfg.dim
        s_img = gh * gw
        s_txt = encoder_hidden_states.shape[1]

        # 2x2 token packing (diffusers _pack_latents row-major patch order)
        tokens = x.reshape(b, gh, 2, gw, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, s_img, 4 * c)
        h = nn.Dense(dim, dtype=cfg.dtype, name="x_embedder")(tokens.astype(cfg.dtype))
        ctx = nn.Dense(dim, dtype=cfg.dtype, name="context_embedder")(
            encoder_hidden_states.astype(cfg.dtype)
        )

        te = timestep_embedding(t, 256, cos_first=True).astype(cfg.dtype)
        temb = nn.Dense(dim, dtype=cfg.dtype, name="timestep_dense_0")(te)
        temb = nn.Dense(dim, dtype=cfg.dtype, name="timestep_dense_1")(nn.silu(temb))
        if cfg.guidance_embeds:
            if guidance is None:
                raise ValueError("guidance_embeds=True requires a guidance value")
            ge = timestep_embedding(jnp.asarray(guidance), 256, cos_first=True).astype(cfg.dtype)
            ge = nn.Dense(dim, dtype=cfg.dtype, name="guidance_dense_0")(ge)
            temb = temb + nn.Dense(dim, dtype=cfg.dtype, name="guidance_dense_1")(nn.silu(ge))
        pe = nn.Dense(dim, dtype=cfg.dtype, name="text_dense_0")(
            pooled_projections.astype(cfg.dtype)
        )
        temb = temb + nn.Dense(dim, dtype=cfg.dtype, name="text_dense_1")(nn.silu(pe))
        if temb.shape[0] == 1 and b > 1:
            temb = jnp.broadcast_to(temb, (b, dim))

        # RoPE ids: text tokens at the origin (identity rotation), image tokens
        # on the (row, col) grid in axes 1/2 (FluxPipeline._prepare_latent_image_ids)
        row0 = 0.0
        if cfg.sp_axis is not None:
            # x is row-sharded: gh is the LOCAL packed-grid height; each
            # shard's rows sit at a rank-offset window of the global grid
            row0 = (jax.lax.axis_index(cfg.sp_axis) * gh).astype(jnp.float32)
        rows = row0 + jnp.repeat(jnp.arange(gh, dtype=jnp.float32), gw)
        cols = jnp.tile(jnp.arange(gw, dtype=jnp.float32), gh)
        img_ids = jnp.stack([jnp.zeros_like(rows), rows, cols], axis=-1)
        txt_ids = jnp.zeros((s_txt, 3), jnp.float32)
        cos, sin = _rope_cos_sin(jnp.concatenate([txt_ids, img_ids], axis=0), cfg.axes_dims_rope)

        dblock = nn.remat(_DoubleBlock) if cfg.remat else _DoubleBlock
        sblock = nn.remat(_SingleBlock) if cfg.remat else _SingleBlock
        for i in range(cfg.num_layers):
            h, ctx = dblock(cfg, name=f"block_{i}")(h, ctx, temb, cos, sin)

        seq = jnp.concatenate([ctx, h], axis=1)
        for i in range(cfg.num_single_layers):
            seq = sblock(cfg, name=f"single_block_{i}")(seq, temb, cos, sin)
        h = seq[:, s_txt:]

        mod = nn.Dense(2 * dim, dtype=cfg.dtype, name="norm_out_linear")(nn.silu(temb))
        sc, sh = jnp.split(mod[:, None, :], 2, axis=-1)
        h = _ln("norm_out")(h).astype(cfg.dtype) * (1 + sc) + sh
        h = nn.Dense(4 * c, dtype=cfg.dtype, name="proj_out")(h)
        h = h.reshape(b, gh, gw, 2, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)
        return h.astype(jnp.float32)
