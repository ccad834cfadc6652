"""SD3 MMDiT (diffusers ``SD3Transformer2DModel`` family) in flax.

The reference's SD3 uncertainty pipeline
(``pipeline_uncertainty/pipeline_stable_diffusion_3_uncertainty_guided.py:260-300``)
drives this architecture through diffusers; here it is re-designed for TPU:
NHWC latents patchified inside the model, all-matmul token compute on the MXU,
bf16 activations with f32 norms, the shared attention kernel over the joint
[image | text] sequence, optional per-block remat.

Block structure (diffusers ``JointTransformerBlock``):
  AdaLN-Zero(temb) on both streams → joint attention over concatenated
  image+text tokens (separate qkv projections per stream) → gated residual →
  AdaLN-Zero MLP (tanh-approx GELU) per stream. The last block is
  ``context_pre_only``: the text stream gets an AdaLN-Continuous norm and is
  then dropped. Final AdaLN-Continuous + linear head, unpatchify.

Conditioning: temb = MLP(sincos(t)) + MLP(pooled_text); sequence context =
linear(T5/CLIP joint embeddings).
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

__all__ = ["MMDiTConfig", "MMDiT"]


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    sample_size: int = 128  # latent side (1024px / 8)
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24  # width = heads * head_dim = 1536
    joint_attention_dim: int = 4096
    # sequence parallelism (parallel/sp.py): when set, the model must be
    # applied under a shard_map whose mesh has this axis, with x sharded on
    # image ROWS and encoder_hidden_states sharded on text tokens; joint
    # attention runs the exact ring over the axis and the pos-embed crop
    # offsets by the shard's row rank. No reference analogue (SURVEY §2.4).
    sp_axis: Optional[str] = None
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    qk_norm: Optional[str] = None  # "rms_norm" for SD3.5
    dtype: Any = jnp.float32
    remat: bool = False

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @staticmethod
    def sd3_medium() -> "MMDiTConfig":
        """stabilityai/stable-diffusion-3-medium transformer (2.0B)."""
        return MMDiTConfig()

    @staticmethod
    def sd35_large() -> "MMDiTConfig":
        """SD3.5-large: 38 layers, width 2432, RMS-normed q/k (8.1B)."""
        return MMDiTConfig(
            num_layers=38, num_attention_heads=38, qk_norm="rms_norm"
        )

    @staticmethod
    def tiny() -> "MMDiTConfig":
        return MMDiTConfig(
            sample_size=8,
            num_layers=2,
            attention_head_dim=8,
            num_attention_heads=4,
            joint_attention_dim=24,
            pooled_projection_dim=20,
            pos_embed_max_size=16,
        )


def _ln(name: str):
    """LayerNorm without learned affine (diffusers elementwise_affine=False)."""
    return nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False, dtype=jnp.float32, name=name)


class _TimestepTextEmbed(nn.Module):
    """``CombinedTimestepTextProjEmbeddings``: 256-dim cos-first sincos →
    2-layer MLP, plus pooled-text 2-layer MLP, summed."""

    dim: int
    dtype: Dtype

    @nn.compact
    def __call__(self, t, pooled):
        te = timestep_embedding(t, 256, cos_first=True).astype(self.dtype)
        te = nn.Dense(self.dim, dtype=self.dtype, name="timestep_dense_0")(te)
        te = nn.Dense(self.dim, dtype=self.dtype, name="timestep_dense_1")(nn.silu(te))
        pe = nn.Dense(self.dim, dtype=self.dtype, name="text_dense_0")(pooled.astype(self.dtype))
        pe = nn.Dense(self.dim, dtype=self.dtype, name="text_dense_1")(nn.silu(pe))
        if te.shape[0] == 1 and pe.shape[0] > 1:
            te = jnp.broadcast_to(te, pe.shape)
        return te + pe


class _QKNorm(nn.Module):
    """Per-head RMSNorm of q/k (SD3.5 / Flux convention)."""

    name_prefix: str
    dtype: Dtype

    @nn.compact
    def __call__(self, q, k):  # [B, S, H, d]
        d = q.shape[-1]

        def rms(x, scale):
            x32 = x.astype(jnp.float32)
            x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + 1e-6)
            return (x32 * scale).astype(x.dtype)

        sq = self.param(f"{self.name_prefix}q_scale", nn.initializers.ones, (d,), jnp.float32)
        sk = self.param(f"{self.name_prefix}k_scale", nn.initializers.ones, (d,), jnp.float32)
        return rms(q, sq), rms(k, sk)


class _JointBlock(nn.Module):
    """diffusers ``JointTransformerBlock`` (AdaLN-Zero chunk order:
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp)."""

    cfg: MMDiTConfig
    context_pre_only: bool = False

    @nn.compact
    def __call__(self, h, ctx, temb):
        cfg = self.cfg
        dim, heads = cfg.dim, cfg.num_attention_heads
        hd = cfg.attention_head_dim
        b, s_img, _ = h.shape
        silu_t = nn.silu(temb)

        mod_h = nn.Dense(6 * dim, dtype=cfg.dtype, name="norm1_linear")(silu_t)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mod_h[:, None, :], 6, axis=-1)
        h_n = _ln("norm1")(h).astype(cfg.dtype) * (1 + sc_msa) + sh_msa

        if self.context_pre_only:
            # AdaLN-Continuous on the final text stream (chunk order scale, shift)
            mod_c = nn.Dense(2 * dim, dtype=cfg.dtype, name="norm1_context_linear")(silu_t)
            sc_c, sh_c = jnp.split(mod_c[:, None, :], 2, axis=-1)
            c_n = _ln("norm1_context")(ctx).astype(cfg.dtype) * (1 + sc_c) + sh_c
        else:
            mod_c = nn.Dense(6 * dim, dtype=cfg.dtype, name="norm1_context_linear")(silu_t)
            csh_msa, csc_msa, cg_msa, csh_mlp, csc_mlp, cg_mlp = jnp.split(
                mod_c[:, None, :], 6, axis=-1
            )
            c_n = _ln("norm1_context")(ctx).astype(cfg.dtype) * (1 + csc_msa) + csh_msa

        dense = lambda n, d=dim: nn.Dense(d, dtype=cfg.dtype, name=n)
        q = dense("to_q")(h_n)
        k = dense("to_k")(h_n)
        v = dense("to_v")(h_n)
        cq = dense("add_q_proj")(c_n)
        ck = dense("add_k_proj")(c_n)
        cv = dense("add_v_proj")(c_n)

        split_heads = lambda a: a.reshape(a.shape[0], a.shape[1], heads, hd)
        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        cq, ck, cv = split_heads(cq), split_heads(ck), split_heads(cv)
        if cfg.qk_norm == "rms_norm":
            q, k = _QKNorm("", dtype=cfg.dtype, name="qk_norm")(q, k)
            cq, ck = _QKNorm("added_", dtype=cfg.dtype, name="qk_norm_added")(cq, ck)

        # joint sequence order: [image tokens | text tokens] (JointAttnProcessor)
        qj = jnp.concatenate([q, cq], axis=1)
        kj = jnp.concatenate([k, ck], axis=1)
        vj = jnp.concatenate([v, cv], axis=1)
        if cfg.sp_axis is not None:
            # sequence-parallel: this shard holds [img_local | txt_local];
            # the union over shards is the full joint sequence exactly once,
            # and softmax attention is permutation-invariant in K/V, so the
            # ring reproduces the unsharded joint attention exactly
            from ..parallel.sp import ring_attention_shard

            out = ring_attention_shard(qj, kj, vj, cfg.sp_axis)
        else:
            out = dot_product_attention(qj, kj, vj)
        out = out.reshape(b, qj.shape[1], dim)
        attn_h, attn_c = out[:, :s_img], out[:, s_img:]

        h = h + g_msa * dense("to_out")(attn_h)
        h_m = _ln("norm2")(h).astype(cfg.dtype) * (1 + sc_mlp) + sh_mlp
        ff = dense("ff_out")(
            jax.nn.gelu(dense("ff_proj", 4 * dim)(h_m).astype(jnp.float32), approximate=True).astype(cfg.dtype)
        )
        h = h + g_mlp * ff

        if self.context_pre_only:
            return h, None
        ctx = ctx + cg_msa * dense("to_add_out")(attn_c)
        c_m = _ln("norm2_context")(ctx).astype(cfg.dtype) * (1 + csc_mlp) + csh_mlp
        cff = dense("ff_context_out")(
            jax.nn.gelu(dense("ff_context_proj", 4 * dim)(c_m).astype(jnp.float32), approximate=True).astype(cfg.dtype)
        )
        ctx = ctx + cg_mlp * cff
        return h, ctx


class MMDiT(nn.Module):
    """``__call__(x[B,H,W,C], t[()|B], encoder_hidden_states[B,L,joint_dim],
    pooled_projections[B,pooled_dim])`` -> [B,H,W,out_channels] f32 velocity.

    ``t`` is the raw train-timestep value (σ·1000 under flow matching — the
    reference SD3 pipeline convention)."""

    cfg: MMDiTConfig

    @nn.compact
    def __call__(self, x, t, encoder_hidden_states, pooled_projections):
        cfg = self.cfg
        b, hh, ww, _ = x.shape
        p, dim = cfg.patch_size, cfg.dim
        gh, gw = hh // p, ww // p

        tokens = nn.Conv(
            dim, (p, p), strides=(p, p), padding="VALID", dtype=cfg.dtype, name="patch_embed"
        )(x.astype(cfg.dtype)).reshape(b, gh * gw, dim)

        # learned pos table over the max grid, center-cropped to (gh, gw)
        # (diffusers PatchEmbed.cropped_pos_embed)
        m = cfg.pos_embed_max_size
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, m * m, dim), jnp.float32)
        if cfg.sp_axis is not None:
            # x is row-sharded: gh is the LOCAL grid height; crop the global
            # window and offset by this shard's row rank
            n_sp = jax.lax.psum(1, cfg.sp_axis)  # static mesh-axis size
            top = (m - gh * n_sp) // 2 + jax.lax.axis_index(cfg.sp_axis) * gh
            left = (m - gw) // 2
            pos2d = jax.lax.dynamic_slice(
                pos.reshape(m, m, dim), (top, left, 0), (gh, gw, dim)
            )
        else:
            top, left = (m - gh) // 2, (m - gw) // 2
            pos2d = pos.reshape(m, m, dim)[top : top + gh, left : left + gw]
        tokens = tokens + pos2d.reshape(1, gh * gw, dim).astype(cfg.dtype)

        temb = _TimestepTextEmbed(dim, cfg.dtype, name="time_text_embed")(t, pooled_projections)
        ctx = nn.Dense(dim, dtype=cfg.dtype, name="context_embedder")(
            encoder_hidden_states.astype(cfg.dtype)
        )

        block = nn.remat(_JointBlock) if cfg.remat else _JointBlock
        h = tokens
        for i in range(cfg.num_layers):
            h, ctx = block(
                cfg, context_pre_only=(i == cfg.num_layers - 1), name=f"block_{i}"
            )(h, ctx, temb)

        # final AdaLN-Continuous (chunk order: scale, shift) + linear head
        mod = nn.Dense(2 * dim, dtype=cfg.dtype, name="norm_out_linear")(nn.silu(temb))
        sc, sh = jnp.split(mod[:, None, :], 2, axis=-1)
        h = _ln("norm_out")(h).astype(cfg.dtype) * (1 + sc) + sh
        h = nn.Dense(p * p * cfg.out_channels, dtype=cfg.dtype, name="proj_out")(h)

        h = h.reshape(b, gh, gw, p, p, cfg.out_channels)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cfg.out_channels)
        return h.astype(jnp.float32)
