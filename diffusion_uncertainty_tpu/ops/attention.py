"""Attention dispatch: Pallas flash-attention on TPU, XLA elsewhere.

The reference relies on torch SDPA / xformers picked at import time
(``uvit/uvit.py:8-17``) and hand-rolled einsum attention in ADM
(``guided_diffusion/unet_openai.py:329-395``). Sequence lengths in this model
zoo are ≤ ~4096 tokens (SURVEY.md §5.7), so per-chip blockwise flash attention
is the right kernel-level analogue of "sequence parallelism" here; the Pallas
kernel lives in ``flash_attention.py`` and this wrapper picks it when shapes
and platform allow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention"]


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def dot_product_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,  # [B, S, H, D]
    v: jnp.ndarray,  # [B, S, H, D]
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Softmax(QKᵀ/√d)V with float32 logits/softmax, output in q.dtype.

    ``use_pallas=None`` auto-selects the Pallas flash kernel on TPU when the
    shape meets its tiling constraints; pass False to force the XLA path
    (useful for numerics comparisons in tests).
    """
    if use_pallas is None:
        import os

        use_pallas = _on_tpu() and os.environ.get("DU_TPU_DISABLE_PALLAS_ATTN") != "1"
    if use_pallas:
        import os

        from .flash_attention import supports
        from .packed_attention import packed_supports

        b, s, h, d = q.shape
        s_kv = k.shape[1]
        if (
            (d % 128 != 0 or s_kv <= 512)
            and packed_supports(q.shape, q.dtype, s_kv)
            and os.environ.get("DU_TPU_PACKED_ATTN") != "0"
        ):
            # packed-head kernel: attends straight out of [B,S,H·D] with no
            # transposes/padding and no HBM logits. Two regimes win on chip:
            # (1) non-lane-aligned heads (U-ViT 72, CLIP/MMDiT 64) — U-ViT
            # b64 forward 139.8 (fast-softmax XLA) -> 125.7 ms chained in a
            # lax.scan (66.7% MFU), kernel 0.76 ms/site; ADM's d=192 32²
            # sites 0.1 ms/call vs the fold path's transposes; (2) short
            # lane-aligned rows (ADM 16²/8², d=256) where the per-head grid
            # of the flash kernel is grid-overhead-bound (192 tiny programs)
            # and one program per batch item amortizes the K/V DMA
            return _packed_with_xla_grad(q, k, v, None)
        sp, sp_kv = _pad_plan(q.shape, q.dtype, s_kv, supports)
        if sp is not None:
            if sp == s and sp_kv == s_kv:
                return _flash_with_xla_grad(q, k, v, None)
            # misaligned rows run the kernel zero-padded: padded KEYS are
            # masked to exp(-inf)=0 weight (exact softmax over the real
            # kv_len rows — SD3's image+text joint sequence, SD1.5's
            # 77-token cross-attention context); padded QUERY rows compute
            # garbage sliced off here
            qpad = ((0, 0), (0, sp - s), (0, 0), (0, 0))
            kpad = ((0, 0), (0, sp_kv - s_kv), (0, 0), (0, 0))
            out = _flash_with_xla_grad(
                jnp.pad(q, qpad), jnp.pad(k, kpad), jnp.pad(v, kpad),
                s_kv if sp_kv != s_kv else None,
            )
            return out[:, :s]
        if os.environ.get("DU_TPU_FAST_SOFTMAX") != "0":
            # shapes the Pallas kernel rejects (U-ViT's non-lane-aligned
            # d=72 heads): the bandwidth-lean XLA schedule below instead of
            # the f32-logits fallback
            return _xla_attention_fast(q, k, v)
    return _xla_attention(q, k, v)


def _pad_plan(q_shape, dtype, s_kv: int, supports) -> tuple[int | None, int | None]:
    """(padded_s, padded_s_kv) — the smallest kernel-accepted padding of the
    two sequence lengths, preferring exact/8-aligned (zero or minimal copy)
    over 128-aligned; (None, None) when nothing reasonable is supported.

    Non-lane-aligned head dims (d % 128 != 0) take the kernel ONLY at exact
    sequence lengths: those heads already pay the [B,S,H,D]→[B·H,S,Dpad]
    transpose + lane-pad materializations, and stacking sequence padding on
    top measurably loses to XLA's direct attention — U-ViT-huge (S=258,
    d=72) ran 2.67 vs 3.14 imgs/sec whole-loop on a v5e before this gate
    (on-chip A/B, r3). ADM's d=192 levels keep the kernel (their S is
    already 8/128-aligned, so they never enter the padded branch).
    DU_TPU_ATTN_PAD_ANY_D=1 lifts the gate for on-chip A/Bs."""
    import os

    b, s, h, d = q_shape
    ceil8 = lambda n: max((n + 7) // 8 * 8, 8)
    ceil128 = lambda n: max((n + 127) // 128 * 128, 8)
    lane_aligned = d % 128 == 0 or os.environ.get("DU_TPU_ATTN_PAD_ANY_D") == "1"
    for sp in dict.fromkeys((ceil8(s), ceil128(s))):
        for spk in dict.fromkeys((ceil8(s_kv), ceil128(s_kv))):
            if not lane_aligned and (sp != s or spk != s_kv):
                continue
            if sp <= max(2 * s, 8) and spk <= max(2 * s_kv, 8) and supports((b, sp, h, d), dtype, spk):
                return sp, spk
    return None, None


# bounded-logit clamp for the fast softmax: exp(60) ≈ 1.1e26 stays far
# inside bf16/f32 range even summed over 4k keys; post-LayerNorm logits in
# this model zoo sit around |s| ≤ ~30, so the clamp is dead in practice and
# exists only to make a pathological activation finite instead of inf/nan
_FAST_SOFTMAX_BOUND = 60.0


def _xla_attention_fast(q, k, v):
    """Bandwidth-lean XLA attention for Pallas-rejected shapes (TPU only).

    The standard fallback materializes f32 [B,H,S,S] logits and walks them
    ~5 times (QK write, max, exp, sum, PV read) — ~2.1 ms/site at U-ViT's
    [64,258,16,72] where 273 MB of logits dominate. This schedule skips the
    per-row max (softmax is shift-invariant; boundedness replaces the shift
    — see _FAST_SOFTMAX_BOUND) so exp() fuses into the QK matmul epilogue
    and the probabilities land in HBM ONCE, in bf16 (136 MB): three passes
    total. Storing exp(s) in bf16 keeps softmax weights to ~0.4% relative
    error (vs ~8% if the *logits* were rounded to bf16: d/ds exp amplifies
    logit error by the logit magnitude). Exactness-critical paths (oracle
    tests, CPU) keep _xla_attention via use_pallas=False / non-TPU dispatch;
    DU_TPU_FAST_SOFTMAX=0 restores it on TPU too."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(
        jnp.clip(s, -_FAST_SOFTMAX_BOUND, _FAST_SOFTMAX_BOUND)
    ).astype(jnp.bfloat16)
    l = jnp.sum(p, axis=-1, dtype=jnp.float32)  # [B,H,Sq]
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32)
    out = out / jnp.transpose(l, (0, 2, 1))[..., None]
    return out.astype(q.dtype)


def _xla_attention(q, k, v):
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_with_xla_grad(q, k, v, kv_len):
    """Pallas flash forward; standard-attention einsum math for the backward
    (Pallas kernels have no VJP — the gradient-based guidance/estimator
    family differentiates through the model, caught live on the SD guided
    path)."""
    from .flash_attention import flash_attention

    return flash_attention(q, k, v, kv_len=kv_len)


def _flash_fwd(q, k, v, kv_len):
    return _flash_with_xla_grad(q, k, v, kv_len), (q, k, v)


def _flash_bwd(kv_len, res, g):
    q, k, v = res
    qf, kf, vf = (a.astype(jnp.float32) for a in (q, k, v))
    gf = g.astype(jnp.float32)
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
    if kv_len is not None and kv_len < k.shape[1]:
        mask = jnp.arange(k.shape[1]) < kv_len
        logits = jnp.where(mask[None, None, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", w, gf)
    dw = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_with_xla_grad.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _packed_with_xla_grad(q, k, v, kv_len):
    """Packed-head Pallas forward; standard-attention einsum math for the
    backward (same rationale as _flash_with_xla_grad)."""
    from .packed_attention import packed_attention

    return packed_attention(q, k, v, kv_len=kv_len)


def _packed_fwd(q, k, v, kv_len):
    return _packed_with_xla_grad(q, k, v, kv_len), (q, k, v)


_packed_with_xla_grad.defvjp(_packed_fwd, _flash_bwd)
