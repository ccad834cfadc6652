"""Packed-head whole-row attention Pallas TPU kernel.

For head dims that are NOT a lane multiple (U-ViT-huge d=72, CLIP/MMDiT
d=64), the flash kernel in ``flash_attention.py`` must either transpose to a
[B·H, S, D_pad] fold layout (measured +6.6 ms/block on U-ViT-huge — XLA's
[B,S,H,D]→[B,H,S,128] transposes are sub-tile strided) or fall back to XLA
attention that materializes [B,H,S,S] probabilities in HBM. This kernel does
neither: it consumes q/k/v in the natural ``[B, S, H·D]`` packing the qkv
projection produces (lane dim = H·D, a lane-tile multiple), keeps every head
slice, logit tile and probability tile in VMEM, and extracts heads with
STATIC unaligned lane slices (a per-vreg relayout; the unrolled python loop
keeps every offset static). Per-site HBM traffic drops to
1R(q,k,v) + 1W(out).

Reference analogue: torch SDPA picked at import in ``uvit/uvit.py:8-17`` and
the diffusers attention processors the SD3/Flux pipelines rely on; here the
kernel-level redesign is the TPU answer to those CUDA kernels.

Numerics: logits and softmax in f32 (per-head whole-row max/exp/sum — exact
softmax, no bounded-logit shortcut), accumulation f32, output in input dtype.
Trailing alignment-padded KEYS (``kv_len``) are masked to exp(-inf)=0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["packed_attention", "packed_supports"]

_NEG_INF = -1e30
# whole-row working set: K/V resident per batch item. [S, HD] bf16 x 3
# double-buffered + f32 logits/slices must stay inside scoped VMEM. 14MB
# verified on chip at the worst accepted shape (ADM 32²: S=1024, H·D=768,
# bq=64 -> est. 13.5MB compiled and ran); the estimate is conservative
# because Mosaic elides re-fetches of the revisited whole-row K/V blocks.
import os as _os

_VMEM_BUDGET = int(_os.environ.get("DU_TPU_PACKED_VMEM", 14 * 1024 * 1024))


def _vmem_bytes(bq: int, s_kv: int, h: int, d: int) -> int:
    hd = h * d
    return (
        2 * 2 * bq * hd  # q + out blocks, double-buffered, bf16
        + 2 * 2 * 2 * s_kv * hd  # k + v blocks, double-buffered
        # f32 logits + exp + row-sum temps + bf16 probs, with ~2 unrolled
        # heads' temps live at once: a 4-byte/element charge predicted 9.7MB
        # where Mosaic actually allocated 27.03MB of stack at
        # [S=1024, H·D=384, h=6] (ADM-64 32² site) — 24 B/element matches
        # that measurement with margin and leaves every benchmarked
        # whole-row site (U-ViT S=258, ADM-128 d=192/d=256) unchanged
        + 24 * bq * s_kv
        + 3 * 4 * bq * d  # per-head slices + slack
    )


def _q_tile(s: int, s_kv: int, h: int, d: int) -> int | None:
    """Largest whole-row-or-divisor q tile that fits the VMEM budget.

    Whole-row (bq = s) needs no divisibility; smaller tiles must divide S
    exactly in 8-row multiples (the grid tiles the q sequence)."""
    if _vmem_bytes(s, s_kv, h, d) <= _VMEM_BUDGET:
        return s
    if s % 8 != 0:
        return None
    bq = s // 2
    while bq >= 64:
        if s % bq == 0 and bq % 8 == 0 and _vmem_bytes(bq, s_kv, h, d) <= _VMEM_BUDGET:
            return bq
        bq -= 8
    return None


def packed_supports(shape: tuple[int, ...], dtype, kv_seq: int | None = None) -> bool:
    """True when [B, S, H, D] self/cross attention fits this kernel: any S
    when whole-row blocks fit VMEM (full-array-dim blocks are legal, so no
    8-alignment or padding is needed), else 8-aligned S with a divisor q
    tile; d any multiple of 8 (non-lane-aligned offsets are static slices)."""
    if len(shape) != 4:
        return False
    b, s, h, d = shape
    s_kv = kv_seq if kv_seq is not None else s
    if d % 8 != 0 or d > 512:
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return _q_tile(s, s_kv, h, d) is not None


def _kernel(q_ref, k_ref, v_ref, o_ref, *, h: int, d: int, scale: float, kv_len: int | None):
    # q_ref [1, S, H*D]; k_ref/v_ref [1, S_kv, H*D]; o_ref [1, S, H*D]
    # The head loop is a STATIC python unroll so every head slice is a
    # static (if non-lane-aligned) offset: Mosaic lowers those as vreg
    # relayouts — far cheaper than the one-hot MXU selection matmuls this
    # kernel first shipped with (selections contract the full H·D axis per
    # head, a 16x FLOP blowup measured at 2.35 ms/site on U-ViT-huge).
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s, hd = q.shape
    s_kv = k.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (s, s_kv), 1)
    dot = lambda a, b_, dims: jax.lax.dot_general(
        a, b_, (dims, ((), ())), preferred_element_type=jnp.float32
    )

    for i in range(h):
        qh = q[:, i * d : (i + 1) * d]  # [S, D] static lane slice
        kh = k[:, i * d : (i + 1) * d]
        vh = v[:, i * d : (i + 1) * d]
        logits = scale * dot(qh, kh, ((1,), (1,)))  # [S, S_kv] f32
        if kv_len is not None and kv_len < s_kv:
            logits = jnp.where(col < kv_len, logits, _NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        oh = dot(p.astype(vh.dtype), vh, ((1,), (0,))) / l  # [S, D] f32
        o_ref[0, :, i * d : (i + 1) * d] = oh.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "kv_len"))
def _packed_attention(q, k, v, h: int, kv_len: int | None):
    b, s, hd = q.shape
    s_kv = k.shape[1]
    d = hd // h
    scale = 1.0 / (d**0.5)
    bq = _q_tile(s, s_kv, h, d)
    return pl.pallas_call(
        functools.partial(_kernel, h=h, d=d, scale=scale, kv_len=kv_len),
        grid=(b, s // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_kv, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_kv, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), q.dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(q, k, v)


def packed_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: int | None = None,
) -> jnp.ndarray:
    """Softmax(QKᵀ/√d)V for packed non-lane-aligned heads; returns [B,S,H,D].

    The [B,S,H,D]→[B,S,H·D] views are free reshapes (H·D stays the minor
    axis), so unlike the fold layout no data movement happens outside the
    kernel. vmap folds the mapped axis into batch (the default pallas
    batching rule would append it to every block and blow scoped VMEM —
    same rule as flash_attention/groupnorm)."""
    b, s, h, d = q.shape
    s_kv = k.shape[1]
    qf = q.reshape(b, s, h * d)
    kf = k.reshape(b, s_kv, h * d)
    vf = v.reshape(b, s_kv, h * d)

    @jax.custom_batching.custom_vmap
    def call(q_, k_, v_):
        return _packed_attention(q_, k_, v_, h=h, kv_len=kv_len)

    @call.def_vmap
    def _rule(axis_size, in_batched, q_, k_, v_):  # noqa: ANN001
        def fold(a, batched):
            if batched:
                return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
            return jnp.broadcast_to(a[None], (axis_size,) + a.shape).reshape(
                (axis_size * a.shape[0],) + a.shape[1:]
            )

        out = call(fold(q_, in_batched[0]), fold(k_, in_batched[1]), fold(v_, in_batched[2]))
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return call(qf, kf, vf).reshape(b, s, h, d)
