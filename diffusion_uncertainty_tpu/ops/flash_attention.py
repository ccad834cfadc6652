"""Blockwise (flash) attention Pallas TPU kernel.

Attention over the token sequences of the model zoo (S = 64…4096, head_dim
64…256), self- or cross- (S_q != S_kv). Logits never touch HBM — either as
one whole-row [bq, S_kv] VMEM tile (short keys, the default) or one (bq × bk)
online-softmax tile at a time (long keys) — the kernel-level analogue of
blockwise attention for this workload (SURVEY.md §5.7).

Layout: lane-aligned head dims attend straight out of the [B, S, H·D] qkv
packing (head = grid axis selecting a lane slice); other head dims fold
batch×heads into one leading grid axis and pad head_dim up to a lane multiple
(padded VALUE columns are sliced off). Trailing alignment-padded KEYS are
masked to exp(-inf)=0 via ``kv_len`` — exact softmax over the real keys.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "supports"]

_LANE = 128
_NEG_INF = -1e30


def _block_rows(n: int, cap: int) -> int:
    """Largest divisor of n that is a multiple of 8 and <= cap (n % 8 == 0).

    Sequences ride the SUBLANE dim of their blocks, so any 8-multiple block
    row count is tile-legal; the grid must tile the sequence exactly, hence
    divisors. Whole-sequence blocks (n <= cap) avoid tiling entirely."""
    if n <= cap:
        return n
    b = cap - cap % 8
    while n % b:
        b -= 8
    return b


def _plan(s: int, s_kv: int, d: int, bq_req: int, bk_req: int, whole_row: bool):
    """(bq, bk, fits): block rows for q and k/v, and whether the working set
    fits scoped VMEM. Single source of truth for supports() and the launch."""
    dp = ((d + _LANE - 1) // _LANE) * _LANE
    bq = _block_rows(s, max(bq_req, 512 if s <= 512 else bq_req))
    bk = _block_rows(s_kv, bk_req)
    # efficiency floor: a degenerate divisor (e.g. prime-ish s -> bq 8) makes
    # grid overhead dominate — report unsupported so the dispatch pads instead
    if bq < 64 and bq < s:
        return bq, bk, False
    if not whole_row and bk < 64 and bk < s_kv:
        return bq, bk, False
    vmem = (
        2 * 2 * 2 * bq * dp  # q + out blocks, double-buffered, bf16
        + 2 * 2 * 2 * s_kv * dp  # whole-S_kv K and V blocks, double-buffered
        + (6 * bq * s_kv if whole_row else 6 * bq * bk + 4 * bq * dp)  # f32 logits + bf16 p (+ f32 acc)
    )
    return bq, bk, vmem <= 12 * 1024 * 1024


def supports(shape: tuple[int, ...], dtype, kv_seq: int | None = None) -> bool:
    """True when (B, S, H, D) queries over kv_seq keys meet the kernel's
    tiling constraints (kv_seq defaults to S: self-attention).

    Any 8-aligned sequence length with a non-degenerate divisor block plan is
    accepted (no 128-alignment requirement: SD3's 1040-row joint sequence
    runs unpadded); the VMEM estimate in _plan caps resident K/V."""
    if len(shape) != 4:
        return False
    _, s, _, d = shape
    if d > 512:
        return False
    s_kv = kv_seq if kv_seq is not None else s
    for n in (s, s_kv):
        if n < 8 or n % 8 != 0:
            return False
    _, _, fits = _plan(s, s_kv, d, 256, 256, _use_whole_row(s_kv))
    if not fits:
        return False
    return dtype in (jnp.float32, jnp.bfloat16)


def _kernel_whole_row(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int | None = None):
    # q_ref [1, bq, dp]; k_ref/v_ref [1, S, dp]; o_ref [1, bq, dp]
    # K/V for the whole sequence are already VMEM-resident (the BlockSpecs
    # below load [1, S, dp]), so for the model zoo's short rows (S ≤ 2048)
    # the online-softmax block loop buys nothing and costs real VPU time:
    # per-block running max/sum cross-lane reductions plus an [bq, dp] f32
    # accumulator rescale per K block. One [bq, S] f32 logits tile (≤ 2 MB)
    # with a single max/exp/sum pass was profiled measurably faster on the
    # ADM 32² sites. Logits never touch HBM either way.
    q = q_ref[0]
    s = scale * jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, S] f32
    if kv_len is not None and kv_len < s.shape[1]:
        # alignment-padded keys: exact masking (exp(-inf) = 0 weight), so a
        # sequence padded up to the tile multiple reproduces the unpadded
        # softmax bit-for-bit over the real kv_len keys
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (acc / l).astype(o_ref.dtype)


# Whole-row kernel VMEM budget: K/V double-buffered blocks + one f32 logits
# tile must stay well inside the 16 MB scoped VMEM at the zoo's worst
# head_dim (256). S ≤ 2048 keeps the total under ~8 MB.
_WHOLE_ROW_MAX_S = 2048


def _pick_kernel(s: int, bk: int, scale: float, whole_row: bool, kv_len: int | None):
    if whole_row:
        return functools.partial(_kernel_whole_row, scale=scale, kv_len=kv_len)
    return functools.partial(_kernel, bk=bk, scale=scale, seq_len=s, kv_len=kv_len)


def _use_whole_row(s: int) -> bool:
    import os

    return s <= _WHOLE_ROW_MAX_S and os.environ.get("DU_TPU_ATTN_WHOLEROW") != "0"


def _kernel(q_ref, k_ref, v_ref, o_ref, *, bk: int, scale: float, seq_len: int, kv_len: int | None = None):
    # q_ref [1, bq, dp]; k_ref/v_ref [1, S, dp]; o_ref [1, bq, dp]
    # Matmul inputs stay in the storage dtype (bf16 for the model zoo): the
    # v5e MXU runs bf16 at ~4x its f32 rate, and an all-f32 QK'/PV pair was
    # profiled at 3.4x over the attention roofline on the ADM 32² sites.
    # Accumulation and the softmax stay f32 (preferred_element_type below).
    q = q_ref[0]
    bq, dp = q.shape
    nk = seq_len // bk

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * bk, bk), :]
        v = v_ref[0, pl.ds(i * bk, bk), :]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk] f32
        if kv_len is not None and kv_len < seq_len:
            col = i * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, dp), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    bq: int | None = None,
    bk: int = 256,
    kv_len: int | None = None,
) -> jnp.ndarray:
    """vmap-safe wrapper: the default pallas batching rule appends the mapped
    axis to every block (an M-member ensemble multiplies VMEM blocks by M);
    attention is batch-parallel so the custom rule folds [V,B,S,H,D] into the
    batch axis instead.

    ``kv_len``: number of REAL keys — trailing key/value rows past it are
    alignment padding and masked to exp(-inf)=0 weight (exact softmax over
    the first kv_len keys). Padded QUERY rows compute garbage the caller
    slices off."""

    # the whole-row choice and q-block rows are resolved here (not inside the
    # jitted fn) so the env knobs participate in the jit cache key; whole-row
    # is bounded by the KEY length (the [bq, S_kv] logits tile)
    whole_row = _use_whole_row(k.shape[1])
    import os

    if bq is None:
        bq = int(os.environ.get("DU_TPU_ATTN_BQ", 256))
    # experiment knob: let non-128-multiple head dims (ADM-128's 16² level is
    # d=192) try the transpose-free lane-slice path; Mosaic masks unaligned
    # lane blocks but the cost is unmeasured — off by default
    slice_any_d = os.environ.get("DU_TPU_ATTN_SLICE_ANY_D") == "1"

    @jax.custom_batching.custom_vmap
    def call(q_, k_, v_):
        return _flash_attention(
            q_, k_, v_, bq=bq, bk=bk, whole_row=whole_row, kv_len=kv_len,
            slice_any_d=slice_any_d,
        )

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

    return call(q, k, v)


@functools.partial(
    jax.jit, static_argnames=("bq", "bk", "whole_row", "kv_len", "slice_any_d")
)
def _flash_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    bq: int = 256,
    bk: int = 256,
    whole_row: bool = False,
    kv_len: int | None = None,
    slice_any_d: bool = False,
) -> jnp.ndarray:
    b, s, h, d = q.shape
    s_kv = k.shape[1]
    # divisor-based block plan (the q grid must tile S exactly — s=384 with a
    # blind bq=256 left rows 256-383 unwritten)
    bq, bk, _ = _plan(s, s_kv, d, bq, bk, whole_row)
    scale = 1.0 / (d**0.5)  # true head_dim, not the padded one

    if d % _LANE == 0 or (slice_any_d and d % 8 == 0):
        # Lane-aligned head_dim: attend straight out of the [B, S, H·D]
        # packing the qkv projection produces — the head axis becomes a grid
        # dimension whose block offset selects the head's lane slice, so the
        # [B,S,H,D] -> [B,H,S,D] fold transposes (6 materialized ~50MB copies
        # per 32² site) disappear entirely.
        qf = q.reshape(b, s, h * d)
        kf = k.reshape(b, s_kv, h * d)
        vf = v.reshape(b, s_kv, h * d)
        out = pl.pallas_call(
            _pick_kernel(s_kv, bk, scale, whole_row, kv_len),
            grid=(b, h, s // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda i, hh, j: (i, j, hh), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_kv, d), lambda i, hh, j: (i, 0, hh), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_kv, d), lambda i, hh, j: (i, 0, hh), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda i, hh, j: (i, j, hh), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, s, h * d), q.dtype),
            interpret=jax.devices()[0].platform != "tpu",
        )(qf, kf, vf)
        return out.reshape(b, s, h, d)

    dp = ((d + _LANE - 1) // _LANE) * _LANE

    def fold(x):
        ss = x.shape[1]
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, ss, d)
        if dp != d:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, dp - d)))
        return x

    qf, kf, vf = fold(q), fold(k), fold(v)

    out = pl.pallas_call(
        _pick_kernel(s_kv, bk, scale, whole_row, kv_len),
        grid=(b * h, s // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_kv, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_kv, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s, dp), q.dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(qf, kf, vf)

    out = out[..., :d].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))
