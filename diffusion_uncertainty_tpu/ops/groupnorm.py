"""Fused GroupNorm(+SiLU)(+scale-shift) Pallas TPU kernel.

The ADM ResBlock's hot elementwise chain is
``GroupNorm32 -> (1+scale)·x + shift -> SiLU`` (reference
``guided_diffusion/unet_openai.py:144-258`` with ``use_scale_shift_norm``).
XLA fuses most of this already; the Pallas kernel removes the remaining HBM
round-trips by computing group statistics and applying norm+affine+SiLU in one
VMEM pass per batch item.

Group reductions keep channels on the lane dimension (group size is 8-32
channels — far below the 128-lane tile) by contracting with a static one-hot
[C, G] grouping matrix on the MXU: group sums are ``x @ M`` and the broadcast
back is ``mean_g @ Mᵀ``. Falls back to pure jnp off-TPU or when the per-batch
slab exceeds VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_norm_silu"]

# Per-program VMEM budget for the slab, in f32 bytes. The true footprint is
# ~4.5-6x the slab (double-buffered bf16 in/out blocks + f32 compute copies);
# this keeps the worst case under the 16MB scoped-vmem limit (empirically a
# 3MB slab — 32²x768ch with the fused-FMA epilogue — compiles to an 18.5MB
# scoped allocation and fails; 4MB/64²x256ch hit 17.9MB before that).
# Env overrides exist for A/B runs against a raised
# --xla_tpu_scoped_vmem_limit_kib.
import os as _os

# 128KB routes effectively EVERY GN site through the [HW,N,C] kernel — each
# step down (2MB -> 1MB -> 128KB) was a measured win on the ADM-128 b48 loop
# (47.04s -> 45.91s -> 44.87s): the layout-native two-pass kernel beats the
# whole-slab one even where the slab would fit VMEM.
_VMEM_SLAB_LIMIT = int(_os.environ.get("DU_TPU_GN_SLAB_LIMIT", 128 * 1024))
_TILE_BUDGET = int(_os.environ.get("DU_TPU_GN_TILE_BUDGET", 1536 * 1024))
# f32 compute-chunk cap inside the HWNC kernel (see _hwnc_kernel): with the
# f32 buffers bounded here, the bf16 streaming tile can grow past the old
# 1.5MB ceiling without blowing the 16MB scoped-vmem limit
_CHUNK_BUDGET = int(_os.environ.get("DU_TPU_GN_CHUNK_BUDGET", 512 * 1024))


def _reference_impl(x, gamma, beta, num_groups, eps, scale, shift, apply_silu):
    b, h, w, c = x.shape
    gs = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, gs)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if scale is not None:
        y = y * (1.0 + scale.astype(jnp.float32)) + shift.astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref, o_ref, *, num_groups, eps, apply_silu, has_ss):
    # x_ref: [1, HW, C]; gamma/beta: [1, C]; scale/shift: [1, 1, C]
    x = x_ref[0].astype(jnp.float32)
    hw, c = x.shape
    gs = c // num_groups
    n = float(hw * gs)

    # static one-hot grouping matrix [C, G]
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    m = (ch // gs == gr).astype(jnp.float32)

    s1 = jnp.sum(
        jax.lax.dot_general(x, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST),
        axis=0,
        keepdims=True,
    )  # [1, G]
    s2 = jnp.sum(
        jax.lax.dot_general(x * x, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST),
        axis=0,
        keepdims=True,
    )
    mean_g = s1 / n
    var_g = s2 / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast back to channels: [1, G] @ [G, C]
    mean_c = jax.lax.dot_general(mean_g, m.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    inv_c = jax.lax.dot_general(inv_g, m.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    # collapse norm+affine(+scale-shift) into one per-channel FMA: the slab
    # pass is VPU-bound, so per-element op count is the cost that matters
    a_c = inv_c * gamma_ref[0].astype(jnp.float32)
    b_c = beta_ref[0].astype(jnp.float32) - mean_c * a_c
    if has_ss:
        one_s = 1.0 + scale_ref[0, 0].astype(jnp.float32)
        a_c = a_c * one_s
        b_c = b_c * one_s + shift_ref[0, 0].astype(jnp.float32)
    y = x * a_c + b_c
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def group_norm_silu(
    x: jnp.ndarray,  # [B, H, W, C]
    gamma: jnp.ndarray,  # [C]
    beta: jnp.ndarray,  # [C]
    num_groups: int = 32,
    eps: float = 1e-5,
    scale: Optional[jnp.ndarray] = None,  # [B, C] or [B,1,1,C] time-conditioned
    shift: Optional[jnp.ndarray] = None,
    apply_silu: bool = True,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """GroupNorm over min(num_groups, C) groups with fused affine/scale-shift/SiLU."""
    b, h, w, c = x.shape
    num_groups = min(num_groups, c)
    has_ss = scale is not None
    if has_ss and shift is None:
        raise ValueError("scale and shift must be passed together")
    if use_pallas is None:
        import os

        use_pallas = (
            jax.devices()[0].platform == "tpu"
            and os.environ.get("DU_TPU_DISABLE_PALLAS_GN") != "1"  # end-to-end A/B switch
        )
    if not use_pallas or c % num_groups != 0 or c % 128 != 0 or (h * w) % 8 != 0:
        sc = scale.reshape(b, 1, 1, c) if has_ss else None
        sh = shift.reshape(b, 1, 1, c) if has_ss else None
        return _reference_impl(x, gamma, beta, num_groups, eps, sc, sh, apply_silu)

    scale_v = scale.reshape(b, c) if has_ss else jnp.zeros((b, c), x.dtype)
    shift_v = shift.reshape(b, c) if has_ss else jnp.zeros((b, c), x.dtype)
    return _pallas_gn(x, gamma, beta, scale_v, shift_v, num_groups, eps, apply_silu, has_ss)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _pallas_gn(x, gamma, beta, scale_v, shift_v, num_groups, eps, apply_silu, has_ss):
    """Kernel dispatch with an XLA-math VJP (Pallas kernels don't autodiff;
    the gradient-based guidance family differentiates through the model).
    scale_v/shift_v are always [B, C] (zeros when not scale-shift)."""
    import os

    b, h, w, c = x.shape
    hwnc_ok = (
        h * w * c * 4 > _VMEM_SLAB_LIMIT
        and b % 8 == 0  # N rides the sublane dim; N=1 pads 8x and blows VMEM
        and (h * w) % 8 == 0  # HWNC grid tiles HW in multiples of 8 rows
        and os.environ.get("DU_TPU_GN_HWNC", "1") != "0"
    )
    if hwnc_ok and os.environ.get("DU_TPU_GN_STATS_ONLY", "1") != "0":
        if os.environ.get("DU_TPU_GN_XLA_STATS", "1") != "0":
            # DEFAULT: moments as plain XLA reductions over (H, W, gs).
            # Unlike the Pallas stats custom call these CAN fuse into the
            # producing conv's epilogue, and they impose no [HW,N,C]-view
            # layout demand — ADM-128 b48 device forward measured 183.5
            # (Pallas stats kernels + 19.3 ms of dual-layout bitcast_add
            # fusions) -> 167.4 ms with this path. The older full-XLA GN
            # loss (0.631 vs 0.847 imgs/s, r1) was the f32 NORMALIZE chain
            # materializing twice-width copies, not the stats — stats-only
            # XLA + the bf16 FMA epilogue below keeps the win from both
            # worlds. DU_TPU_GN_XLA_STATS=0 restores the Pallas stats kernel
            gs = c // num_groups
            xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, gs)
            s1 = jnp.mean(xf, axis=(1, 3))  # [B, G]
            s2 = jnp.mean(xf * xf, axis=(1, 3))
            inv_g = jax.lax.rsqrt(s2 - s1 * s1 + eps)  # [B, G]
            gam = gamma.astype(jnp.float32).reshape(num_groups, gs)
            a_ng = inv_g[:, :, None] * gam  # [B, G, gs]
            b_ng = beta.astype(jnp.float32).reshape(num_groups, gs) - s1[:, :, None] * a_ng
            a_nc = a_ng.reshape(b, c)
            b_nc = b_ng.reshape(b, c)
            if has_ss:
                one_s = 1.0 + scale_v.astype(jnp.float32)
                a_nc = a_nc * one_s
                b_nc = b_nc * one_s + shift_v.astype(jnp.float32)
        else:
            # 1R stats kernel + consumer-fused normalize (see _stats_kernel)
            xv = x.transpose(1, 2, 0, 3).reshape(h * w, b, c)
            a_nc, b_nc = _gn_stats_hwnc(
                xv, gamma.reshape(1, c), beta.reshape(1, c), scale_v, shift_v,
                num_groups, eps, has_ss,
            )
        # FMA in the input dtype: an f32 normalize chain makes XLA materialize
        # 2x-byte f32 intermediates in HBM (profiled +14 ms/fwd on ADM-128
        # b48); in-model activations are bf16 and one extra bf16 rounding of
        # the affine coefficients is below the model's own storage rounding
        a_c = a_nc.astype(x.dtype)[:, None, None, :]
        b_c = b_nc.astype(x.dtype)[:, None, None, :]
        y = x * a_c + b_c
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        return y.astype(x.dtype)
    if hwnc_ok:
        # Layout-native path for the big UNet levels: view the tensor as
        # [HW, N, C]. Convs on these levels produce NHWC arrays with layout
        # {3,0,2,1} (C minor, then N) — physically identical to a row-major
        # [H, W, N, C] array — so this transpose is a free bitcast and the
        # kernel reads/writes the conv-native layout directly, eliding the
        # 256MB re-tiling copies the [B, HW, C] view forced (profiled at
        # ~13 ms/forward on the ADM-128 b32 loop).
        xv = x.transpose(1, 2, 0, 3).reshape(h * w, b, c)
        out = _fused_gn_hwnc(
            xv, gamma.reshape(1, c), beta.reshape(1, c), scale_v, shift_v,
            num_groups, eps, apply_silu, has_ss,
        )
        return out.reshape(h, w, b, c).transpose(2, 0, 1, 3)

    xg = x.reshape(b, h * w, c)
    out = _fused_gn(
        xg, gamma.reshape(1, c), beta.reshape(1, c),
        scale_v.reshape(b, 1, c), shift_v.reshape(b, 1, c),
        num_groups, eps, apply_silu, has_ss,
    )
    return out.reshape(b, h, w, c)


def _pallas_gn_fwd(x, gamma, beta, scale_v, shift_v, num_groups, eps, apply_silu, has_ss):
    out = _pallas_gn(x, gamma, beta, scale_v, shift_v, num_groups, eps, apply_silu, has_ss)
    return out, (x, gamma, beta, scale_v, shift_v)


def _pallas_gn_bwd(num_groups, eps, apply_silu, has_ss, res, g):
    x, gamma, beta, scale_v, shift_v = res
    b, h, w, c = x.shape

    def ref(x_, ga, be, sc, sh):
        # zeros scale/shift are an exact identity, so one formula serves both
        return _reference_impl(
            x_, ga, be, num_groups, eps,
            sc.reshape(b, 1, 1, c), sh.reshape(b, 1, 1, c), apply_silu,
        )

    _, vjp = jax.vjp(ref, x, gamma, beta, scale_v, shift_v)
    return vjp(g)


_pallas_gn.defvjp(_pallas_gn_fwd, _pallas_gn_bwd)


def _fused_gn_impl(xg, gamma_g, beta_g, scale_g, shift_g, num_groups, eps, apply_silu, has_ss):
    b, hw, c = xg.shape
    if hw * c * 4 > _VMEM_SLAB_LIMIT:
        return _fused_gn_tiled(
            xg, gamma_g, beta_g, scale_g, shift_g, num_groups, eps, apply_silu, has_ss
        )
    return pl.pallas_call(
        functools.partial(
            _kernel, num_groups=num_groups, eps=eps, apply_silu=apply_silu, has_ss=has_ss
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xg.shape, xg.dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(xg, gamma_g, beta_g, scale_g, shift_g)


def _fused_gn(xg, gamma_g, beta_g, scale_g, shift_g, num_groups, eps, apply_silu, has_ss):
    """Pallas GN with a vmap rule that folds the mapped axis into the batch
    grid. The default pallas batching rule appends the vmapped axis to every
    BLOCK — an M-member ensemble multiplies the VMEM block by M and OOMs the
    16MB scoped vmem (observed at M=5, 64² x 256ch). GroupNorm is
    batch-parallel, so folding [V,B,HW,C] -> [V*B,HW,C] is exact."""

    @jax.custom_batching.custom_vmap
    def fused(x, g, bta, sc, sh):
        return _fused_gn_impl(x, g, bta, sc, sh, num_groups, eps, apply_silu, has_ss)

    @fused.def_vmap
    def _rule(axis_size, in_batched, x, g, bta, sc, sh):  # noqa: ANN001
        xb, gb, bb, scb, shb = in_batched
        if gb or bb or not xb:
            # per-member affine params never happen in this zoo; bail to jnp
            raise NotImplementedError("unsupported GN batching pattern")

        def fold(a, batched):
            if batched:
                return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
            return jnp.broadcast_to(a[None], (axis_size,) + a.shape).reshape(
                (axis_size * a.shape[0],) + a.shape[1:]
            )

        x2 = fold(x, True)
        sc2 = fold(sc, scb)
        sh2 = fold(sh, shb)
        out = fused(x2, g, bta, sc2, sh2)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return fused(xg, gamma_g, beta_g, scale_g, shift_g)


def _hwnc_kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref, o_ref, acc1, acc2, *, num_groups, eps, apply_silu, has_ss, n_rows, chunk):
    """Two-pass GN over an [HW, N, C] view, all batches per grid step.

    Phase 0 accumulates per-(N, C) sum/sum² over HW tiles into VMEM scratch;
    the first phase-1 step converts them into the per-(N, C) affine
    A = inv·γ·(1+s), B = (β − mean·inv·γ)·(1+s)+t — so the per-element work in
    phase 1 collapses to one fused multiply-add (+SiLU), ~40% fewer VPU ops
    than normalizing with mean/inv/γ/β separately (the big levels are
    VPU-bound, not HBM-bound).

    Both phases walk the tile in ``chunk``-row slices so the f32 temporaries
    never exceed ~chunk·N·C·4 bytes: the f32 copies of a whole tile were what
    capped the bf16 tile at 1.5MB under the 16MB scoped-vmem limit (a 2MB
    tile compiled to a 19.1MB scoped allocation). Chunking decouples tile
    size (HBM streaming efficiency) from compute-buffer size."""
    phase = pl.program_id(0)
    it = pl.program_id(1)
    tile, n, c = x_ref.shape
    gs = c // num_groups
    nch = tile // chunk

    @pl.when(jnp.logical_and(phase == 0, it == 0))
    def _():
        acc1[...] = jnp.zeros_like(acc1)
        acc2[...] = jnp.zeros_like(acc2)

    @pl.when(phase == 0)
    def _():
        def body(i, _):
            xc = x_ref[pl.ds(i * chunk, chunk)].astype(jnp.float32)
            acc1[...] += jnp.sum(xc, axis=0)
            acc2[...] += jnp.sum(xc * xc, axis=0)
            return 0

        jax.lax.fori_loop(0, nch, body, 0)

    @pl.when(jnp.logical_and(phase == 1, it == 0))
    def _():
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        m = (ch // gs == gr).astype(jnp.float32)
        cnt = float(n_rows * gs)
        dot = lambda a, bm: jax.lax.dot_general(
            a, bm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        s1 = dot(acc1[...], m)  # [N, G]
        s2 = dot(acc2[...], m)
        mean_g = s1 / cnt
        var_g = s2 / cnt - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        mean_c = dot(mean_g, m.T)  # [N, C]
        inv_c = dot(inv_g, m.T)
        gam = gamma_ref[0].astype(jnp.float32)[None, :]
        bet = beta_ref[0].astype(jnp.float32)[None, :]
        a_nc = inv_c * gam
        b_nc = bet - mean_c * a_nc
        if has_ss:
            one_s = 1.0 + scale_ref[...].astype(jnp.float32)
            a_nc = a_nc * one_s
            b_nc = b_nc * one_s + shift_ref[...].astype(jnp.float32)
        acc1[...] = a_nc
        acc2[...] = b_nc

    @pl.when(phase == 1)
    def _():
        a_nc = acc1[...][None]
        b_nc = acc2[...][None]

        def body(i, _):
            xc = x_ref[pl.ds(i * chunk, chunk)].astype(jnp.float32)
            y = xc * a_nc + b_nc
            if apply_silu:
                y = y * jax.nn.sigmoid(y)
            o_ref[pl.ds(i * chunk, chunk)] = y.astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, nch, body, 0)


def _fused_gn_hwnc_impl(xv, gamma_g, beta_g, scale_v, shift_v, num_groups, eps, apply_silu, has_ss):
    hw, n, c = xv.shape
    # largest power-of-two row tile that divides HW and keeps the bf16 block
    # (double-buffered in+out) inside scoped VMEM. Bigger tiles matter: at
    # 768KB blocks the 128² GN ran grid-overhead-bound at ~385GB/s effective
    tile = 8
    while tile * 2 <= hw and hw % (tile * 2) == 0 and tile * 2 * n * c * 2 <= _TILE_BUDGET:
        tile *= 2
    nt = hw // tile
    # f32 compute-chunk rows: bounds the kernel's f32 temporaries independently
    # of the streaming tile (see _hwnc_kernel docstring)
    chunk = tile
    while chunk > 1 and chunk % 2 == 0 and chunk * n * c * 4 > _CHUNK_BUDGET:
        chunk //= 2
    return pl.pallas_call(
        functools.partial(
            _hwnc_kernel, num_groups=num_groups, eps=eps, apply_silu=apply_silu,
            has_ss=has_ss, n_rows=hw, chunk=chunk,
        ),
        grid=(2, nt),
        in_specs=[
            pl.BlockSpec((tile, n, c), lambda p, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda p, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        # phase 0 routes every program onto output tile 0 (writes elided in
        # the kernel body): streamed traffic is 2R + 1W
        out_specs=pl.BlockSpec((tile, n, c), lambda p, j: (j * p, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xv.shape, xv.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, c), jnp.float32),
            pltpu.VMEM((n, c), jnp.float32),
        ],
        interpret=jax.devices()[0].platform != "tpu",
    )(xv, gamma_g, beta_g, scale_v, shift_v)


def _fused_gn_hwnc(xv, gamma_g, beta_g, scale_v, shift_v, num_groups, eps, apply_silu, has_ss):
    """HWNC-view GN with a vmap rule folding the mapped axis into N (exact:
    group statistics are per-(N, C), so extra leading members are just more
    rows of N)."""

    @jax.custom_batching.custom_vmap
    def fused(x, g, bta, sc, sh):
        return _fused_gn_hwnc_impl(x, g, bta, sc, sh, num_groups, eps, apply_silu, has_ss)

    @fused.def_vmap
    def _rule(axis_size, in_batched, x, g, bta, sc, sh):  # noqa: ANN001
        xb, gb, bb, scb, shb = in_batched
        if gb or bb or not xb:
            raise NotImplementedError("unsupported GN batching pattern")
        hw = x.shape[1]

        def fold_nc(a, batched):  # [V?, N, C] -> [V*N, C]
            if batched:
                return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
            return jnp.broadcast_to(a[None], (axis_size,) + a.shape).reshape(
                (axis_size * a.shape[0],) + a.shape[1:]
            )

        x2 = jnp.moveaxis(x, 0, 1).reshape(hw, -1, x.shape[-1])
        out = fused(x2, g, bta, fold_nc(sc, scb), fold_nc(sh, shb))
        out = out.reshape(hw, axis_size, -1, out.shape[-1])
        return jnp.moveaxis(out, 1, 0), True

    return fused(xv, gamma_g, beta_g, scale_v, shift_v)


def _stats_kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref, a_ref, b_ref, acc1, acc2, *, num_groups, eps, has_ss, n_rows, chunk, nt):
    """Stats-only pass over the [HW, N, C] view: ONE streamed read of x,
    emitting the per-(N, C) fused-affine coefficients A/B of the HWNC kernel
    (A = inv·γ·(1+s), B = (β − mean·inv·γ)·(1+s)+t). The normalize+SiLU is
    then plain XLA elementwise in the caller, which fuses into the consuming
    convolution's input read — the conv is MXU-bound at these shapes, so the
    per-element FMA+SiLU rides under the matmul time and the 1R+1W the
    two-pass kernel spent materializing the normalized tensor disappears."""
    it = pl.program_id(0)
    tile, n, c = x_ref.shape
    gs = c // num_groups
    nch = tile // chunk

    @pl.when(it == 0)
    def _():
        acc1[...] = jnp.zeros_like(acc1)
        acc2[...] = jnp.zeros_like(acc2)

    def body(i, _):
        xc = x_ref[pl.ds(i * chunk, chunk)].astype(jnp.float32)
        acc1[...] += jnp.sum(xc, axis=0)
        acc2[...] += jnp.sum(xc * xc, axis=0)
        return 0

    jax.lax.fori_loop(0, nch, body, 0)

    @pl.when(it == nt - 1)
    def _():
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        m = (ch // gs == gr).astype(jnp.float32)
        cnt = float(n_rows * gs)
        dot = lambda a, bm: jax.lax.dot_general(
            a, bm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        s1 = dot(acc1[...], m)  # [N, G]
        s2 = dot(acc2[...], m)
        mean_g = s1 / cnt
        var_g = s2 / cnt - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        mean_c = dot(mean_g, m.T)  # [N, C]
        inv_c = dot(inv_g, m.T)
        gam = gamma_ref[0].astype(jnp.float32)[None, :]
        bet = beta_ref[0].astype(jnp.float32)[None, :]
        a_nc = inv_c * gam
        b_nc = bet - mean_c * a_nc
        if has_ss:
            one_s = 1.0 + scale_ref[...].astype(jnp.float32)
            a_nc = a_nc * one_s
            b_nc = b_nc * one_s + shift_ref[...].astype(jnp.float32)
        a_ref[...] = a_nc
        b_ref[...] = b_nc


def _gn_stats_hwnc_impl(xv, gamma_g, beta_g, scale_v, shift_v, num_groups, eps, has_ss):
    hw, n, c = xv.shape
    tile = 8
    while tile * 2 <= hw and hw % (tile * 2) == 0 and tile * 2 * n * c * 2 <= _TILE_BUDGET:
        tile *= 2
    nt = hw // tile
    chunk = tile
    while chunk > 1 and chunk % 2 == 0 and chunk * n * c * 4 > _CHUNK_BUDGET:
        chunk //= 2
    return pl.pallas_call(
        functools.partial(
            _stats_kernel, num_groups=num_groups, eps=eps, has_ss=has_ss,
            n_rows=hw, chunk=chunk, nt=nt,
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((tile, n, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), jnp.float32),
            jax.ShapeDtypeStruct((n, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, c), jnp.float32),
            pltpu.VMEM((n, c), jnp.float32),
        ],
        interpret=jax.devices()[0].platform != "tpu",
    )(xv, gamma_g, beta_g, scale_v, shift_v)


def _gn_stats_hwnc(xv, gamma_g, beta_g, scale_v, shift_v, num_groups, eps, has_ss):
    """HWNC-view GN stats with the same fold-into-N vmap rule as the full
    kernel (statistics are per-(N, C); extra mapped members are more N rows)."""

    @jax.custom_batching.custom_vmap
    def stats(x, g, bta, sc, sh):
        return _gn_stats_hwnc_impl(x, g, bta, sc, sh, num_groups, eps, has_ss)

    @stats.def_vmap
    def _rule(axis_size, in_batched, x, g, bta, sc, sh):  # noqa: ANN001
        xb, gb, bb, scb, shb = in_batched
        if gb or bb or not xb:
            raise NotImplementedError("unsupported GN batching pattern")
        hw = x.shape[1]

        def fold_nc(a, batched):  # [V?, N, C] -> [V*N, C]
            if batched:
                return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
            return jnp.broadcast_to(a[None], (axis_size,) + a.shape).reshape(
                (axis_size * a.shape[0],) + a.shape[1:]
            )

        x2 = jnp.moveaxis(x, 0, 1).reshape(hw, -1, x.shape[-1])
        a_nc, b_nc = stats(x2, g, bta, fold_nc(sc, scb), fold_nc(sh, shb))
        a_nc = a_nc.reshape(axis_size, -1, a_nc.shape[-1])
        b_nc = b_nc.reshape(axis_size, -1, b_nc.shape[-1])
        return (a_nc, b_nc), (True, True)

    return stats(xv, gamma_g, beta_g, scale_v, shift_v)


def _tiled_kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref, o_ref, acc1, acc2, *, num_groups, eps, apply_silu, has_ss, n_rows):
    """Two-pass tiled GN: phase 0 accumulates per-channel sums over HW tiles
    into persistent VMEM scratch; phase 1 converts them to group statistics
    (one-hot matmul) and normalizes each tile. Grid (b, 2, n_tiles) iterates
    sequentially on the core, so the scratch carries across tiles/phases."""
    phase = pl.program_id(1)
    it = pl.program_id(2)
    x = x_ref[0].astype(jnp.float32)  # [tile, C]
    tile, c = x.shape
    gs = c // num_groups

    @pl.when(jnp.logical_and(phase == 0, it == 0))
    def _():
        acc1[...] = jnp.zeros_like(acc1)
        acc2[...] = jnp.zeros_like(acc2)

    @pl.when(phase == 0)
    def _():
        acc1[0, :] += jnp.sum(x, axis=0)
        acc2[0, :] += jnp.sum(x * x, axis=0)
        # no output write: the out BlockSpec routes every phase-0 program to
        # tile 0, whose garbage is overwritten when phase 1 visits tile 0

    @pl.when(phase == 1)
    def _():
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        m = (ch // gs == gr).astype(jnp.float32)
        n = float(n_rows * gs)
        s1 = jax.lax.dot_general(acc1[...], m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        s2 = jax.lax.dot_general(acc2[...], m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        mean_g = s1 / n
        var_g = s2 / n - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        mean_c = jax.lax.dot_general(mean_g, m.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        inv_c = jax.lax.dot_general(inv_g, m.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        y = (x - mean_c) * inv_c
        y = y * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
        if has_ss:
            y = y * (1.0 + scale_ref[0, 0].astype(jnp.float32)) + shift_ref[0, 0].astype(jnp.float32)
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


def _fused_gn_tiled(xg, gamma_g, beta_g, scale_g, shift_g, num_groups, eps, apply_silu, has_ss):
    """Tiled variant for slabs too large for a single VMEM block (the 128²/64²
    UNet levels): streams HW tiles twice (stats pass + normalize pass) with
    per-channel f32 accumulators in persistent scratch."""
    b, hw, c = xg.shape
    # pick the largest 8-multiple tile that keeps ~4 buffered copies < limit
    tile = max(8, min(hw, (_VMEM_SLAB_LIMIT // 2) // (c * 4) // 8 * 8))
    while hw % tile != 0:
        tile -= 8
    nt = hw // tile

    return pl.pallas_call(
        functools.partial(
            _tiled_kernel, num_groups=num_groups, eps=eps, apply_silu=apply_silu,
            has_ss=has_ss, n_rows=hw,
        ),
        grid=(b, 2, nt),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, p, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, p, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, p, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        # phase 0 maps all programs onto output tile 0 (writes elided in the
        # kernel), so the streamed traffic is 2R + 1W instead of 2R + 2W
        out_specs=pl.BlockSpec(
            (1, tile, c), lambda i, p, j: (i, j * p, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(xg.shape, xg.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=jax.devices()[0].platform != "tpu",
    )(xg, gamma_g, beta_g, scale_g, shift_g)
