"""Winograd F(2×2, 3×3) convolution Pallas TPU kernel.

Direct 3×3 convolution on the MXU runs at the bf16 roofline (profiled ~193 of
197 TFLOP/s on the ADM-128 b48 forward), so the only way to make the conv
levels faster is to do fewer FLOPs: Winograd F(2,3) computes each 2×2 output
tile from a 4×4 input tile with 16 multiply-accumulates per output instead of
36 — a 2.25× reduction (Lavin & Gray, arXiv:1509.09308). The reference's
``guided_diffusion/unet_openai.py`` ResBlocks are wall-to-wall 3×3/stride-1
convs, which makes them the ~65% of forward time this kernel attacks.

**Measured verdict (v5e-1, scripts_dev/wino_microbench.py): direct conv
wins; this kernel is OPT-IN (``DU_TPU_WINOGRAD=1``).** At the ADM-128 b48
site shapes the kernel lands at 1.4–2× the in-model direct-conv roofline
(e.g. 128²×256→256: 7.6 ms at M=128 / 8.5 ms at M=64 vs 4.7 ms roofline),
and raising the MXU operand rows from 64 to 128 only bought ~10% — the MXU
pipelines the 16 tile matmuls regardless, so the real costs are the
NHWC↔HWNC transposes at the kernel boundary (~2 ms), the f32 tile
transforms on the VPU, and the kc-chunked re-streaming of x. The 2.25×
FLOP saving buys ~2.6 ms of MXU time back, which those taxes more than
consume at every level. Kept as a measured negative result + working
kernel; the dispatch gate below reproduces this verdict from a roofline
model so any future shape that genuinely clears it still routes.

Structure (all per ``pallas_call`` grid step):

* the input is viewed as ``[H, W, N, C]`` (the same free-bitcast conv-native
  view the GroupNorm kernel uses, see ``ops/groupnorm.py``) and streamed in
  ``th``-row blocks;
* the 1-row halo above/below each block is handled by PIPELINE SKEW instead of
  halo DMA: at grid step ``r`` the kernel computes output rows of block
  ``r-1`` from a persistent VMEM copy of block ``r-1`` (col-padded), the last
  row of block ``r-2``, and row 0 of the current block — so every input block
  is fetched exactly once and blocked pipelining stays fully automatic;
* input tiles are transformed in f32 (Bᵀ d B is ±sums, exact), multiplied
  against pre-transformed weights ``U = G g Gᵀ`` (bf16, fetched once per
  output-channel chunk by explicit DMA so it is not double-buffered), with
  f32 MXU accumulation, and inverse-transformed (Aᵀ M A) in f32;
* bias and an optional residual-add operand are fused into the epilogue —
  XLA fuses these into its conv, so a standalone add would eat the win.

Numerics: the only deviation from direct bf16 convolution is that the input
transform rounds ±sums of activations to bf16 before the MXU (weights round
after an exact f32 transform) — measured max|Δ| vs ``lax.conv`` is the same
order as bf16 direct-conv rounding. Falls back to XLA conv off-TPU, for
stride≠1 / non-3×3 shapes, or when tiling constraints are unmet.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_winograd", "supports"]

# row-tile height (even); t_r = _TH // 2 output tile-rows per block
_TH = int(_os.environ.get("DU_TPU_WINO_TH", 4))
# target rows of the [t_r*wc*nb, C] MXU operand; 64 balances MXU occupancy
# against the f32 transform temporaries (d alone is 64·M·C bytes)
_M_TARGET = int(_os.environ.get("DU_TPU_WINO_M", 64))
# total scoped-VMEM budget for pipeline buffers + f32 transform temporaries
# (16MB hardware scoped limit minus slop for compiler-managed values)
_VMEM_BUDGET = int(_os.environ.get("DU_TPU_WINO_VMEM", 15_000_000))
# MXU input dtype; f32 only for exactness tests (DU_TPU_WINO_MXU_F32=1)
_MXU_DTYPE = jnp.float32 if _os.environ.get("DU_TPU_WINO_MXU_F32") else jnp.bfloat16

# G for F(2x2, 3x3): U = G g G^T, 4x3
_G = np.array(
    [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
    np.float32,
)


def _tile_params(n, h, w, c, k, has_res):
    """Pick (nb, wc, kc) under the VMEM budget, or None if nothing fits.

    nb = batch slice per grid step, wc = output tile-column chunk of the
    inner loop, kc = output-channel slice. Preference: biggest kc first
    (fewest re-fetches of x), then wc aimed at M = t_r*wc*nb ≈ the MXU
    target, shrunk while the pipeline buffers PLUS the kernel's f32
    transform temporaries (d tiles + MXU accumulators, ∝ wc·nb·(c+kc))
    exceed the scoped-VMEM budget."""
    t_r = _TH // 2
    best = None
    best_score = float("inf")
    for kc in (256, 128):
        if k % kc or kc % 128:
            continue
        for nb in (8, 4):
            # Mosaic requires block dims[-2] % 8 == 0 or == the array dim
            if n % nb or (nb % 8 and nb != n):
                continue
            bpe = 2  # bf16 storage
            pipe = (
                2 * _TH * w * nb * c * bpe  # x (double-buffered)
                + 2 * _TH * w * nb * kc * bpe  # out
                + (2 * _TH * w * nb * kc * bpe if has_res else 0)
                + _TH * (w + 2) * nb * c * bpe  # prev
                + 2 * (w + 2) * nb * c * bpe  # halo + bot
                + 16 * c * kc * (4 if _MXU_DTYPE == jnp.float32 else 2)  # u
            )
            wc = max(1, _M_TARGET // (t_r * nb))
            while wc > 1 and (w // 2) % wc:
                wc //= 2
            while wc >= 1:
                if (w // 2) % wc == 0:
                    # f32 temporaries: 16 d tiles + 16 MXU accumulators,
                    # each [t_r, wc, nb, ·]
                    temp = 16 * t_r * wc * nb * (c + kc) * 4
                    if pipe + temp <= _VMEM_BUDGET:
                        m = t_r * wc * nb  # MXU operand rows
                        # roofline score (seconds-ish): MXU pays full
                        # 128-row passes for m < 128; x re-streams k//kc
                        # times; out/res stream once
                        flops = 2 * 16 * (h * w // 4) * n * c * k * max(128 / m, 1.0)
                        bytes_ = 2 * h * w * n * (c * (k // kc) + k * (2 if has_res else 1))
                        score = flops / 197e12 + bytes_ / 819e9
                        if score < best_score:
                            best, best_score = (nb, wc, kc), score
                        break
                wc //= 2
    # not worth it if direct conv's roofline beats the best tiling (e.g. a
    # row-padded MXU at tiny wc erases the 2.25x FLOP saving);
    # DU_TPU_WINO_NOGATE=1 skips the check (microbench measurement mode)
    direct = (2 * 9 * h * w * n * c * k) / 197e12 + (
        2 * h * w * n * (c + k * (2 if has_res else 1))
    ) / 819e9
    if best is not None and best_score >= direct and not _os.environ.get("DU_TPU_WINO_NOGATE"):
        return None
    return best


def supports(x_shape, w_shape, stride, dilation, has_res=False) -> bool:
    """Dispatch gate for the pallas path (NHWC x, HWIO w)."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    n, h, w, c = x_shape
    kh, kw, ci, k = w_shape
    if (kh, kw) != (3, 3) or stride != (1, 1) or dilation != (1, 1):
        return False
    if ci != c:
        return False
    if h % _TH or w % 2 or c % 128:
        return False
    return _tile_params(n, h, w, c, k, has_res) is not None


def _kernel(*refs, th, wc, n_rows_grid, w_cols, has_res):
    """Grid: (kc, nbi, r) with r in [0, R]; x block index min(r, R-1), out/res
    block index max(r-1, 0). See module docstring for the skew scheme.

    prev: [th, W+2, nb, C] col-padded copy of block r-1 (bf16)
    halo: [1, W+2, nb, C] last row of block r-2
    bot:  [1, W+2, nb, C] row 0 of the CURRENT block (zeros at the flush step)
    u_vmem: [16, C, Kc] transformed weights, DMA'd once per kc
    """
    if has_res:
        u_hbm, x_ref, bias_ref, res_ref, o_ref, prev, halo, bot, u_vmem, dma_sem = refs
    else:
        u_hbm, x_ref, bias_ref, o_ref, prev, halo, bot, u_vmem, dma_sem = refs
        res_ref = None
    kc_i = pl.program_id(0)
    nbi = pl.program_id(1)
    r = pl.program_id(2)
    R = n_rows_grid  # number of real row blocks; grid has R+1 steps

    @pl.when(jnp.logical_and(nbi == 0, r == 0))
    def _fetch_u():
        dma = pltpu.make_async_copy(u_hbm.at[kc_i], u_vmem, dma_sem)
        dma.start()
        dma.wait()

    @pl.when(r == 0)
    def _prime_edges():
        # zero everything once per (kc, nbi); interior writes below never
        # touch the col-pad edges again
        prev[...] = jnp.zeros_like(prev)
        halo[...] = jnp.zeros_like(halo)
        bot[...] = jnp.zeros_like(bot)

    # bot <- row 0 of the current block (the bottom halo row of the tile
    # computed THIS step); zeros at the flush step r == R (image bottom edge)
    @pl.when(r < R)
    def _fill_bot():
        bot[0, 1 : w_cols + 1] = x_ref[0]

    @pl.when(r == R)
    def _zero_bot():
        bot[0, 1 : w_cols + 1] = jnp.zeros_like(bot[0, 1 : w_cols + 1])

    @pl.when(r > 0)
    def _compute():
        _compute_tile(
            bias_ref, res_ref, o_ref, prev, halo, bot, u_vmem,
            th=th, wc=wc, w_cols=w_cols, has_res=has_res,
        )

    @pl.when(r < R)
    def _shift():
        # order matters: halo takes prev's last row BEFORE prev is replaced
        halo[0, 1 : w_cols + 1] = prev[th - 1, 1 : w_cols + 1]
        prev[:, 1 : w_cols + 1] = x_ref[...]


def _compute_tile(bias_ref, res_ref, o_ref, prev, halo, bot, u_vmem, *, th, wc, w_cols, has_res):
    t_r = th // 2
    nb = prev.shape[2]
    c = prev.shape[3]
    kc = u_vmem.shape[2]
    nwc = w_cols // (2 * wc)

    # bot holds row 0 of the *current* grid step's block, which is the bottom
    # halo row of the tile being computed — except at the flush step (r == R)
    # where the pipeline zeroed it (image bottom edge).
    def row_ref(l):
        # local input row l in [-1, th] of the tile being computed
        if l == -1:
            return halo, 0
        if l == th:
            return bot, 0
        return prev, l

    def body(wci, _):
        col0 = wci * 2 * wc  # padded-array col offset of this chunk

        # d[i][j]: [t_r, wc, nb, c] f32 gathers via the parity trick: a
        # contiguous [2*wc] col read reshaped to [wc, 2] splits even/odd cols
        d = [[None] * 4 for _ in range(4)]
        for i in range(4):
            rows = []
            for tr in range(t_r):
                ref, base = row_ref(2 * tr + i - 1)
                ev = ref[base, pl.ds(col0, 2 * wc)].astype(jnp.float32)
                od = ref[base, pl.ds(col0 + 2, 2 * wc)].astype(jnp.float32)
                rows.append((ev.reshape(wc, 2, nb, c), od.reshape(wc, 2, nb, c)))
            for j in range(4):
                parts = []
                for tr in range(t_r):
                    ev, od = rows[tr]
                    src = ev if j < 2 else od
                    parts.append(src[:, j % 2])
                d[i][j] = jnp.stack(parts)  # [t_r, wc, nb, c]

        # V = B^T d B (f32, exact +-sums), cast bf16 for the MXU
        a = [None] * 4
        m_acc = [[None] * 4 for _ in range(4)]
        for j in range(4):
            a[0] = d[0][j] - d[2][j]
            a[1] = d[1][j] + d[2][j]
            a[2] = d[2][j] - d[1][j]
            a[3] = d[1][j] - d[3][j]
            d[0][j], d[1][j], d[2][j], d[3][j] = a[0], a[1], a[2], a[3]
        for ai in range(4):
            v0 = d[ai][0] - d[ai][2]
            v1 = d[ai][1] + d[ai][2]
            v2 = d[ai][2] - d[ai][1]
            v3 = d[ai][1] - d[ai][3]
            for bi, v in enumerate((v0, v1, v2, v3)):
                vm = v.reshape(t_r * wc * nb, c).astype(_MXU_DTYPE)
                m_acc[ai][bi] = jax.lax.dot_general(
                    vm, u_vmem[4 * ai + bi],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [t_r*wc*nb, kc] f32

        # Y = A^T M A in f32
        s0 = [m_acc[0][b] + m_acc[1][b] + m_acc[2][b] for b in range(4)]
        s1 = [m_acc[1][b] - m_acc[2][b] - m_acc[3][b] for b in range(4)]
        y = [
            [s0[0] + s0[1] + s0[2], s0[1] - s0[2] - s0[3]],
            [s1[0] + s1[1] + s1[2], s1[1] - s1[2] - s1[3]],
        ]

        bias = bias_ref[0].astype(jnp.float32)
        # assemble [t_r, 2, wc, 2, nb, kc] -> [th, 2*wc, nb, kc]
        rows = []
        for ai in range(2):
            cols = []
            for bi in range(2):
                cols.append((y[ai][bi] + bias).reshape(t_r, wc, nb, kc))
            rows.append(jnp.stack(cols, axis=2))  # [t_r, wc, 2, nb, kc]
        out = jnp.stack(rows, axis=1)  # [t_r, 2, wc, 2, nb, kc]
        out = out.reshape(th, 2 * wc, nb, kc)
        if has_res:
            out = out + res_ref[:, pl.ds(col0, 2 * wc)].astype(jnp.float32)
        o_ref[:, pl.ds(col0, 2 * wc)] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nwc, body, 0)


def _weight_transform(w, kc):
    """[3, 3, C, K] -> [K//kc, 16, C, kc] (U = G g G^T, f32 exact)."""
    g = _G
    wf = w.astype(jnp.float32)
    u = jnp.einsum("ai,ijck,bj->abck", g, wf, g)  # [4, 4, C, K]
    c, k = w.shape[2], w.shape[3]
    u = u.reshape(16, c, k // kc, kc).transpose(2, 0, 1, 3)
    return u.astype(_MXU_DTYPE)


def _winograd_impl(x, w, b, res, has_res):
    n, h, wd, c = x.shape
    k = w.shape[3]
    nb, wc, kc = _tile_params(n, h, wd, c, k, has_res)
    nkc = k // kc
    th = _TH
    R = h // th

    u = _weight_transform(w, kc)  # [nkc, 16, c, kc]
    xv = x.transpose(1, 2, 0, 3)  # [H, W, N, C] free under conv-native layout
    bias = b.reshape(1, k)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # u, fetched manually
        pl.BlockSpec(
            (th, wd, nb, c),
            lambda kk, nn, r: (jnp.minimum(r, R - 1), 0, nn, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, kc), lambda kk, nn, r: (0, kk), memory_space=pltpu.VMEM),
    ]
    operands = [u, xv, bias]
    if has_res:
        in_specs.append(
            pl.BlockSpec(
                (th, wd, nb, kc),
                lambda kk, nn, r: (jnp.maximum(r - 1, 0), 0, nn, kk),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(res.transpose(1, 2, 0, 3))

    out = pl.pallas_call(
        functools.partial(
            _kernel, th=th, wc=wc, n_rows_grid=R, w_cols=wd, has_res=has_res,
        ),
        grid=(nkc, n // nb, R + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (th, wd, nb, kc),
            lambda kk, nn, r: (jnp.maximum(r - 1, 0), 0, nn, kk),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((h, wd, n, k), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th, wd + 2, nb, c), x.dtype),  # prev
            pltpu.VMEM((1, wd + 2, nb, c), x.dtype),  # halo
            pltpu.VMEM((1, wd + 2, nb, c), x.dtype),  # bot
            pltpu.VMEM((16, c, kc), _MXU_DTYPE),  # u
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.devices()[0].platform != "tpu",
    )(*operands)
    return out.transpose(2, 0, 1, 3)  # [N, H, W, K]


def _reference_conv(x, w, b, res):
    # f32 MXU accumulation, but the convert to the activation dtype happens
    # IMMEDIATELY so it fuses into the conv epilogue: an f32 bias/residual
    # chain makes XLA materialize f32 copies of the whole activation in HBM
    # (805MB at ADM-128 b48 per 128² site) AND breaks the free bitcast between
    # the conv's NHWC{3,0,2,1} output and the GN kernel's HWNC{3,2,1,0} view
    # (identical bytes only at identical dtype) — profiled ~10 ms/fwd on the
    # b48 loop. In f32 models every astype here is a no-op, so the reference
    # oracles (run at f32) are unchanged.
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    out = out + b.astype(out.dtype)
    if res is not None:
        out = out + res.astype(out.dtype)
    return out


def _make_vmapped(has_res):
    """custom_vmap wrapper folding mapped axes into the batch dim (the default
    pallas batching rule would multiply every VMEM block by the mapped size —
    CLAUDE rule; see ops/groupnorm.py for the same pattern)."""

    @jax.custom_batching.custom_vmap
    def call(x_, w_, b_, r_):
        return _winograd_impl(x_, w_, b_, r_, has_res)

    @call.def_vmap
    def _rule(axis_size, in_batched, x_, w_, b_, r_):  # noqa: ANN001
        xb, wb, bb, rb = in_batched
        if wb or bb or not xb or (has_res and not rb):
            raise NotImplementedError("unsupported conv3x3 batching pattern")
        x2 = x_.reshape((x_.shape[0] * x_.shape[1],) + x_.shape[2:])
        r2 = r_.reshape((r_.shape[0] * r_.shape[1],) + r_.shape[2:]) if rb else r_
        out = call(x2, w_, b_, r2)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return call


_VMAPPED = {True: _make_vmapped(True), False: _make_vmapped(False)}


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _conv3x3(x, w, b, res, has_res):
    # ``res`` is a placeholder array when has_res is False (custom_vjp and
    # custom_vmap thread it as a regular operand either way). custom_vjp is
    # the OUTER boundary so jax.grad never descends into custom_vmap.
    return _VMAPPED[has_res](x, w, b, res)


def _conv3x3_fwd(x, w, b, res, has_res):
    return _conv3x3(x, w, b, res, has_res), (x, w, b, res)


def _conv3x3_bwd(has_res, saved, g):
    """XLA-math gradients (Pallas kernels don't autodiff; the gradient-mode
    guidance differentiates through the model, ref uncertainty_guidance.py)."""
    x, w, b, res = saved

    def ref(x_, w_, b_, r_):
        out = _reference_conv(x_, w_, b_, r_ if has_res else None)
        # keep r_ in the graph so vjp returns a well-shaped cotangent
        return out if has_res else out + jnp.zeros_like(out) * jnp.sum(r_) * 0

    _, vjp = jax.vjp(ref, x, w, b, res)
    return vjp(g)


_conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_winograd(
    x: jnp.ndarray,  # [N, H, W, C]
    w: jnp.ndarray,  # [3, 3, C, K]
    b: jnp.ndarray,  # [K]
    res: Optional[jnp.ndarray] = None,  # [N, H, W, K] fused epilogue add
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """3×3 stride-1 SAME conv (+bias, + optional residual add).

    Routes to the Winograd pallas kernel when supported, else to XLA. The
    vmap rule folds mapped axes into the batch dim (the default pallas
    batching rule would multiply every VMEM block by the ensemble size M)."""
    # OPT-IN: measured slower than XLA's in-model direct conv at every ADM
    # site shape on v5e (see module docstring); flip with DU_TPU_WINOGRAD=1
    if use_pallas is None:
        use_pallas = (
            jax.devices()[0].platform == "tpu"
            and _os.environ.get("DU_TPU_WINOGRAD", "0") == "1"
        )
    if not use_pallas or not supports(x.shape, w.shape, (1, 1), (1, 1)):
        return _reference_conv(x, w, b, res)

    has_res = res is not None
    if not has_res:
        res = jnp.zeros((x.shape[0], 1), x.dtype)  # vmap-foldable placeholder
    return _conv3x3(x, w, b, res, has_res)
