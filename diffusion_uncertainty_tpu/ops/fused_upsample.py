"""Fused nearest-2x-upsample + 3x3 conv (sub-pixel phase decomposition).

The ADM decoder's hot pattern is ``h = conv3x3(nearest_upsample_2x(h))``
(reference ``guided_diffusion/unet_openai.py`` Upsample and the
``resblock_updown`` up-ResBlocks). Evaluating the 3x3 conv at the doubled
resolution costs 36·HW·C·K MACs and — worse on TPU — materializes the
upsampled tensor in HBM, which XLA lowers as a broadcast PLUS a physical
re-tiling copy (~2 ms per 128² decoder site on the ADM-128 b48 loop,
profiled).

Over a nearest-upsampled input every output phase (a, b) ∈ {0,1}² only sees a
2×2 window of ORIGINAL pixels: for output row p = 2i+a the 3x3 taps read
upsampled rows p-1, p, p+1 → original rows {i-1, i} (a=0, weights
[w0, w1+w2]) or {i, i+1} (a=1, weights [w0+w1, w2]), and likewise for
columns. So the whole op is FOUR 2x2 convs at the LOW resolution —
16·HW·C·K MACs (2.25× fewer) and no upsampled intermediate — followed by a
phase interleave. Zero padding of the phase convs reproduces the SAME
padding of the direct form exactly (upsampled border rows map to the same
padded original rows).

Pure XLA (no Pallas): autodiff and vmap work natively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["conv3x3_nearest_up2", "upsample2_conv1x1"]


def _phase_kernel(w: jnp.ndarray, a: int, b: int) -> jnp.ndarray:
    """[3,3,C,K] -> the [2,2,C,K] effective kernel of output phase (a, b)."""
    rows = (w[0], w[1] + w[2]) if a == 0 else (w[0] + w[1], w[2])
    u = jnp.stack(rows)  # [2, 3, C, K]
    cols = (u[:, 0], u[:, 1] + u[:, 2]) if b == 0 else (u[:, 0] + u[:, 1], u[:, 2])
    return jnp.stack(cols, axis=1)  # [2, 2, C, K]


def conv3x3_nearest_up2(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``conv3x3_SAME(nearest_upsample_2x(x), w) + b`` without ever forming
    the upsampled tensor.

    x: [N, H, W, C]; w: [3, 3, C, K]; b: [K]  ->  [N, 2H, 2W, K]
    """
    n, h, wd, _ = x.shape
    k = w.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")
    phases = []
    for a in (0, 1):
        row = []
        for bb in (0, 1):
            # phase (a, bb) reads original rows {i-1+a, i+a} / cols {j-1+bb, j+bb}
            y = jax.lax.conv_general_dilated(
                x,
                _phase_kernel(w, a, bb),
                window_strides=(1, 1),
                padding=((1 - a, a), (1 - bb, bb)),
                dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            # bias rides each phase conv's convert epilogue (it commutes with
            # the interleave); adding it AFTER the interleave was a separate
            # broadcast_add pass over the full-res tensor (~1.9 ms/fwd on
            # ADM-128 b48 across the 4 decoder upsample sites)
            row.append((y + b.astype(jnp.float32)).astype(x.dtype))
        phases.append(row)
    # interleave: out[:, 2i+a, 2j+bb] = phases[a][bb][:, i, j].
    # (An interior-pad+add interleave was A/B'd on chip and LOST — XLA does
    # not fuse interior pads; the pad bucket grew to 17.8 ms/fwd. The Pallas
    # kernel below writes the conv-native layout directly; its XLA fallback
    # is the stack+transpose, which costs one re-tiling copy.)
    del n, h, wd, k
    return interleave_phases_2x(phases[0][0], phases[0][1], phases[1][0], phases[1][1])


def upsample2_conv1x1(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``conv1x1(nearest_upsample_2x(x), w) + b`` == upsample(conv1x1(x)):
    a 1x1 conv commutes with nearest upsampling, so run it at the LOW
    resolution (4× fewer MACs) and upsample the result."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y + b.astype(y.dtype)
    return nearest_upsample_2x(y)


# ---------------------------------------------------------------------------
# Pallas phase-interleave / nearest-upsample writing the conv-native layout
# ---------------------------------------------------------------------------
#
# XLA materializes a re-tiling copy both for the phase interleave above
# (stack+transpose, ~1.2 ms at the 128² ADM b48 site) and for the skip-path
# nearest_upsample (broadcast+copy, ~2 ms). Both are pure row/col placements
# in the conv-native [H, W, N, C] view (the transpose from NHWC{3,0,2,1} is a
# bitcast), so one Pallas kernel can write the final layout directly:
# out[2i+a, 2j+b] = y_ab[i, j] with the duplications/interleavings done on
# the OUTER dims of VMEM blocks (N, C stay minor).

import functools as _functools
import os as _os

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ILV_BLOCK = int(_os.environ.get("DU_TPU_ILV_BLOCK", 512 * 1024))  # bf16 bytes per in-phase block


def _ilv_kernel(y00, y01, y10, y11, o):
    # y_ab: [th, tw, n, c]; o: [2*th, 2*tw, n, c]
    th, wd, n, c = y00.shape
    row0 = jnp.stack([y00[...], y01[...]], axis=2).reshape(th, 2 * wd, n, c)
    row1 = jnp.stack([y10[...], y11[...]], axis=2).reshape(th, 2 * wd, n, c)
    o[...] = jnp.stack([row0, row1], axis=1).reshape(2 * th, 2 * wd, n, c)


def _ilv_plan(h, wd, n, c, itemsize):
    """Pick (th, tw, kc) so one input phase block fits the budget.

    _ILV_BLOCK is the soft target steering kc/th. The HARD cap is 1.75× that
    (896KB at the default): 4 in-blocks + the 4× out-block, ALL
    double-buffered by the Mosaic pipeline, total 16 block-equivalents
    ≤ 14MB under the 16MB scoped VMEM. (The first cut capped at 1.75MB
    assuming single-buffered blocks; the vmapped CIFAR-10 ensemble site
    [4,4,2560,256] then compiled to 20.00M of scoped stack and was
    rejected by the relay.) Every benchmarked ADM-128 b48 site plans
    whole-row blocks of ≤786KB, below this cap, so its tiling — and the
    measured headline — is unchanged; only genuinely oversized W*N sites
    get W-tiled (or, if even tw=1 busts the cap, return None and let the
    caller fall back to the XLA stack+reshape instead of OOMing)."""
    kc = 128
    for d in range(c, 127, -128):
        if c % d == 0 and wd * n * d * itemsize <= _ILV_BLOCK:
            kc = d
            break
    hard = int(1.75 * _ILV_BLOCK)
    tw = wd  # W-dim tile: whole rows when under the hard cap, halved otherwise
    while tw * n * kc * itemsize > hard and tw % 2 == 0:
        tw //= 2
    if tw * n * kc * itemsize > hard:
        return None
    th = 1
    while th * 2 <= h and h % (th * 2) == 0 and 2 * th * tw * n * kc * itemsize <= _ILV_BLOCK:
        th *= 2
    return th, tw, kc


def _interleave_hwnc_impl(y00, y01, y10, y11):
    h, wd, n, c = y00.shape
    plan = _ilv_plan(h, wd, n, c, y00.dtype.itemsize)
    if plan is None:
        # oversized W*N site: XLA fallback (one re-tiling copy, but no OOM)
        row0 = jnp.stack([y00, y01], axis=2).reshape(h, 2 * wd, n, c)
        row1 = jnp.stack([y10, y11], axis=2).reshape(h, 2 * wd, n, c)
        return jnp.stack([row0, row1], axis=1).reshape(2 * h, 2 * wd, n, c)
    th, tw, kc = plan
    grid = (h // th, wd // tw, c // kc)
    spec_in = pl.BlockSpec(
        (th, tw, n, kc), lambda i, j, k: (i, j, 0, k), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _ilv_kernel,
        grid=grid,
        in_specs=[spec_in] * 4,
        out_specs=pl.BlockSpec(
            (2 * th, 2 * tw, n, kc), lambda i, j, k: (i, j, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * h, 2 * wd, n, c), y00.dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(y00, y01, y10, y11)


@_functools.partial(jax.custom_vjp, nondiff_argnums=())
def _interleave_nhwc(y00, y01, y10, y11):
    """[N,H,W,C] x4 -> [N,2H,2W,C] with out[:, 2i+a, 2j+b] = y_ab[:, i, j],
    written in the conv-native layout (both transposes are bitcasts)."""

    @jax.custom_batching.custom_vmap
    def call(a, b, cc, d):
        vs = [v.transpose(1, 2, 0, 3) for v in (a, b, cc, d)]
        out = _interleave_hwnc_impl(*vs)
        return out.transpose(2, 0, 1, 3)

    @call.def_vmap
    def _rule(axis_size, in_batched, a, b, cc, d):  # noqa: ANN001
        if not all(in_batched):
            raise NotImplementedError("interleave vmap needs all operands mapped")
        fold = lambda v: v.reshape((v.shape[0] * v.shape[1],) + v.shape[2:])
        out = call(fold(a), fold(b), fold(cc), fold(d))
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return call(y00, y01, y10, y11)


def _interleave_nhwc_fwd(y00, y01, y10, y11):
    return _interleave_nhwc(y00, y01, y10, y11), None


def _interleave_nhwc_bwd(_, g):
    return (g[:, 0::2, 0::2], g[:, 0::2, 1::2], g[:, 1::2, 0::2], g[:, 1::2, 1::2])


_interleave_nhwc.defvjp(_interleave_nhwc_fwd, _interleave_nhwc_bwd)


def interleave_phases_2x(y00, y01, y10, y11, use_pallas: bool | None = None):
    """Phase interleave; Pallas on TPU, stack+transpose fallback elsewhere."""
    if use_pallas is None:
        use_pallas = (
            jax.devices()[0].platform == "tpu"
            and _os.environ.get("DU_TPU_PALLAS_ILV", "1") != "0"
            and y00.shape[0] % 8 == 0  # N rides the sublane dim
            and y00.shape[-1] % 128 == 0
        )
    if use_pallas:
        return _interleave_nhwc(y00, y01, y10, y11)
    n, h, wd, k = y00.shape
    ys = jnp.stack([jnp.stack([y00, y01]), jnp.stack([y10, y11])])
    return ys.transpose(2, 3, 0, 4, 1, 5).reshape(n, 2 * h, 2 * wd, k)


def nearest_upsample_2x(x: jnp.ndarray, use_pallas: bool | None = None) -> jnp.ndarray:
    """Nearest-2x upsample == interleaving four copies of x; the Pallas path
    writes the conv-native layout directly (the XLA broadcast+reshape lowers
    to a broadcast PLUS a ~2 ms re-tiling copy at the 128² ADM b48 site)."""
    if use_pallas is None:
        use_pallas = (
            jax.devices()[0].platform == "tpu"
            and _os.environ.get("DU_TPU_PALLAS_ILV", "1") != "0"
            and x.shape[0] % 8 == 0
            and x.shape[-1] % 128 == 0
        )
    if use_pallas:
        return _interleave_nhwc(x, x, x, x)
    from ..models.layers import nearest_upsample

    return nearest_upsample(x)
