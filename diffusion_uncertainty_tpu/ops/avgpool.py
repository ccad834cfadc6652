"""Layout-native 2×2 average-pool Pallas TPU kernel.

ADM's non-conv Downsample (reference ``guided_diffusion/unet_openai.py``
``Downsample`` with ``use_conv=False`` → ``F.avg_pool2d``). The XLA
formulations all lose on the conv-native activation layout: reduce_window
ran ~4× its streaming ideal; the 6D-reshape slice-add form needs a
{5,0,4,3,2,1}→{5,0,3,1,4,2} relayout copy of the whole level (2×1.23 ms/fwd
at 128² on ADM-128 b48); 4D strided slices fuse into downstream consumers as
uncoalesced scans (+2.5 ms/fwd whole-model). This kernel reads the
[H, W, N, C] view — a free bitcast of the NHWC conv output layout {3,0,2,1},
same trick as ops/groupnorm.py — and writes the pooled tensor in the same
conv-native layout: 1R + ¼W, the streaming floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["avg_pool_2x2"]

# bf16 input block bytes (double-buffered pairs live alongside the output)
_BLOCK_BUDGET = 2 * 1024 * 1024


def _kernel(x_ref, o_ref, *, tw: int):
    # x_ref [2, 2*tw, N, C]; o_ref [1, tw, N, C]. Static unrolled W loop of
    # 2D [N, C] slices — a >2D strided slice lowers to a gather Mosaic
    # rejects ("Only 2D gather is supported")
    for j in range(tw):
        s = (
            x_ref[0, 2 * j].astype(jnp.float32)
            + x_ref[0, 2 * j + 1].astype(jnp.float32)
            + x_ref[1, 2 * j].astype(jnp.float32)
            + x_ref[1, 2 * j + 1].astype(jnp.float32)
        )
        o_ref[0, j] = (s * 0.25).astype(o_ref.dtype)


def _supported(h: int, w: int, n: int, c: int, dtype) -> bool:
    return (
        h % 2 == 0
        and w % 2 == 0
        and n % 8 == 0  # N rides the sublane dim of the (N, C) tile
        and c % 128 == 0
        and dtype in (jnp.float32, jnp.bfloat16)
    )


def _tw(w: int, n: int, c: int, itemsize: int) -> int:
    tw = w // 2
    while tw > 1 and tw % 2 == 0 and 2 * 2 * tw * n * c * itemsize > _BLOCK_BUDGET:
        tw //= 2
    return tw


@jax.jit
def _pool_hwnc(xv):
    h, w, n, c = xv.shape
    tw = _tw(w, n, c, xv.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_kernel, tw=tw),
        grid=(h // 2, (w // 2) // tw),
        in_specs=[
            pl.BlockSpec((2, 2 * tw, n, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, tw, n, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h // 2, w // 2, n, c), xv.dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(xv)


def avg_pool_2x2(x: jnp.ndarray, use_pallas: bool | None = None) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/2, W/2, C] 2×2 stride-2 mean.

    Dispatches to the layout-native kernel on TPU for tile-legal shapes,
    else the 6D-reshape jnp form (exact same math). vmap folds the mapped
    axis into N (pooling is per-(N, C); same rule as groupnorm)."""
    b, h, w, c = x.shape
    if use_pallas is None:
        import os

        use_pallas = (
            jax.devices()[0].platform == "tpu"
            and os.environ.get("DU_TPU_DISABLE_PALLAS_POOL") != "1"
        )
    if not use_pallas or not _supported(h, w, b, c, x.dtype):
        xr = x.reshape(b, h // 2, 2, w // 2, 2, c)
        s = (xr[:, :, 0, :, 0] + xr[:, :, 0, :, 1]) + (xr[:, :, 1, :, 0] + xr[:, :, 1, :, 1])
        return s * jnp.asarray(0.25, x.dtype)

    @jax.custom_batching.custom_vmap
    def call(x_):
        # [B,H,W,C] -> [H,W,B,C] view: free bitcast of the conv layout
        xv = x_.transpose(1, 2, 0, 3)
        out = _pool_hwnc(xv)
        return out.transpose(2, 0, 1, 3)

    @call.def_vmap
    def _rule(axis_size, in_batched, x_):  # noqa: ANN001
        (xb,) = in_batched
        if not xb:
            x_ = jnp.broadcast_to(x_[None], (axis_size,) + x_.shape)
        out = call(x_.reshape((-1,) + x_.shape[2:]))
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return _avgpool_with_xla_grad(call, x)


def _avgpool_with_xla_grad(call, x):
    @jax.custom_vjp
    def f(x_):
        return call(x_)

    def fwd(x_):
        return f(x_), x_.shape

    def bwd(shape, g):
        # d/dx of a 2x2 mean: broadcast g/4 back over each window
        b, h, w, c = shape
        gx = jnp.broadcast_to(
            (g * 0.25)[:, :, None, :, None, :], (b, h // 2, 2, w // 2, 2, c)
        ).reshape(b, h, w, c)
        return (gx,)

    f.defvjp(fwd, bwd)
    return f(x)
