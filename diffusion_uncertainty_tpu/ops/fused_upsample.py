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
            ).astype(x.dtype)
            row.append(y)
        phases.append(row)
    # interleave: out[:, 2i+a, 2j+bb] = phases[a][bb][:, i, j].
    # (An interior-pad+add interleave was A/B'd on chip and LOST — XLA does
    # not fuse interior pads; the pad bucket grew to 17.8 ms/fwd. The
    # stack+transpose costs one re-tiling copy but nets out faster.)
    ys = jnp.stack([jnp.stack(r, axis=0) for r in phases], axis=0)  # [2,2,N,H,W,K]
    out = ys.transpose(2, 3, 0, 4, 1, 5).reshape(n, 2 * h, 2 * wd, k)
    return out + b.astype(out.dtype)


def upsample2_conv1x1(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``conv1x1(nearest_upsample_2x(x), w) + b`` == upsample(conv1x1(x)):
    a 1x1 conv commutes with nearest upsampling, so run it at the LOW
    resolution (4× fewer MACs) and upsample the result."""
    from ..models.layers import nearest_upsample

    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y + b.astype(y.dtype)
    return nearest_upsample(y)
