"""Sequence parallelism: ring attention over a "seq" mesh axis.

No reference analogue (SURVEY.md §2.4 — the reference is DP-only); this is
the TPU-native scaling dimension for the long-token T2I transformers
(Flux at 1024px packs 4096 image tokens + 512 text tokens; SD3.5-large at
1024px packs 4096+333). When activations rather than weights are the HBM
bound, shard the *sequence*: each chip holds ``S/n`` queries, keys and
values, and attention becomes a ring — K/V shards rotate around the ICI
with ``ppermute`` while each chip accumulates its queries' online-softmax
partials (the flash-attention recurrence, here across *chips* instead of
VMEM tiles; cf. Liu et al., "Ring Attention with Blockwise Transformers").

One ``shard_map`` program: ``lax.scan`` over the ring's ``n`` hops, each hop
one ``[Sq_local, Sk_local]`` block matmul pair on the MXU plus a ppermute
that XLA overlaps with the next hop's compute. Numerically exact (not an
approximation): the running max/denominator recurrence reproduces full
softmax attention to f32 roundoff — asserted against
``jax.nn.dot_product_attention`` in tests/test_sp.py.

``ring_attention`` is layout-compatible with ``ops.attention`` ([B, S, H, D])
so model code can swap it in under a ("data", "seq") mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover — older stacks
    from jax.experimental.shard_map import shard_map

__all__ = [
    "make_sp_mesh",
    "ring_attention",
    "ring_attention_shard",
    "mmdit_sp_forward",
    "flux_sp_forward",
]


def make_sp_mesh(seq: int, devices=None) -> Mesh:
    """1-D ("seq",) mesh over the first ``seq`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if seq > len(devices):
        raise ValueError(f"seq({seq}) > devices({len(devices)})")
    return Mesh(np.asarray(devices[:seq]), ("seq",))


def ring_attention_shard(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis: str = "seq",
    scale: float | None = None,
) -> jax.Array:
    """The ring-attention LOCAL program, for use under an AMBIENT shard_map.

    ``q, k, v``: the per-shard ``[B, S_local, H, D]`` slices of a
    sequence-sharded attention; returns the ``[B, S_local, H, D]`` outputs of
    exact full-softmax attention over the global sequence. This is what model
    code calls when it runs inside a ("seq",)-sharded program (e.g. MMDiT /
    Flux with ``cfg.sp_axis`` set); :func:`ring_attention` is the standalone
    wrapper that owns its own shard_map."""
    d = q.shape[-1]
    sc = d ** -0.5 if scale is None else scale
    n = jax.lax.psum(1, axis)  # static under shard_map (mesh axis size)
    perm = [(i, (i + 1) % n) for i in range(n)]

    qh, kh, vh = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    qf = qh.astype(jnp.float32)

    m0 = jnp.full(qh.shape[:3], -jnp.inf, jnp.float32)  # [B, H, Sq]
    l0 = jnp.zeros(qh.shape[:3], jnp.float32)
    a0 = jnp.zeros(qh.shape, jnp.float32)

    def hop(carry, _):
        kb, vb, m, l, acc = carry
        sblk = jnp.einsum("bhqd,bhkd->bhqk", qf, kb.astype(jnp.float32)) * sc
        m_new = jnp.maximum(m, sblk.max(axis=-1))
        p = jnp.exp(sblk - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vb.astype(jnp.float32)
        )
        kb, vb = lax.ppermute((kb, vb), axis, perm)
        return (kb, vb, m_new, l, acc), None

    (_, _, m, l, acc), _ = lax.scan(hop, (kh, vh, m0, l0, a0), None, length=n)
    out = acc / l[..., None]
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "seq",
    scale: float | None = None,
) -> jax.Array:
    """Exact softmax attention with q/k/v sequence-sharded over ``axis``.

    Args:
      q, k, v: ``[B, S, H, D]`` (the ``ops.attention`` layout); ``S`` must
        divide by ``mesh.shape[axis]``. Inputs may be unsharded host/device
        arrays — they are placed seq-sharded here; pass pre-sharded arrays
        with the same spec to skip the reshard.
      scale: softmax scale (default ``D**-0.5``).

    Returns ``[B, S, H, D]``, sequence-sharded on ``axis`` (same spec as q).
    """
    b, s, h, d = q.shape
    n = mesh.shape[axis]
    if s % n:
        raise ValueError(f"sequence({s}) not divisible by mesh axis({n})")
    # the local program IS ring_attention_shard — one copy of the
    # exactness-critical online-softmax recurrence (VERDICT r4 #7)
    def local(q, k, v):
        return ring_attention_shard(q, k, v, axis=axis, scale=scale)

    spec = P(None, axis, None, None)
    sh = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(x, sh) for x in (q, k, v))
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def _validate_sp(name: str, tokens: int, n: int, what: str):
    if tokens % n:
        raise ValueError(f"{name}: {what}({tokens}) not divisible by seq shards({n})")


def mmdit_sp_forward(
    cfg, params, x, t, encoder_hidden_states, pooled_projections, mesh: Mesh, axis: str = "seq"
):
    """Sequence-parallel MMDiT forward: full [B,H,W,C] latents in, full
    velocity out, with image ROWS and text tokens sharded over ``axis`` and
    every joint attention running the exact ring (``ring_attention_shard``).

    ``params`` come from a plain (``sp_axis=None``) ``MMDiT.init`` — the SP
    configuration changes no parameter shapes, only how the pos-embed crop
    and the attention are computed per shard. Equality vs the unsharded
    ``MMDiT.apply`` is tested in tests/test_sp.py. No reference analogue
    (SURVEY §2.4) — this is the TPU-native long-sequence path for
    high-resolution latents."""
    import dataclasses

    from ..models.mmdit import MMDiT

    n = mesh.shape[axis]
    _validate_sp("mmdit_sp_forward", x.shape[1] // cfg.patch_size, n, "latent grid rows")
    _validate_sp("mmdit_sp_forward", encoder_hidden_states.shape[1], n, "text tokens")
    model = MMDiT(dataclasses.replace(cfg, sp_axis=axis))

    def local(p, xl, tl, el, pl):
        return model.apply(p, xl, tl, el, pl)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None, None), P(), P(None, axis, None), P()),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )(params, x, t, encoder_hidden_states, pooled_projections)


def flux_sp_forward(
    cfg,
    params,
    x,
    t,
    encoder_hidden_states,
    pooled_projections,
    mesh: Mesh,
    axis: str = "seq",
    guidance=None,
):
    """Sequence-parallel Flux forward (see :func:`mmdit_sp_forward`): latent
    rows and text tokens sharded over ``axis``, RoPE row ids offset by shard
    rank, double- and single-stream attention running the exact ring."""
    import dataclasses

    from ..models.flux import FluxTransformer

    n = mesh.shape[axis]
    _validate_sp("flux_sp_forward", x.shape[1] // 2, n, "packed grid rows")
    _validate_sp("flux_sp_forward", encoder_hidden_states.shape[1], n, "text tokens")
    model = FluxTransformer(dataclasses.replace(cfg, sp_axis=axis))

    def local(p, xl, tl, el, pl, gl):
        return model.apply(p, xl, tl, el, pl, gl)

    g = jnp.asarray(0.0) if guidance is None else jnp.asarray(guidance)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None, None), P(), P(None, axis, None), P(), P()),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )(params, x, t, encoder_hidden_states, pooled_projections, g)
