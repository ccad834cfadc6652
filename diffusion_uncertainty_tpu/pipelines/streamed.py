"""Streamed (host-resident-params) execution for models beyond one chip's HBM.

Flux-dev is 11.9B params (23.8GB bf16) and SD3.5-large 8.1B — neither fits a
single v5e's 16GB. The reference runs them through diffusers on big-VRAM GPUs
(``pipeline_uncertainty/pipeline_flux_uncertainty.py:204-249``,
``scripts/generate_with_uncertainty_threshold_flux.py``); the TPU-native
single-chip answer is streaming: params live on the host in bf16, the device
compiles ONE program per block *family* (double-stream, single-stream, joint,
plus tiny embed/final stages — 4-5 programs total regardless of depth, which
also keeps every program far under the remote-compile relay's limits), and
the host loop walks the depth, prefetching block i+1's weights onto the chip
while block i computes (``jax.device_put`` is async, so the PCIe transfer
overlaps the MXU work). HBM holds two blocks' params + activations — ~2GB
at dev width.

Use ``StreamedFlux``/``StreamedMMDiT`` as drop-in ``velocity_fn`` backends
for ``diffusion.flow_match.sample_flow_match_stepwise`` (the host-loop
sampler exists precisely for these models). Correctness is proven by exact
equality vs the in-HBM ``FluxTransformer``/``MMDiT`` forward at small configs
(tests/test_streamed.py); the full-size instantiation helpers
(``random_flux_params``/``random_mmdit_params``) build distinct random
per-block host params via ``jax.eval_shape`` + numpy, never allocating the
model on device.

Multi-chip note: streaming composes with the TP specs (``parallel/tp.py``) —
shard each block's device buffers over a "model" axis and the same loop runs
on a mesh; on one chip the specs degenerate to identity.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.flux import FluxConfig, _DoubleBlock, _SingleBlock, _rope_cos_sin
from ..models.layers import timestep_embedding
from ..models.mmdit import MMDiTConfig, _JointBlock

__all__ = [
    "StreamedFlux",
    "StreamedMMDiT",
    "random_flux_params",
    "random_mmdit_params",
]


def _dense(p, x, dtype):
    y = x.astype(dtype) @ p["kernel"].astype(dtype)
    return y + p["bias"].astype(dtype) if "bias" in p else y


def _ln(x):
    """LayerNorm without affine, f32 (flax epsilon=1e-6 convention here)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-6)


def _unwrap(params):
    return params["params"] if isinstance(params, dict) and "params" in params else params


def random_params_like(shape_tree, seed: int, scale: float = 0.02, dtype=None):
    """Numpy-filled params from a ``jax.eval_shape`` tree: kernels/embeddings
    N(0, scale), biases/shifts zero, norm scales one. Never touches a device —
    this is how full-size (8-12B) models get instantiated on a 1-core host in
    seconds instead of minutes of threefry."""
    dtype = dtype or jnp.bfloat16
    rng = np.random.default_rng(seed)

    def one(path, leaf):
        name = str(getattr(path[-1], "key", getattr(path[-1], "name", path[-1])))
        if name.endswith(("q_scale", "k_scale")) or name == "scale":
            return np.ones(leaf.shape, dtype)
        if name in ("bias", "shift"):
            return np.zeros(leaf.shape, dtype)
        return (rng.standard_normal(leaf.shape, np.float32) * scale).astype(dtype)

    return jax.tree_util.tree_map_with_path(one, shape_tree)


class StreamedFlux:
    """Host-resident-params Flux forward: ``__call__(x, t, ctx, pooled,
    guidance)`` == ``FluxTransformer.apply`` (equality-tested), any depth.

    params: the full converted/initialized tree ({"params": {...}}), host
    arrays (bf16 recommended). Head params (embedders + final, ~30M) are
    pinned to the device; the 19+38 block subtrees stream per forward.
    """

    HEAD = (
        "x_embedder", "context_embedder", "timestep_dense_0", "timestep_dense_1",
        "text_dense_0", "text_dense_1", "norm_out_linear", "proj_out",
    )
    HEAD_GUIDANCE = ("guidance_dense_0", "guidance_dense_1")

    # Async dispatch would otherwise let the host loop enqueue EVERY block
    # transfer ahead of execution (observed: ~3 forwards x 23.8GB of pending
    # device_put buffers resident on the host before the chip drained one);
    # waiting on the block output every THROTTLE blocks bounds in-flight
    # transfers to a few GB with no loss of compute/transfer overlap.
    THROTTLE = 4

    def __init__(self, cfg: FluxConfig, params):
        self.cfg = cfg
        p = _unwrap(params)
        names = self.HEAD + (self.HEAD_GUIDANCE if cfg.guidance_embeds else ())
        self.head = jax.device_put({k: p[k] for k in names})
        self.dblocks = [p[f"block_{i}"] for i in range(cfg.num_layers)]
        self.sblocks = [p[f"single_block_{i}"] for i in range(cfg.num_single_layers)]

        dblock, sblock = _DoubleBlock(cfg), _SingleBlock(cfg)
        self._double = jax.jit(
            lambda bp, h, ctx, temb, cos, sin: dblock.apply(
                {"params": bp}, h, ctx, temb, cos, sin
            )
        )
        self._single = jax.jit(
            lambda bp, seq, temb, cos, sin: sblock.apply({"params": bp}, seq, temb, cos, sin)
        )
        self._embed = jax.jit(self._embed_impl)
        self._final = jax.jit(self._final_impl, static_argnums=(3, 4, 5))

    def _embed_impl(self, head, x, t, ehs, pooled, guidance):
        cfg = self.cfg
        b, hh, ww, c = x.shape
        gh, gw = hh // 2, ww // 2
        dim, dt = cfg.dim, cfg.dtype
        tokens = (
            x.reshape(b, gh, 2, gw, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, 4 * c)
        )
        h = _dense(head["x_embedder"], tokens, dt)
        ctx = _dense(head["context_embedder"], ehs, dt)

        te = timestep_embedding(t, 256, cos_first=True).astype(dt)
        temb = _dense(head["timestep_dense_1"], jax.nn.silu(_dense(head["timestep_dense_0"], te, dt)), dt)
        if cfg.guidance_embeds:
            ge = timestep_embedding(jnp.asarray(guidance), 256, cos_first=True).astype(dt)
            ge = _dense(head["guidance_dense_0"], ge, dt)
            temb = temb + _dense(head["guidance_dense_1"], jax.nn.silu(ge), dt)
        pe = _dense(head["text_dense_0"], pooled, dt)
        temb = temb + _dense(head["text_dense_1"], jax.nn.silu(pe), dt)
        if temb.shape[0] == 1 and b > 1:
            temb = jnp.broadcast_to(temb, (b, dim))

        s_txt = ehs.shape[1]
        rows = jnp.repeat(jnp.arange(gh, dtype=jnp.float32), gw)
        cols = jnp.tile(jnp.arange(gw, dtype=jnp.float32), gh)
        img_ids = jnp.stack([jnp.zeros_like(rows), rows, cols], axis=-1)
        txt_ids = jnp.zeros((s_txt, 3), jnp.float32)
        cos, sin = _rope_cos_sin(
            jnp.concatenate([txt_ids, img_ids], axis=0), cfg.axes_dims_rope
        )
        return h, ctx, temb, cos, sin

    def _final_impl(self, head, h, temb, gh, gw, c):
        cfg = self.cfg
        b = h.shape[0]
        mod = _dense(head["norm_out_linear"], jax.nn.silu(temb), cfg.dtype)
        sc, sh = jnp.split(mod[:, None, :], 2, axis=-1)
        h = _ln(h).astype(cfg.dtype) * (1 + sc) + sh
        h = _dense(head["proj_out"], h, cfg.dtype)
        h = h.reshape(b, gh, gw, 2, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * 2, gw * 2, c)
        return h.astype(jnp.float32)

    def __call__(self, x, t, encoder_hidden_states, pooled_projections, guidance=None):
        cfg = self.cfg
        b, hh, ww, c = x.shape
        g = jnp.asarray(0.0) if guidance is None else guidance
        h, ctx, temb, cos, sin = self._embed(
            self.head, x, t, encoder_hidden_states, pooled_projections, g
        )
        s_txt = encoder_hidden_states.shape[1]

        nxt = jax.device_put(self.dblocks[0])
        for i in range(cfg.num_layers):
            cur, nxt = nxt, None
            if i + 1 < cfg.num_layers:
                nxt = jax.device_put(self.dblocks[i + 1])  # overlaps compute
            elif cfg.num_single_layers:
                nxt = jax.device_put(self.sblocks[0])
            h, ctx = self._double(cur, h, ctx, temb, cos, sin)
            del cur
            if i % self.THROTTLE == self.THROTTLE - 1:
                h.block_until_ready()

        seq = jnp.concatenate([ctx, h], axis=1)
        for i in range(cfg.num_single_layers):
            cur, nxt = nxt, None
            if i + 1 < cfg.num_single_layers:
                nxt = jax.device_put(self.sblocks[i + 1])
            seq = self._single(cur, seq, temb, cos, sin)
            del cur
            if i % self.THROTTLE == self.THROTTLE - 1:
                seq.block_until_ready()
        h = seq[:, s_txt:]
        return self._final(self.head, h, temb, hh // 2, ww // 2, c)


class StreamedMMDiT:
    """Host-resident-params MMDiT (SD3/SD3.5) forward; the last joint block is
    ``context_pre_only`` and gets its own compiled program."""

    HEAD = ("patch_embed", "pos_embed", "time_text_embed", "context_embedder",
            "norm_out_linear", "proj_out")

    THROTTLE = 4  # see StreamedFlux.THROTTLE

    def __init__(self, cfg: MMDiTConfig, params):
        self.cfg = cfg
        p = _unwrap(params)
        self.head = jax.device_put({k: p[k] for k in self.HEAD})
        self.blocks = [p[f"block_{i}"] for i in range(cfg.num_layers)]

        mid = _JointBlock(cfg, context_pre_only=False)
        last = _JointBlock(cfg, context_pre_only=True)
        self._mid = jax.jit(
            lambda bp, h, ctx, temb: mid.apply({"params": bp}, h, ctx, temb)
        )
        self._last = jax.jit(
            lambda bp, h, ctx, temb: last.apply({"params": bp}, h, ctx, temb)
        )
        self._embed = jax.jit(self._embed_impl)
        self._final = jax.jit(self._final_impl, static_argnums=(3, 4))

    def _embed_impl(self, head, x, t, ehs, pooled):
        return mmdit_embed(self.cfg, head, x, t, ehs, pooled)

    def _final_impl(self, head, h, temb, gh, gw):
        return mmdit_final(self.cfg, head, h, temb, gh, gw)

    def __call__(self, x, t, encoder_hidden_states, pooled_projections):
        cfg = self.cfg
        b, hh, ww, _ = x.shape
        h, ctx, temb = self._embed(self.head, x, t, encoder_hidden_states, pooled_projections)
        nxt = jax.device_put(self.blocks[0])
        for i in range(cfg.num_layers):
            cur, nxt = nxt, None
            if i + 1 < cfg.num_layers:
                nxt = jax.device_put(self.blocks[i + 1])
            fn = self._last if i == cfg.num_layers - 1 else self._mid
            h, ctx = fn(cur, h, ctx, temb)
            del cur
            if i % self.THROTTLE == self.THROTTLE - 1:
                h.block_until_ready()
        pp = cfg.patch_size
        return self._final(self.head, h, temb, hh // pp, ww // pp)


def mmdit_embed(cfg, head, x, t, ehs, pooled):
    """MMDiT embedding stage as a pure function of the head param dict
    (models/mmdit.py:208-229 semantics) — shared by the streamed executor and
    the pipeline-parallel forward (parallel/pp.py::mmdit_pipeline_forward)."""
    b, hh, ww, c = x.shape
    pp, dim, dt = cfg.patch_size, cfg.dim, cfg.dtype
    gh, gw = hh // pp, ww // pp
    # stride-p VALID patch conv == unfold + dense on [p, p, c] patches
    patches = (
        x.reshape(b, gh, pp, gw, pp, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, pp * pp * c)
    )
    k = head["patch_embed"]["kernel"].reshape(pp * pp * c, dim)
    tokens = patches.astype(dt) @ k.astype(dt) + head["patch_embed"]["bias"].astype(dt)

    m = cfg.pos_embed_max_size
    top, left = (m - gh) // 2, (m - gw) // 2
    pos2d = head["pos_embed"].reshape(m, m, dim)[top : top + gh, left : left + gw]
    tokens = tokens + pos2d.reshape(1, gh * gw, dim).astype(dt)

    tt = head["time_text_embed"]
    te = timestep_embedding(t, 256, cos_first=True).astype(dt)
    te = _dense(tt["timestep_dense_1"], jax.nn.silu(_dense(tt["timestep_dense_0"], te, dt)), dt)
    pe = _dense(tt["text_dense_1"], jax.nn.silu(_dense(tt["text_dense_0"], pooled, dt)), dt)
    if te.shape[0] == 1 and pe.shape[0] > 1:
        te = jnp.broadcast_to(te, pe.shape)
    temb = te + pe
    ctx = _dense(head["context_embedder"], ehs, dt)
    return tokens, ctx, temb


def mmdit_final(cfg, head, h, temb, gh, gw):
    """MMDiT output head (AdaLN-Continuous + linear + unpatchify) as a pure
    function of the head param dict (models/mmdit.py:238-246 semantics)."""
    b, pp, c = h.shape[0], cfg.patch_size, cfg.out_channels
    mod = _dense(head["norm_out_linear"], jax.nn.silu(temb), cfg.dtype)
    sc, sh = jnp.split(mod[:, None, :], 2, axis=-1)
    h = _ln(h).astype(cfg.dtype) * (1 + sc) + sh
    h = _dense(head["proj_out"], h, cfg.dtype)
    h = h.reshape(b, gh, gw, pp, pp, c).transpose(0, 1, 3, 2, 4, 5)
    return h.reshape(b, gh * pp, gw * pp, c).astype(jnp.float32)


def _eval_shape_tree(module, *args, method=None):
    return jax.eval_shape(partial(module.init, method=method), jax.random.key(0), *args)


def random_flux_params(
    cfg: FluxConfig, seq_txt: int = 512, latent: int = 64, seed: int = 0
) -> dict:
    """Full-size random-init Flux host params (distinct per block) without
    ever allocating the model on a device: shapes from ``jax.eval_shape`` on
    each block family, values from numpy, bf16. Flux-dev (11.9B) builds in
    well under a minute on one host core."""
    dim = cfg.dim
    b = 1
    h = jax.ShapeDtypeStruct((b, (latent // 2) ** 2, dim), jnp.float32)
    ctx = jax.ShapeDtypeStruct((b, seq_txt, dim), jnp.float32)
    seq = jax.ShapeDtypeStruct((b, seq_txt + (latent // 2) ** 2, dim), jnp.float32)
    temb = jax.ShapeDtypeStruct((b, dim), jnp.float32)
    rope = jax.ShapeDtypeStruct(
        (seq_txt + (latent // 2) ** 2, sum(cfg.axes_dims_rope)), jnp.float32
    )

    d_shapes = _unwrap(jax.eval_shape(_DoubleBlock(cfg).init, jax.random.key(0), h, ctx, temb, rope, rope))
    s_shapes = _unwrap(jax.eval_shape(_SingleBlock(cfg).init, jax.random.key(0), seq, temb, rope, rope))

    P: dict = {}
    rng = np.random.default_rng(seed)
    for i in range(cfg.num_layers):
        P[f"block_{i}"] = random_params_like(d_shapes, int(rng.integers(2**31)))
    for i in range(cfg.num_single_layers):
        P[f"single_block_{i}"] = random_params_like(s_shapes, int(rng.integers(2**31)))

    def dense_p(din, dout, s):
        return {
            "kernel": (np.random.default_rng(s).standard_normal((din, dout), np.float32) * 0.02).astype(jnp.bfloat16),
            "bias": np.zeros((dout,), jnp.bfloat16),
        }

    c4 = 4 * cfg.in_channels
    heads = {
        "x_embedder": dense_p(c4, dim, 1),
        "context_embedder": dense_p(cfg.joint_attention_dim, dim, 2),
        "timestep_dense_0": dense_p(256, dim, 3),
        "timestep_dense_1": dense_p(dim, dim, 4),
        "text_dense_0": dense_p(cfg.pooled_projection_dim, dim, 5),
        "text_dense_1": dense_p(dim, dim, 6),
        "norm_out_linear": dense_p(dim, 2 * dim, 7),
        "proj_out": dense_p(dim, c4, 8),
    }
    if cfg.guidance_embeds:
        heads["guidance_dense_0"] = dense_p(256, dim, 9)
        heads["guidance_dense_1"] = dense_p(dim, dim, 10)
    P.update(heads)
    return {"params": P}


def random_mmdit_params(cfg: MMDiTConfig, seq_txt: int = 154, seed: int = 0) -> dict:
    """Full-size random-init MMDiT host params (SD3.5-large = 8.1B)."""
    dim = cfg.dim
    b, s_img = 1, (cfg.sample_size // cfg.patch_size) ** 2
    h = jax.ShapeDtypeStruct((b, s_img, dim), jnp.float32)
    ctx = jax.ShapeDtypeStruct((b, seq_txt, dim), jnp.float32)
    temb = jax.ShapeDtypeStruct((b, dim), jnp.float32)

    mid_shapes = _unwrap(
        jax.eval_shape(_JointBlock(cfg, context_pre_only=False).init, jax.random.key(0), h, ctx, temb)
    )
    last_shapes = _unwrap(
        jax.eval_shape(_JointBlock(cfg, context_pre_only=True).init, jax.random.key(0), h, ctx, temb)
    )

    P: dict = {}
    rng = np.random.default_rng(seed)
    for i in range(cfg.num_layers):
        shapes = last_shapes if i == cfg.num_layers - 1 else mid_shapes
        P[f"block_{i}"] = random_params_like(shapes, int(rng.integers(2**31)))

    def dense_p(din, dout, s):
        return {
            "kernel": (np.random.default_rng(s).standard_normal((din, dout), np.float32) * 0.02).astype(jnp.bfloat16),
            "bias": np.zeros((dout,), jnp.bfloat16),
        }

    pp, c = cfg.patch_size, cfg.in_channels
    P.update({
        "patch_embed": {
            "kernel": (np.random.default_rng(11).standard_normal((pp, pp, c, dim), np.float32) * 0.02).astype(jnp.bfloat16),
            "bias": np.zeros((dim,), jnp.bfloat16),
        },
        "pos_embed": (np.random.default_rng(12).standard_normal(
            (1, cfg.pos_embed_max_size**2, dim), np.float32) * 0.02).astype(jnp.bfloat16),
        "time_text_embed": {
            "timestep_dense_0": dense_p(256, dim, 13),
            "timestep_dense_1": dense_p(dim, dim, 14),
            "text_dense_0": dense_p(cfg.pooled_projection_dim, dim, 15),
            "text_dense_1": dense_p(dim, dim, 16),
        },
        "context_embedder": dense_p(cfg.joint_attention_dim, dim, 17),
        "norm_out_linear": dense_p(dim, 2 * dim, 18),
        "proj_out": dense_p(dim, pp * pp * cfg.out_channels, 19),
    })
    return {"params": P}
