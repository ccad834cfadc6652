"""Checkpoint-converter tests.

Real reference checkpoints are not downloadable in this environment, so the
tests validate the two failure modes that matter:
  * naming/shape/accounting — a synthetic torch-style state dict (built by
    replaying the guided-diffusion/diffusers key layout) must convert into a
    params tree structurally identical to the flax model's init tree, with
    every key consumed;
  * attention-order math — the legacy qkv permutation must make our qkv-major
    attention reproduce a hand-rolled head-major (legacy) torch attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.models import ADMUNet, ADMUNetConfig, UNet2D, UNet2DConfig
from diffusion_uncertainty_tpu.models.convert import (
    _legacy_qkv_permutation,
    convert_adm_unet,
    convert_unet2d,
)

rng = np.random.RandomState(0)


def _r(*shape):
    return rng.randn(*shape).astype(np.float32) * 0.05


def _torch_resblock(sd, pfx, c_in, c_out, emb, scale_shift=True):
    sd[f"{pfx}.in_layers.0.weight"] = _r(c_in)
    sd[f"{pfx}.in_layers.0.bias"] = _r(c_in)
    sd[f"{pfx}.in_layers.2.weight"] = _r(c_out, c_in, 3, 3)
    sd[f"{pfx}.in_layers.2.bias"] = _r(c_out)
    sd[f"{pfx}.emb_layers.1.weight"] = _r(2 * c_out if scale_shift else c_out, emb)
    sd[f"{pfx}.emb_layers.1.bias"] = _r(2 * c_out if scale_shift else c_out)
    sd[f"{pfx}.out_layers.0.weight"] = _r(c_out)
    sd[f"{pfx}.out_layers.0.bias"] = _r(c_out)
    sd[f"{pfx}.out_layers.3.weight"] = _r(c_out, c_out, 3, 3)
    sd[f"{pfx}.out_layers.3.bias"] = _r(c_out)
    if c_in != c_out:
        sd[f"{pfx}.skip_connection.weight"] = _r(c_out, c_in, 1, 1)
        sd[f"{pfx}.skip_connection.bias"] = _r(c_out)


def _torch_attention(sd, pfx, c):
    sd[f"{pfx}.norm.weight"] = _r(c)
    sd[f"{pfx}.norm.bias"] = _r(c)
    sd[f"{pfx}.qkv.weight"] = _r(3 * c, c, 1)
    sd[f"{pfx}.qkv.bias"] = _r(3 * c)
    sd[f"{pfx}.proj_out.weight"] = _r(c, c, 1)
    sd[f"{pfx}.proj_out.bias"] = _r(c)


def make_torch_adm_state_dict(cfg: ADMUNetConfig) -> dict:
    mc = cfg.model_channels
    emb = 4 * mc
    sd = {}
    sd["time_embed.0.weight"] = _r(emb, mc)
    sd["time_embed.0.bias"] = _r(emb)
    sd["time_embed.2.weight"] = _r(emb, emb)
    sd["time_embed.2.bias"] = _r(emb)
    if cfg.num_classes is not None:
        sd["label_emb.weight"] = _r(cfg.num_classes, emb)
    sd["input_blocks.0.0.weight"] = _r(mc, cfg.in_channels, 3, 3)
    sd["input_blocks.0.0.bias"] = _r(mc)

    ds, ch, idx = 1, mc, 1
    input_chs = [mc]
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            _torch_resblock(sd, f"input_blocks.{idx}.0", ch, mult * mc, emb)
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                _torch_attention(sd, f"input_blocks.{idx}.1", ch)
            input_chs.append(ch)
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            _torch_resblock(sd, f"input_blocks.{idx}.0", ch, ch, emb)
            input_chs.append(ch)
            idx += 1
            ds *= 2

    _torch_resblock(sd, "middle_block.0", ch, ch, emb)
    _torch_attention(sd, "middle_block.1", ch)
    _torch_resblock(sd, "middle_block.2", ch, ch, emb)

    out_idx = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            skip = input_chs.pop()
            _torch_resblock(sd, f"output_blocks.{out_idx}.0", ch + skip, mult * mc, emb)
            ch = mult * mc
            sub = 1
            if ds in cfg.attention_resolutions:
                _torch_attention(sd, f"output_blocks.{out_idx}.{sub}", ch)
                sub += 1
            if level and i == cfg.num_res_blocks:
                _torch_resblock(sd, f"output_blocks.{out_idx}.{sub}", ch, ch, emb)
                ds //= 2
            out_idx += 1

    sd["out.0.weight"] = _r(ch)
    sd["out.0.bias"] = _r(ch)
    sd["out.2.weight"] = _r(cfg.out_channels, ch, 3, 3)
    sd["out.2.bias"] = _r(cfg.out_channels)
    return sd


def test_adm_converter_structure_and_forward():
    cfg = ADMUNetConfig.tiny()
    sd = make_torch_adm_state_dict(cfg)
    params = convert_adm_unet(sd, cfg)

    model = ADMUNet(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.asarray(100)
    y = jnp.asarray([0, 1])
    ref = model.init(jax.random.key(0), x, t, y)

    # identical tree structure + shapes
    ref_flat = {"/".join(map(str, k)): v.shape for k, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_flat = {"/".join(map(str, k)): np.asarray(v).shape for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_flat == got_flat

    out = model.apply(params, jnp.ones_like(x) * 0.1, t, y)
    assert out.shape == (2, 16, 16, cfg.out_channels)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.abs(out).max()) > 0  # random weights -> non-trivial output


def test_adm_converter_strict_accounting():
    cfg = ADMUNetConfig.tiny()
    sd = make_torch_adm_state_dict(cfg)
    sd["some.leftover.weight"] = _r(3)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_adm_unet(sd, cfg)
    sd2 = make_torch_adm_state_dict(cfg)
    del sd2["middle_block.1.qkv.bias"]
    with pytest.raises(KeyError, match="missing"):
        convert_adm_unet(sd2, cfg)


def test_legacy_qkv_permutation_math():
    """Our qkv-major attention on permuted weights must equal a hand-rolled
    legacy (head-major) attention on the original weights."""
    torch = pytest.importorskip("torch")
    B, T, C, H = 2, 6, 8, 2
    d = C // H
    w = torch.randn(3 * C, C)
    b = torch.randn(3 * C)
    x = torch.randn(B, C, T)

    # legacy semantics: qkv [B, 3C, T] -> reshape (B*H, 3d, T) -> split
    qkv = torch.einsum("oc,bct->bot", w, x) + b[None, :, None]
    qkv_h = qkv.reshape(B * H, 3 * d, T)
    q, k, v = qkv_h.split(d, dim=1)
    scale = 1 / (d**0.5)
    attn = torch.softmax(torch.einsum("bct,bcs->bts", q * scale, k), dim=-1)
    legacy_out = torch.einsum("bts,bcs->bct", attn, v).reshape(B, C, T)

    # our layout: rows permuted to [Q|K|V] then standard multi-head attention
    perm = _legacy_qkv_permutation(C, H)
    w2 = w.numpy()[perm]
    b2 = b.numpy()[perm]
    xn = np.transpose(x.numpy(), (0, 2, 1))  # [B, T, C]
    qkv2 = xn @ w2.T + b2
    q2, k2, v2 = np.split(qkv2, 3, axis=-1)

    def heads(a):
        return a.reshape(B, T, H, d)

    from diffusion_uncertainty_tpu.ops.attention import dot_product_attention

    ours = dot_product_attention(
        jnp.asarray(heads(q2)), jnp.asarray(heads(k2)), jnp.asarray(heads(v2)), use_pallas=False
    )
    ours = np.asarray(ours).reshape(B, T, C).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, legacy_out.numpy(), rtol=1e-4, atol=1e-5)


def _torch_hf_resnet(sd, pfx, c_in, c_out, emb):
    sd[f"{pfx}.norm1.weight"] = _r(c_in)
    sd[f"{pfx}.norm1.bias"] = _r(c_in)
    sd[f"{pfx}.conv1.weight"] = _r(c_out, c_in, 3, 3)
    sd[f"{pfx}.conv1.bias"] = _r(c_out)
    sd[f"{pfx}.time_emb_proj.weight"] = _r(c_out, emb)
    sd[f"{pfx}.time_emb_proj.bias"] = _r(c_out)
    sd[f"{pfx}.norm2.weight"] = _r(c_out)
    sd[f"{pfx}.norm2.bias"] = _r(c_out)
    sd[f"{pfx}.conv2.weight"] = _r(c_out, c_out, 3, 3)
    sd[f"{pfx}.conv2.bias"] = _r(c_out)
    if c_in != c_out:
        sd[f"{pfx}.conv_shortcut.weight"] = _r(c_out, c_in, 1, 1)
        sd[f"{pfx}.conv_shortcut.bias"] = _r(c_out)


def _torch_hf_attn(sd, pfx, c):
    sd[f"{pfx}.group_norm.weight"] = _r(c)
    sd[f"{pfx}.group_norm.bias"] = _r(c)
    for n in ("query", "key", "value", "proj_attn"):
        sd[f"{pfx}.{n}.weight"] = _r(c, c)
        sd[f"{pfx}.{n}.bias"] = _r(c)


def make_torch_unet2d_state_dict(cfg: UNet2DConfig) -> dict:
    b0 = cfg.block_out_channels[0]
    emb = 4 * b0
    sd = {}
    sd["time_embedding.linear_1.weight"] = _r(emb, b0)
    sd["time_embedding.linear_1.bias"] = _r(emb)
    sd["time_embedding.linear_2.weight"] = _r(emb, emb)
    sd["time_embedding.linear_2.bias"] = _r(emb)
    sd["conv_in.weight"] = _r(b0, cfg.in_channels, 3, 3)
    sd["conv_in.bias"] = _r(b0)

    ch = b0
    for bi, (btype, out_ch) in enumerate(zip(cfg.down_block_types, cfg.block_out_channels)):
        for li in range(cfg.layers_per_block):
            _torch_hf_resnet(sd, f"down_blocks.{bi}.resnets.{li}", ch, out_ch, emb)
            ch = out_ch
            if btype == "AttnDownBlock2D":
                _torch_hf_attn(sd, f"down_blocks.{bi}.attentions.{li}", ch)
        if bi != len(cfg.down_block_types) - 1:
            sd[f"down_blocks.{bi}.downsamplers.0.conv.weight"] = _r(ch, ch, 3, 3)
            sd[f"down_blocks.{bi}.downsamplers.0.conv.bias"] = _r(ch)

    mid = cfg.block_out_channels[-1]
    _torch_hf_resnet(sd, "mid_block.resnets.0", mid, mid, emb)
    _torch_hf_attn(sd, "mid_block.attentions.0", mid)
    _torch_hf_resnet(sd, "mid_block.resnets.1", mid, mid, emb)

    skip_chs = [b0]
    for bi, out_ch in enumerate(cfg.block_out_channels):
        skip_chs.extend([out_ch] * cfg.layers_per_block)
        if bi != len(cfg.block_out_channels) - 1:
            skip_chs.append(out_ch)
    rev = tuple(reversed(cfg.block_out_channels))
    for bi, (btype, out_ch) in enumerate(zip(cfg.up_block_types, rev)):
        for li in range(cfg.layers_per_block + 1):
            skip = skip_chs.pop()
            _torch_hf_resnet(sd, f"up_blocks.{bi}.resnets.{li}", ch + skip, out_ch, emb)
            ch = out_ch
            if btype == "AttnUpBlock2D":
                _torch_hf_attn(sd, f"up_blocks.{bi}.attentions.{li}", ch)
        if bi != len(cfg.up_block_types) - 1:
            sd[f"up_blocks.{bi}.upsamplers.0.conv.weight"] = _r(out_ch, out_ch, 3, 3)
            sd[f"up_blocks.{bi}.upsamplers.0.conv.bias"] = _r(out_ch)

    sd["conv_norm_out.weight"] = _r(ch)
    sd["conv_norm_out.bias"] = _r(ch)
    sd["conv_out.weight"] = _r(cfg.out_channels, ch, 3, 3)
    sd["conv_out.bias"] = _r(cfg.out_channels)
    return sd


def test_unet2d_converter_structure_and_forward():
    cfg = UNet2DConfig.tiny()
    sd = make_torch_unet2d_state_dict(cfg)
    params = convert_unet2d(sd, cfg)

    model = UNet2D(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.asarray(10)
    ref = model.init(jax.random.key(0), x, t)
    ref_flat = {"/".join(map(str, k)): v.shape for k, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_flat = {"/".join(map(str, k)): np.asarray(v).shape for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_flat == got_flat

    out = model.apply(params, jnp.ones_like(x) * 0.1, t)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet2d_converter_cifar10_full_size():
    cfg = UNet2DConfig.ddpm_cifar10()
    sd = make_torch_unet2d_state_dict(cfg)
    params = convert_unet2d(sd, cfg)
    n = sum(np.asarray(p).size for p in jax.tree.leaves(params))
    assert 30e6 < n < 42e6


# ---------------------------------------------------------------------------
# SD UNet (diffusers UNet2DConditionModel layout)
# ---------------------------------------------------------------------------


def _torch_sd_xattn(sd, pfx, c, ctx_dim):
    for name, din in (("to_q", c), ("to_k", ctx_dim), ("to_v", ctx_dim)):
        sd[f"{pfx}.{name}.weight"] = _r(c, din)  # no bias (diffusers Attention)
    sd[f"{pfx}.to_out.0.weight"] = _r(c, c)
    sd[f"{pfx}.to_out.0.bias"] = _r(c)


def _torch_sd_transformer(sd, pfx, c, ctx_dim, depth, linear_proj):
    sd[f"{pfx}.norm.weight"] = _r(c)
    sd[f"{pfx}.norm.bias"] = _r(c)
    proj_shape = (c, c) if linear_proj else (c, c, 1, 1)
    sd[f"{pfx}.proj_in.weight"] = _r(*proj_shape)
    sd[f"{pfx}.proj_in.bias"] = _r(c)
    for k in range(depth):
        b = f"{pfx}.transformer_blocks.{k}"
        for n in ("norm1", "norm2", "norm3"):
            sd[f"{b}.{n}.weight"] = _r(c)
            sd[f"{b}.{n}.bias"] = _r(c)
        _torch_sd_xattn(sd, f"{b}.attn1", c, c)
        _torch_sd_xattn(sd, f"{b}.attn2", c, ctx_dim)
        sd[f"{b}.ff.net.0.proj.weight"] = _r(8 * c, c)
        sd[f"{b}.ff.net.0.proj.bias"] = _r(8 * c)
        sd[f"{b}.ff.net.2.weight"] = _r(c, 4 * c)
        sd[f"{b}.ff.net.2.bias"] = _r(c)
    sd[f"{pfx}.proj_out.weight"] = _r(*proj_shape)
    sd[f"{pfx}.proj_out.bias"] = _r(c)


def make_torch_sd_state_dict(cfg) -> dict:
    emb = 4 * cfg.block_out_channels[0]
    sd = {}
    sd["time_embedding.linear_1.weight"] = _r(emb, cfg.block_out_channels[0])
    sd["time_embedding.linear_1.bias"] = _r(emb)
    sd["time_embedding.linear_2.weight"] = _r(emb, emb)
    sd["time_embedding.linear_2.bias"] = _r(emb)
    sd["conv_in.weight"] = _r(cfg.block_out_channels[0], cfg.in_channels, 3, 3)
    sd["conv_in.bias"] = _r(cfg.block_out_channels[0])

    ch = cfg.block_out_channels[0]
    for bi, (btype, out_ch) in enumerate(zip(cfg.down_block_types, cfg.block_out_channels)):
        for li in range(cfg.layers_per_block):
            _torch_hf_resnet(sd, f"down_blocks.{bi}.resnets.{li}", ch, out_ch, emb)
            ch = out_ch
            if btype == "CrossAttnDownBlock2D":
                _torch_sd_transformer(
                    sd, f"down_blocks.{bi}.attentions.{li}", out_ch,
                    cfg.cross_attention_dim, cfg.transformer_layers_per_block,
                    cfg.use_linear_projection,
                )
        if bi != len(cfg.down_block_types) - 1:
            sd[f"down_blocks.{bi}.downsamplers.0.conv.weight"] = _r(out_ch, out_ch, 3, 3)
            sd[f"down_blocks.{bi}.downsamplers.0.conv.bias"] = _r(out_ch)

    mid = cfg.block_out_channels[-1]
    _torch_hf_resnet(sd, "mid_block.resnets.0", mid, mid, emb)
    _torch_sd_transformer(
        sd, "mid_block.attentions.0", mid, cfg.cross_attention_dim,
        cfg.transformer_layers_per_block, cfg.use_linear_projection,
    )
    _torch_hf_resnet(sd, "mid_block.resnets.1", mid, mid, emb)

    rev = tuple(reversed(cfg.block_out_channels))
    skip_chs = [cfg.block_out_channels[0]]
    for bi, out_ch in enumerate(cfg.block_out_channels):
        skip_chs.extend([out_ch] * cfg.layers_per_block)
        if bi != len(cfg.block_out_channels) - 1:
            skip_chs.append(out_ch)
    for bi, (btype, out_ch) in enumerate(zip(cfg.up_block_types, rev)):
        for li in range(cfg.layers_per_block + 1):
            skip = skip_chs.pop()
            _torch_hf_resnet(sd, f"up_blocks.{bi}.resnets.{li}", ch + skip, out_ch, emb)
            ch = out_ch
            if btype == "CrossAttnUpBlock2D":
                _torch_sd_transformer(
                    sd, f"up_blocks.{bi}.attentions.{li}", out_ch,
                    cfg.cross_attention_dim, cfg.transformer_layers_per_block,
                    cfg.use_linear_projection,
                )
        if bi != len(cfg.up_block_types) - 1:
            sd[f"up_blocks.{bi}.upsamplers.0.conv.weight"] = _r(out_ch, out_ch, 3, 3)
            sd[f"up_blocks.{bi}.upsamplers.0.conv.bias"] = _r(out_ch)

    sd["conv_norm_out.weight"] = _r(cfg.block_out_channels[0])
    sd["conv_norm_out.bias"] = _r(cfg.block_out_channels[0])
    sd["conv_out.weight"] = _r(cfg.out_channels, cfg.block_out_channels[0], 3, 3)
    sd["conv_out.bias"] = _r(cfg.out_channels)
    return sd


def test_sd_unet_converter_structure_and_forward():
    from diffusion_uncertainty_tpu.models import SDUNet, SDUNetConfig
    from diffusion_uncertainty_tpu.models.convert import convert_sd_unet

    cfg = SDUNetConfig.tiny()
    sd = make_torch_sd_state_dict(cfg)
    params = convert_sd_unet(sd, cfg)

    model = SDUNet(cfg)
    x = jnp.zeros((2, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    t = jnp.asarray(7)
    ctx = jnp.ones((2, 5, cfg.cross_attention_dim))
    ref = model.init(jax.random.key(0), x, t, ctx)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes

    out = model.apply(params, x + 0.1, t, ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_sd_unet_converter_linear_projection_variant():
    """SD2.x layout: transformer projections are Linear, not Conv1x1."""
    import dataclasses

    from diffusion_uncertainty_tpu.models import SDUNet, SDUNetConfig
    from diffusion_uncertainty_tpu.models.convert import convert_sd_unet

    cfg = dataclasses.replace(SDUNetConfig.tiny(), use_linear_projection=True)
    sd = make_torch_sd_state_dict(cfg)
    params = convert_sd_unet(sd, cfg)
    model = SDUNet(cfg)
    x = jnp.zeros((1, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    out = model.apply(params, x, jnp.asarray(3), jnp.ones((1, 5, cfg.cross_attention_dim)))
    assert out.shape == x.shape


def test_sd_unet_converter_strict_accounting():
    from diffusion_uncertainty_tpu.models import SDUNetConfig
    from diffusion_uncertainty_tpu.models.convert import convert_sd_unet

    cfg = SDUNetConfig.tiny()
    sd = make_torch_sd_state_dict(cfg)
    sd["extra.key"] = _r(3)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_sd_unet(sd, cfg)
    sd2 = make_torch_sd_state_dict(cfg)
    del sd2["mid_block.attentions.0.proj_in.weight"]
    with pytest.raises(KeyError, match="missing"):
        convert_sd_unet(sd2, cfg)
