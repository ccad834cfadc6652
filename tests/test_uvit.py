import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.models import (
    AutoencoderKL,
    AutoencoderKLConfig,
    UViT,
    UViTConfig,
)
from diffusion_uncertainty_tpu.models.convert import convert_autoencoder_kl, convert_uvit

rng = np.random.RandomState(0)


def _r(*shape):
    return rng.randn(*shape).astype(np.float32) * 0.05


@pytest.fixture(scope="module")
def uvit_tiny():
    cfg = UViTConfig.tiny()
    model = UViT(cfg)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.asarray(500)
    y = jnp.asarray([1, 10])
    params = model.init(jax.random.key(0), x, t, y)
    return cfg, model, params, x, t, y


def test_uvit_shapes(uvit_tiny):
    cfg, model, params, x, t, y = uvit_tiny
    out = model.apply(params, x, t, y)
    assert out.shape == (2, 8, 8, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_uvit_requires_label(uvit_tiny):
    cfg, model, params, x, t, _ = uvit_tiny
    with pytest.raises(ValueError):
        model.apply(params, x, t, None)


def test_uvit_token_count(uvit_tiny):
    """pos_embed must cover [label, time, patches]."""
    cfg, model, params, *_ = uvit_tiny
    grid = cfg.img_size // cfg.patch_size
    assert params["params"]["pos_embed"].shape == (1, 2 + grid * grid, cfg.embed_dim)


def test_uvit_imagenet_configs():
    c256 = UViTConfig.imagenet256()
    assert (c256.img_size, c256.patch_size) == (32, 2)
    c512 = UViTConfig.imagenet512()
    assert (c512.img_size, c512.patch_size) == (64, 4)
    assert c256.embed_dim == 1152 and c256.depth == 28 and c256.num_classes == 1001


def _uvit_block_sd(sd, pfx, d, skip, mlp_hidden):
    sd[f"{pfx}.norm1.weight"] = _r(d)
    sd[f"{pfx}.norm1.bias"] = _r(d)
    sd[f"{pfx}.norm2.weight"] = _r(d)
    sd[f"{pfx}.norm2.bias"] = _r(d)
    sd[f"{pfx}.attn.qkv.weight"] = _r(3 * d, d)
    sd[f"{pfx}.attn.proj.weight"] = _r(d, d)
    sd[f"{pfx}.attn.proj.bias"] = _r(d)
    sd[f"{pfx}.mlp.fc1.weight"] = _r(mlp_hidden, d)
    sd[f"{pfx}.mlp.fc1.bias"] = _r(mlp_hidden)
    sd[f"{pfx}.mlp.fc2.weight"] = _r(d, mlp_hidden)
    sd[f"{pfx}.mlp.fc2.bias"] = _r(d)
    if skip:
        sd[f"{pfx}.skip_linear.weight"] = _r(d, 2 * d)
        sd[f"{pfx}.skip_linear.bias"] = _r(d)


def test_uvit_converter(uvit_tiny):
    cfg, model, ref_params, x, t, y = uvit_tiny
    d = cfg.embed_dim
    grid = cfg.img_size // cfg.patch_size
    mlp_hidden = int(d * cfg.mlp_ratio)
    sd = {}
    sd["patch_embed.proj.weight"] = _r(d, cfg.in_chans, cfg.patch_size, cfg.patch_size)
    sd["patch_embed.proj.bias"] = _r(d)
    sd["pos_embed"] = _r(1, 2 + grid * grid, d)
    sd["label_emb.weight"] = _r(cfg.num_classes, d)
    sd["norm.weight"] = _r(d)
    sd["norm.bias"] = _r(d)
    sd["decoder_pred.weight"] = _r(cfg.patch_size**2 * cfg.in_chans, d)
    sd["decoder_pred.bias"] = _r(cfg.patch_size**2 * cfg.in_chans)
    for i in range(cfg.depth // 2):
        _uvit_block_sd(sd, f"in_blocks.{i}", d, False, mlp_hidden)
        _uvit_block_sd(sd, f"out_blocks.{i}", d, True, mlp_hidden)
    _uvit_block_sd(sd, "mid_block", d, False, mlp_hidden)

    params = convert_uvit(sd, cfg)
    ref_flat = {"/".join(map(str, k)): v.shape for k, v in jax.tree_util.tree_flatten_with_path(ref_params)[0]}
    got_flat = {"/".join(map(str, k)): np.asarray(v).shape for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_flat == got_flat
    out = model.apply(params, x, t, y)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.fixture(scope="module")
def vae_tiny():
    cfg = AutoencoderKLConfig.tiny()
    model = AutoencoderKL(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.key(0), x, "init", jax.random.key(1))
    return cfg, model, params


def test_vae_encode_decode_shapes(vae_tiny):
    cfg, model, params = vae_tiny
    x = jax.random.uniform(jax.random.key(2), (2, 16, 16, 3), minval=-1, maxval=1)
    z = model.apply(params, x, "encode", jax.random.key(3))
    # two downsamples in tiny config (len(ch_mult)=2 -> one downsample): 16 -> 8
    assert z.shape == (2, 8, 8, cfg.embed_dim)
    rec = model.apply(params, z, "decode")
    assert rec.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(rec)))


def test_vae_moments_and_scale(vae_tiny):
    cfg, model, params = vae_tiny
    x = jnp.ones((1, 16, 16, 3)) * 0.2
    moments = model.apply(params, x, "encode_moments")
    assert moments.shape[-1] == 2 * cfg.embed_dim
    # encode applies the SD latent scale to the sampled posterior
    z1 = model.apply(params, x, "encode", jax.random.key(4))
    mean = moments[..., : cfg.embed_dim]
    assert not np.allclose(np.asarray(z1), np.asarray(mean))  # sampled, scaled


def _vae_res_sd(sd, pfx, c_in, c_out):
    sd[f"{pfx}.norm1.weight"] = _r(c_in)
    sd[f"{pfx}.norm1.bias"] = _r(c_in)
    sd[f"{pfx}.conv1.weight"] = _r(c_out, c_in, 3, 3)
    sd[f"{pfx}.conv1.bias"] = _r(c_out)
    sd[f"{pfx}.norm2.weight"] = _r(c_out)
    sd[f"{pfx}.norm2.bias"] = _r(c_out)
    sd[f"{pfx}.conv2.weight"] = _r(c_out, c_out, 3, 3)
    sd[f"{pfx}.conv2.bias"] = _r(c_out)
    if c_in != c_out:
        sd[f"{pfx}.nin_shortcut.weight"] = _r(c_out, c_in, 1, 1)
        sd[f"{pfx}.nin_shortcut.bias"] = _r(c_out)


def _vae_attn_sd(sd, pfx, c):
    sd[f"{pfx}.norm.weight"] = _r(c)
    sd[f"{pfx}.norm.bias"] = _r(c)
    for n in ("q", "k", "v", "proj_out"):
        sd[f"{pfx}.{n}.weight"] = _r(c, c, 1, 1)
        sd[f"{pfx}.{n}.bias"] = _r(c)


def test_vae_converter(vae_tiny):
    cfg, model, ref_params = vae_tiny
    ch = cfg.ch
    sd = {}
    sd["encoder.conv_in.weight"] = _r(ch, 3, 3, 3)
    sd["encoder.conv_in.bias"] = _r(ch)
    c = ch
    for lv, mult in enumerate(cfg.ch_mult):
        for i in range(cfg.num_res_blocks):
            _vae_res_sd(sd, f"encoder.down.{lv}.block.{i}", c, ch * mult)
            c = ch * mult
        if lv != len(cfg.ch_mult) - 1:
            sd[f"encoder.down.{lv}.downsample.conv.weight"] = _r(c, c, 3, 3)
            sd[f"encoder.down.{lv}.downsample.conv.bias"] = _r(c)
    _vae_res_sd(sd, "encoder.mid.block_1", c, c)
    _vae_attn_sd(sd, "encoder.mid.attn_1", c)
    _vae_res_sd(sd, "encoder.mid.block_2", c, c)
    sd["encoder.norm_out.weight"] = _r(c)
    sd["encoder.norm_out.bias"] = _r(c)
    sd["encoder.conv_out.weight"] = _r(2 * cfg.z_channels, c, 3, 3)
    sd["encoder.conv_out.bias"] = _r(2 * cfg.z_channels)

    block_in = ch * cfg.ch_mult[-1]
    sd["decoder.conv_in.weight"] = _r(block_in, cfg.z_channels, 3, 3)
    sd["decoder.conv_in.bias"] = _r(block_in)
    _vae_res_sd(sd, "decoder.mid.block_1", block_in, block_in)
    _vae_attn_sd(sd, "decoder.mid.attn_1", block_in)
    _vae_res_sd(sd, "decoder.mid.block_2", block_in, block_in)
    c = block_in
    for lv in reversed(range(len(cfg.ch_mult))):
        out_ch = ch * cfg.ch_mult[lv]
        for i in range(cfg.num_res_blocks + 1):
            _vae_res_sd(sd, f"decoder.up.{lv}.block.{i}", c, out_ch)
            c = out_ch
        if lv != 0:
            sd[f"decoder.up.{lv}.upsample.conv.weight"] = _r(c, c, 3, 3)
            sd[f"decoder.up.{lv}.upsample.conv.bias"] = _r(c)
    sd["decoder.norm_out.weight"] = _r(c)
    sd["decoder.norm_out.bias"] = _r(c)
    sd["decoder.conv_out.weight"] = _r(3, c, 3, 3)
    sd["decoder.conv_out.bias"] = _r(3)
    sd["quant_conv.weight"] = _r(2 * cfg.embed_dim, 2 * cfg.z_channels, 1, 1)
    sd["quant_conv.bias"] = _r(2 * cfg.embed_dim)
    sd["post_quant_conv.weight"] = _r(cfg.z_channels, cfg.embed_dim, 1, 1)
    sd["post_quant_conv.bias"] = _r(cfg.z_channels)

    params = convert_autoencoder_kl(sd, cfg)
    ref_flat = {"/".join(map(str, k)): v.shape for k, v in jax.tree_util.tree_flatten_with_path(ref_params)[0]}
    got_flat = {"/".join(map(str, k)): np.asarray(v).shape for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_flat == got_flat
    z = model.apply(params, jnp.ones((1, 16, 16, 3)), "encode", jax.random.key(5))
    rec = model.apply(params, z, "decode")
    assert bool(jnp.all(jnp.isfinite(rec)))


def test_uvit_huge_param_count():
    """U-ViT-huge should land at ~500M params (sanity vs the paper's 501M)."""
    cfg = UViTConfig.imagenet256()
    model = UViT(cfg)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 32, 32, 4)), jnp.asarray(0), jnp.zeros((1,), jnp.int32)),
        jax.random.key(0),
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 450e6 < n < 560e6, n
