"""Strict PyTorch-state-dict → flax-params converters for the model zoo.

One converter per reference checkpoint family:

  ``convert_adm_unet``        — guided-diffusion ``UNetModel`` (64x64/128x128
                                _diffusion.pt; ``unet_openai.py:397-666``)
  ``convert_adm_classifier``  — ``EncoderUNetModel`` + AttentionPool2d
                                (``unet_openai.py:685-786``)
  ``convert_unet2d``          — diffusers ``UNet2DModel`` (ddpm-cifar10-32)
  ``convert_sd_unet``         — diffusers ``UNet2DConditionModel`` (SD1.x
                                conv-projection and SD2.x linear-projection
                                transformer layouts)
  ``convert_uvit``            — U-ViT-huge (``uvit/uvit.py:138-231``)
  ``convert_autoencoder_kl``  — SD KL-f8 VAE (``uvit/autoencoder.py``)

All converters are STRICT both ways: a missing torch key raises
``KeyError("missing …")`` at the exact layer, a leftover key raises
``ValueError("unconsumed …")`` — so layout drift in either implementation is
caught by the structure tests, not at sampling time.

Layout rules (torch → flax):
  Conv2d  [out,in,kh,kw] → [kh,kw,in,out];  Linear [out,in] → [in,out];
  Conv1d  [out,in,1]     → squeeze → Linear;  1×1 Conv2d ≡ Linear when the
  flax side is a Dense (VAE attention, SD transformer projections).

The one genuinely tricky case is ADM's two attention-weight orders
(``unet_openai.py:329-395``): the *legacy* order packs qkv per-head
(rows ``[q_h0|k_h0|v_h0|q_h1|…]``), the *new* order packs qkv-major. Our
kernel is qkv-major/head-major, so legacy checkpoints get their qkv rows
permuted by ``_legacy_qkv_permutation`` — verified bit-exact against a
hand-rolled legacy attention in ``tests/test_convert.py`` and per-block
against the reference torch model in ``utils/activation_diff.py``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "convert_adm_unet",
    "convert_adm_classifier",
    "convert_unet2d",
    "convert_sd_unet",
    "convert_sd3_mmdit",
    "convert_flux",
    "convert_uvit",
    "convert_autoencoder_kl",
    "convert_clip_text",
    "convert_t5_encoder",
]


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into {key: float32-preserving ndarray}."""
    import torch

    obj = torch.load(Path(path), map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            v = v.detach().float().numpy()
        out[k] = np.asarray(v)
    return out


class _SD:
    """Popping view over a torch state dict with strict accounting."""

    def __init__(self, sd: dict):
        self.sd = dict(sd)

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"missing torch key: {key}")
        return np.asarray(self.sd.pop(key), np.float32)

    def has(self, key: str) -> bool:
        return key in self.sd

    def finish(self) -> None:
        if self.sd:
            extra = sorted(self.sd)[:8]
            raise ValueError(f"unconsumed torch keys ({len(self.sd)}): {extra}")


def _conv(sd: _SD, pfx: str) -> dict:
    return {"kernel": sd.take(f"{pfx}.weight").transpose(2, 3, 1, 0), "bias": sd.take(f"{pfx}.bias")}


def _dense(sd: _SD, pfx: str, bias: bool = True) -> dict:
    out = {"kernel": sd.take(f"{pfx}.weight").T}
    if bias:
        out["bias"] = sd.take(f"{pfx}.bias")
    return out


def _dense_from_conv1x1(sd: _SD, pfx: str, bias: bool = True) -> dict:
    w = sd.take(f"{pfx}.weight")
    out = {"kernel": w.reshape(w.shape[0], w.shape[1]).T}
    if bias:
        out["bias"] = sd.take(f"{pfx}.bias")
    return out


def _layernorm(sd: _SD, pfx: str) -> dict:
    return {"scale": sd.take(f"{pfx}.weight"), "bias": sd.take(f"{pfx}.bias")}


def _legacy_qkv_permutation(channels: int, heads: int) -> np.ndarray:
    """Row permutation taking legacy head-major qkv weights (rows
    ``h*3d + s*d + j``, ``QKVAttentionLegacy`` reshape ``(B*H, 3d, T)``) to
    qkv-major layout (rows ``s*C + h*d + j``)."""
    d = channels // heads
    perm = np.empty(3 * channels, np.int64)
    for s in range(3):
        for h in range(heads):
            for j in range(d):
                perm[s * channels + h * d + j] = h * 3 * d + s * d + j
    return perm


# ---------------------------------------------------------------------------
# ADM (guided-diffusion)
# ---------------------------------------------------------------------------


def _adm_resblock(sd: _SD, pfx: str, c_in: int, c_out: int, scale_shift: bool = True) -> dict:
    """``ResBlock`` key layout: in_layers = [GN, SiLU, conv], emb_layers =
    [SiLU, linear], out_layers = [GN, SiLU, dropout, conv]
    (``unet_openai.py:175-205``)."""
    p = {
        "in_norm_scale": sd.take(f"{pfx}.in_layers.0.weight"),
        "in_norm_bias": sd.take(f"{pfx}.in_layers.0.bias"),
        "in_conv": _conv(sd, f"{pfx}.in_layers.2"),
        "emb_proj": _dense(sd, f"{pfx}.emb_layers.1"),
        "out_norm_scale": sd.take(f"{pfx}.out_layers.0.weight"),
        "out_norm_bias": sd.take(f"{pfx}.out_layers.0.bias"),
        "out_conv": _conv(sd, f"{pfx}.out_layers.3"),
    }
    if c_in != c_out:
        p["skip"] = _conv(sd, f"{pfx}.skip_connection")
    return p


def _adm_attention(sd: _SD, pfx: str, channels: int, heads: int, legacy: bool) -> dict:
    qkv_w = sd.take(f"{pfx}.qkv.weight").reshape(3 * channels, channels)  # conv1d
    qkv_b = sd.take(f"{pfx}.qkv.bias")
    if legacy:
        perm = _legacy_qkv_permutation(channels, heads)
        qkv_w, qkv_b = qkv_w[perm], qkv_b[perm]
    proj_w = sd.take(f"{pfx}.proj_out.weight").reshape(channels, channels)
    return {
        "norm": {"GroupNorm_0": {"scale": sd.take(f"{pfx}.norm.weight"), "bias": sd.take(f"{pfx}.norm.bias")}},
        "qkv": {"kernel": qkv_w.T, "bias": qkv_b},
        "proj_out": {"kernel": proj_w.T, "bias": sd.take(f"{pfx}.proj_out.bias")},
    }


def _adm_heads(cfg, ch: int, upsample: bool) -> int:
    if cfg.num_head_channels > 0:
        return ch // cfg.num_head_channels
    if upsample and getattr(cfg, "num_heads_upsample", -1) > 0:
        return cfg.num_heads_upsample
    return cfg.num_heads


def convert_adm_unet(state_dict: dict, cfg) -> dict:
    """guided-diffusion ``UNetModel`` → ``ADMUNet`` params (walks the same
    block program as ``ADMUNet.__call__`` so indices line up by construction)."""
    sd = _SD(state_dict)
    legacy = not cfg.use_new_attention_order
    mc = cfg.model_channels
    P: dict = {
        "time_dense_0": _dense(sd, "time_embed.0"),
        "time_dense_1": _dense(sd, "time_embed.2"),
        "conv_in": _conv(sd, "input_blocks.0.0"),
    }
    if cfg.num_classes is not None:
        P["label_emb"] = {"embedding": sd.take("label_emb.weight")}

    ds, ch, idx = 1, mc, 1
    input_chs = [mc]
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            P[f"in_{idx}_res"] = _adm_resblock(sd, f"input_blocks.{idx}.0", ch, mult * mc)
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                P[f"in_{idx}_attn"] = _adm_attention(
                    sd, f"input_blocks.{idx}.1", ch, _adm_heads(cfg, ch, False), legacy
                )
            input_chs.append(ch)
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                P[f"in_{idx}_down"] = _adm_resblock(sd, f"input_blocks.{idx}.0", ch, ch)
            else:
                # standalone Downsample stores its conv as ``op`` (unet_openai.py)
                P[f"in_{idx}_down"] = {"op": _conv(sd, f"input_blocks.{idx}.0.op")}
            input_chs.append(ch)
            idx += 1
            ds *= 2

    P["mid_res_0"] = _adm_resblock(sd, "middle_block.0", ch, ch)
    P["mid_attn"] = _adm_attention(sd, "middle_block.1", ch, _adm_heads(cfg, ch, False), legacy)
    P["mid_res_1"] = _adm_resblock(sd, "middle_block.2", ch, ch)

    out_idx = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            skip = input_chs.pop()
            P[f"out_{out_idx}_res"] = _adm_resblock(
                sd, f"output_blocks.{out_idx}.0", ch + skip, mult * mc
            )
            ch = mult * mc
            sub = 1
            if ds in cfg.attention_resolutions:
                P[f"out_{out_idx}_attn"] = _adm_attention(
                    sd, f"output_blocks.{out_idx}.{sub}", ch, _adm_heads(cfg, ch, True), legacy
                )
                sub += 1
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    P[f"out_{out_idx}_up"] = _adm_resblock(
                        sd, f"output_blocks.{out_idx}.{sub}", ch, ch
                    )
                else:
                    # standalone Upsample stores its conv as ``conv`` — NOT
                    # ``op`` like Downsample (asymmetry verified per-block in
                    # utils/activation_diff.py)
                    P[f"out_{out_idx}_up"] = {"op": _conv(sd, f"output_blocks.{out_idx}.{sub}.conv")}
                ds //= 2
            out_idx += 1

    P["out_norm_scale"] = sd.take("out.0.weight")
    P["out_norm_bias"] = sd.take("out.0.bias")
    P["conv_out"] = _conv(sd, "out.2")
    sd.finish()
    return {"params": P}


def convert_adm_classifier(state_dict: dict, cfg) -> dict:
    """``EncoderUNetModel`` (pool='attention') → ``ADMClassifier`` params.
    The pool head is ``AttentionPool2d``: positional_embedding [C, HW+1],
    conv1d qkv_proj/c_proj, new-order attention (``unet_openai.py:50-80``)."""
    sd = _SD(state_dict)
    mc = cfg.model_channels
    P: dict = {
        "time_dense_0": _dense(sd, "time_embed.0"),
        "time_dense_1": _dense(sd, "time_embed.2"),
        "conv_in": _conv(sd, "input_blocks.0.0"),
    }
    ds, ch, idx = 1, mc, 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            P[f"in_{idx}_res"] = _adm_resblock(sd, f"input_blocks.{idx}.0", ch, mult * mc)
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                P[f"in_{idx}_attn"] = _adm_attention(
                    sd, f"input_blocks.{idx}.1", ch, ch // cfg.num_head_channels, legacy=False
                )
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                P[f"in_{idx}_down"] = _adm_resblock(sd, f"input_blocks.{idx}.0", ch, ch)
            else:
                P[f"in_{idx}_down"] = {"op": _conv(sd, f"input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    P["mid_res_0"] = _adm_resblock(sd, "middle_block.0", ch, ch)
    P["mid_attn"] = _adm_attention(sd, "middle_block.1", ch, ch // cfg.num_head_channels, False)
    P["mid_res_1"] = _adm_resblock(sd, "middle_block.2", ch, ch)

    P["out_norm_scale"] = sd.take("out.0.weight")
    P["out_norm_bias"] = sd.take("out.0.bias")
    qkv_w = sd.take("out.2.qkv_proj.weight").reshape(3 * ch, ch)
    c_w = sd.take("out.2.c_proj.weight")
    c_w = c_w.reshape(c_w.shape[0], ch)
    P["pool"] = {
        "positional_embedding": sd.take("out.2.positional_embedding").T,  # [C,HW+1] -> [HW+1,C]
        "qkv": {"kernel": qkv_w.T, "bias": sd.take("out.2.qkv_proj.bias")},
        "proj": {"kernel": c_w.T, "bias": sd.take("out.2.c_proj.bias")},
    }
    sd.finish()
    return {"params": P}


# ---------------------------------------------------------------------------
# HF diffusers UNet2DModel (DDPM CIFAR-10)
# ---------------------------------------------------------------------------


def _hf_resnet(sd: _SD, pfx: str, c_in: int, c_out: int) -> dict:
    p = {
        "norm1_scale": sd.take(f"{pfx}.norm1.weight"),
        "norm1_bias": sd.take(f"{pfx}.norm1.bias"),
        "conv1": _conv(sd, f"{pfx}.conv1"),
        "time_emb_proj": _dense(sd, f"{pfx}.time_emb_proj"),
        "norm2_scale": sd.take(f"{pfx}.norm2.weight"),
        "norm2_bias": sd.take(f"{pfx}.norm2.bias"),
        "conv2": _conv(sd, f"{pfx}.conv2"),
    }
    if c_in != c_out:
        p["conv_shortcut"] = _conv(sd, f"{pfx}.conv_shortcut")
    return p


def _hf_attention(sd: _SD, pfx: str) -> dict:
    return {
        "norm_scale": sd.take(f"{pfx}.group_norm.weight"),
        "norm_bias": sd.take(f"{pfx}.group_norm.bias"),
        "to_q": _dense(sd, f"{pfx}.query"),
        "to_k": _dense(sd, f"{pfx}.key"),
        "to_v": _dense(sd, f"{pfx}.value"),
        "to_out": _dense(sd, f"{pfx}.proj_attn"),
    }


def convert_unet2d(state_dict: dict, cfg) -> dict:
    """diffusers ``UNet2DModel`` (google/ddpm-cifar10-32 layout) → ``UNet2D``."""
    sd = _SD(state_dict)
    P: dict = {
        "time_dense_0": _dense(sd, "time_embedding.linear_1"),
        "time_dense_1": _dense(sd, "time_embedding.linear_2"),
        "conv_in": _conv(sd, "conv_in"),
    }
    ch = cfg.block_out_channels[0]
    for bi, (btype, out_ch) in enumerate(zip(cfg.down_block_types, cfg.block_out_channels)):
        for li in range(cfg.layers_per_block):
            P[f"down_{bi}_res_{li}"] = _hf_resnet(sd, f"down_blocks.{bi}.resnets.{li}", ch, out_ch)
            ch = out_ch
            if btype == "AttnDownBlock2D":
                P[f"down_{bi}_attn_{li}"] = _hf_attention(sd, f"down_blocks.{bi}.attentions.{li}")
        if bi != len(cfg.down_block_types) - 1:
            P[f"down_{bi}_downsample"] = {"conv": _conv(sd, f"down_blocks.{bi}.downsamplers.0.conv")}

    P["mid_res_0"] = _hf_resnet(sd, "mid_block.resnets.0", ch, ch)
    P["mid_attn"] = _hf_attention(sd, "mid_block.attentions.0")
    P["mid_res_1"] = _hf_resnet(sd, "mid_block.resnets.1", ch, ch)

    skip_chs = [cfg.block_out_channels[0]]
    for bi, out_ch in enumerate(cfg.block_out_channels):
        skip_chs.extend([out_ch] * cfg.layers_per_block)
        if bi != len(cfg.block_out_channels) - 1:
            skip_chs.append(out_ch)
    rev = tuple(reversed(cfg.block_out_channels))
    for bi, (btype, out_ch) in enumerate(zip(cfg.up_block_types, rev)):
        for li in range(cfg.layers_per_block + 1):
            skip = skip_chs.pop()
            P[f"up_{bi}_res_{li}"] = _hf_resnet(sd, f"up_blocks.{bi}.resnets.{li}", ch + skip, out_ch)
            ch = out_ch
            if btype == "AttnUpBlock2D":
                P[f"up_{bi}_attn_{li}"] = _hf_attention(sd, f"up_blocks.{bi}.attentions.{li}")
        if bi != len(cfg.up_block_types) - 1:
            P[f"up_{bi}_upsample"] = _conv(sd, f"up_blocks.{bi}.upsamplers.0.conv")

    P["out_norm_scale"] = sd.take("conv_norm_out.weight")
    P["out_norm_bias"] = sd.take("conv_norm_out.bias")
    P["conv_out"] = _conv(sd, "conv_out")
    sd.finish()
    return {"params": P}


# ---------------------------------------------------------------------------
# SD UNet (diffusers UNet2DConditionModel)
# ---------------------------------------------------------------------------


def _sd_xattn(sd: _SD, pfx: str) -> dict:
    return {
        "to_q": _dense(sd, f"{pfx}.to_q", bias=False),
        "to_k": _dense(sd, f"{pfx}.to_k", bias=False),
        "to_v": _dense(sd, f"{pfx}.to_v", bias=False),
        "to_out": _dense(sd, f"{pfx}.to_out.0"),
    }


def _sd_transformer(sd: _SD, pfx: str, depth: int, linear_proj: bool) -> dict:
    proj = _dense if linear_proj else _dense_from_conv1x1
    p = {
        "norm_scale": sd.take(f"{pfx}.norm.weight"),
        "norm_bias": sd.take(f"{pfx}.norm.bias"),
        "proj_in": proj(sd, f"{pfx}.proj_in"),
        "proj_out": proj(sd, f"{pfx}.proj_out"),
    }
    for k in range(depth):
        b = f"{pfx}.transformer_blocks.{k}"
        p[f"block_{k}"] = {
            "norm1": _layernorm(sd, f"{b}.norm1"),
            "attn1": _sd_xattn(sd, f"{b}.attn1"),
            "norm2": _layernorm(sd, f"{b}.norm2"),
            "attn2": _sd_xattn(sd, f"{b}.attn2"),
            "norm3": _layernorm(sd, f"{b}.norm3"),
            "ff_proj": _dense(sd, f"{b}.ff.net.0.proj"),
            "ff_out": _dense(sd, f"{b}.ff.net.2"),
        }
    return p


def convert_sd_unet(state_dict: dict, cfg) -> dict:
    """diffusers ``UNet2DConditionModel`` → ``SDUNet`` params. Handles both
    the SD1.x conv-1×1 and SD2.x linear transformer projection layouts."""
    sd = _SD(state_dict)
    depth = cfg.transformer_layers_per_block
    lin = cfg.use_linear_projection
    P: dict = {
        "time_dense_0": _dense(sd, "time_embedding.linear_1"),
        "time_dense_1": _dense(sd, "time_embedding.linear_2"),
        "conv_in": _conv(sd, "conv_in"),
    }
    ch = cfg.block_out_channels[0]
    for bi, (btype, out_ch) in enumerate(zip(cfg.down_block_types, cfg.block_out_channels)):
        for li in range(cfg.layers_per_block):
            P[f"down_{bi}_res_{li}"] = _hf_resnet(sd, f"down_blocks.{bi}.resnets.{li}", ch, out_ch)
            ch = out_ch
            if btype == "CrossAttnDownBlock2D":
                P[f"down_{bi}_attn_{li}"] = _sd_transformer(
                    sd, f"down_blocks.{bi}.attentions.{li}", depth, lin
                )
        if bi != len(cfg.down_block_types) - 1:
            P[f"down_{bi}_downsample"] = _conv(sd, f"down_blocks.{bi}.downsamplers.0.conv")

    P["mid_res_0"] = _hf_resnet(sd, "mid_block.resnets.0", ch, ch)
    P["mid_attn_0"] = _sd_transformer(sd, "mid_block.attentions.0", depth, lin)
    P["mid_res_1"] = _hf_resnet(sd, "mid_block.resnets.1", ch, ch)

    skip_chs = [cfg.block_out_channels[0]]
    for bi, out_ch in enumerate(cfg.block_out_channels):
        skip_chs.extend([out_ch] * cfg.layers_per_block)
        if bi != len(cfg.block_out_channels) - 1:
            skip_chs.append(out_ch)
    rev = tuple(reversed(cfg.block_out_channels))
    for bi, (btype, out_ch) in enumerate(zip(cfg.up_block_types, rev)):
        for li in range(cfg.layers_per_block + 1):
            skip = skip_chs.pop()
            P[f"up_{bi}_res_{li}"] = _hf_resnet(sd, f"up_blocks.{bi}.resnets.{li}", ch + skip, out_ch)
            ch = out_ch
            if btype == "CrossAttnUpBlock2D":
                P[f"up_{bi}_attn_{li}"] = _sd_transformer(
                    sd, f"up_blocks.{bi}.attentions.{li}", depth, lin
                )
        if bi != len(cfg.up_block_types) - 1:
            P[f"up_{bi}_upsample"] = _conv(sd, f"up_blocks.{bi}.upsamplers.0.conv")

    P["out_norm_scale"] = sd.take("conv_norm_out.weight")
    P["out_norm_bias"] = sd.take("conv_norm_out.bias")
    P["conv_out"] = _conv(sd, "conv_out")
    sd.finish()
    return {"params": P}


# ---------------------------------------------------------------------------
# SD3 MMDiT (diffusers SD3Transformer2DModel)
# ---------------------------------------------------------------------------


def convert_sd3_mmdit(state_dict: dict, cfg) -> dict:
    """diffusers ``SD3Transformer2DModel`` → flax ``MMDiT`` params. The last
    transformer block is ``context_pre_only`` (AdaLN-Continuous context norm,
    no context attention output / FF)."""
    sd = _SD(state_dict)
    P: dict = {
        "patch_embed": {
            "kernel": sd.take("pos_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": sd.take("pos_embed.proj.bias"),
        },
        "pos_embed": sd.take("pos_embed.pos_embed").reshape(1, cfg.pos_embed_max_size**2, cfg.dim),
        "time_text_embed": {
            "timestep_dense_0": _dense(sd, "time_text_embed.timestep_embedder.linear_1"),
            "timestep_dense_1": _dense(sd, "time_text_embed.timestep_embedder.linear_2"),
            "text_dense_0": _dense(sd, "time_text_embed.text_embedder.linear_1"),
            "text_dense_1": _dense(sd, "time_text_embed.text_embedder.linear_2"),
        },
        "context_embedder": _dense(sd, "context_embedder"),
        "norm_out_linear": _dense(sd, "norm_out.linear"),
        "proj_out": _dense(sd, "proj_out"),
    }
    for i in range(cfg.num_layers):
        t = f"transformer_blocks.{i}"
        last = i == cfg.num_layers - 1
        blk = {
            "norm1_linear": _dense(sd, f"{t}.norm1.linear"),
            "norm1_context_linear": _dense(sd, f"{t}.norm1_context.linear"),
            "to_q": _dense(sd, f"{t}.attn.to_q"),
            "to_k": _dense(sd, f"{t}.attn.to_k"),
            "to_v": _dense(sd, f"{t}.attn.to_v"),
            "add_q_proj": _dense(sd, f"{t}.attn.add_q_proj"),
            "add_k_proj": _dense(sd, f"{t}.attn.add_k_proj"),
            "add_v_proj": _dense(sd, f"{t}.attn.add_v_proj"),
            "to_out": _dense(sd, f"{t}.attn.to_out.0"),
            "ff_proj": _dense(sd, f"{t}.ff.net.0.proj"),
            "ff_out": _dense(sd, f"{t}.ff.net.2"),
        }
        if cfg.qk_norm == "rms_norm":
            blk["qk_norm"] = {
                "q_scale": sd.take(f"{t}.attn.norm_q.weight"),
                "k_scale": sd.take(f"{t}.attn.norm_k.weight"),
            }
            blk["qk_norm_added"] = {
                "added_q_scale": sd.take(f"{t}.attn.norm_added_q.weight"),
                "added_k_scale": sd.take(f"{t}.attn.norm_added_k.weight"),
            }
        if not last:
            blk["to_add_out"] = _dense(sd, f"{t}.attn.to_add_out")
            blk["ff_context_proj"] = _dense(sd, f"{t}.ff_context.net.0.proj")
            blk["ff_context_out"] = _dense(sd, f"{t}.ff_context.net.2")
        P[f"block_{i}"] = blk
    sd.finish()
    return {"params": P}


# ---------------------------------------------------------------------------
# Flux (diffusers FluxTransformer2DModel)
# ---------------------------------------------------------------------------


def _flux_token_perm(channels: int) -> np.ndarray:
    """diffusers ``_pack_latents`` orders each 2×2 token's features
    channel-major ``(c, p1, p2)``; our in-model packing is patch-major
    ``(p1, p2, c)`` (flux.py). perm[ours] = theirs, length 4·C."""
    perm = np.empty(4 * channels, np.int64)
    i = 0
    for p1 in range(2):
        for p2 in range(2):
            for c in range(channels):
                perm[i] = c * 4 + p1 * 2 + p2
                i += 1
    return perm


def convert_flux(state_dict: dict, cfg) -> dict:
    """diffusers ``FluxTransformer2DModel`` → flax ``FluxTransformer`` params
    (19 double + 38 single blocks, RMS-normed q/k everywhere). The token
    packing order differs from diffusers (see ``_flux_token_perm``), so the
    x_embedder input rows and proj_out output columns are permuted."""
    sd = _SD(state_dict)
    perm = _flux_token_perm(cfg.in_channels)
    x_emb = _dense(sd, "x_embedder")
    x_emb["kernel"] = x_emb["kernel"][perm]
    head = _dense(sd, "proj_out")
    head["kernel"] = head["kernel"][:, perm]
    head["bias"] = head["bias"][perm]
    P: dict = {
        "x_embedder": x_emb,
        "context_embedder": _dense(sd, "context_embedder"),
        "timestep_dense_0": _dense(sd, "time_text_embed.timestep_embedder.linear_1"),
        "timestep_dense_1": _dense(sd, "time_text_embed.timestep_embedder.linear_2"),
        "text_dense_0": _dense(sd, "time_text_embed.text_embedder.linear_1"),
        "text_dense_1": _dense(sd, "time_text_embed.text_embedder.linear_2"),
        "norm_out_linear": _dense(sd, "norm_out.linear"),
        "proj_out": head,
    }
    if cfg.guidance_embeds:
        P["guidance_dense_0"] = _dense(sd, "time_text_embed.guidance_embedder.linear_1")
        P["guidance_dense_1"] = _dense(sd, "time_text_embed.guidance_embedder.linear_2")
    for i in range(cfg.num_layers):
        t = f"transformer_blocks.{i}"
        P[f"block_{i}"] = {
            "norm1_linear": _dense(sd, f"{t}.norm1.linear"),
            "norm1_context_linear": _dense(sd, f"{t}.norm1_context.linear"),
            "to_q": _dense(sd, f"{t}.attn.to_q"),
            "to_k": _dense(sd, f"{t}.attn.to_k"),
            "to_v": _dense(sd, f"{t}.attn.to_v"),
            "q_scale": sd.take(f"{t}.attn.norm_q.weight"),
            "k_scale": sd.take(f"{t}.attn.norm_k.weight"),
            "add_q_proj": _dense(sd, f"{t}.attn.add_q_proj"),
            "add_k_proj": _dense(sd, f"{t}.attn.add_k_proj"),
            "add_v_proj": _dense(sd, f"{t}.attn.add_v_proj"),
            "added_q_scale": sd.take(f"{t}.attn.norm_added_q.weight"),
            "added_k_scale": sd.take(f"{t}.attn.norm_added_k.weight"),
            "to_out": _dense(sd, f"{t}.attn.to_out.0"),
            "to_add_out": _dense(sd, f"{t}.attn.to_add_out"),
            "ff_proj": _dense(sd, f"{t}.ff.net.0.proj"),
            "ff_out": _dense(sd, f"{t}.ff.net.2"),
            "ff_context_proj": _dense(sd, f"{t}.ff_context.net.0.proj"),
            "ff_context_out": _dense(sd, f"{t}.ff_context.net.2"),
        }
    for i in range(cfg.num_single_layers):
        t = f"single_transformer_blocks.{i}"
        P[f"single_block_{i}"] = {
            "norm_linear": _dense(sd, f"{t}.norm.linear"),
            "to_q": _dense(sd, f"{t}.attn.to_q"),
            "to_k": _dense(sd, f"{t}.attn.to_k"),
            "to_v": _dense(sd, f"{t}.attn.to_v"),
            "q_scale": sd.take(f"{t}.attn.norm_q.weight"),
            "k_scale": sd.take(f"{t}.attn.norm_k.weight"),
            "proj_mlp": _dense(sd, f"{t}.proj_mlp"),
            "proj_out": _dense(sd, f"{t}.proj_out"),
        }
    sd.finish()
    return {"params": P}


# ---------------------------------------------------------------------------
# U-ViT
# ---------------------------------------------------------------------------


def _uvit_block(sd: _SD, pfx: str, qkv_bias: bool, skip: bool) -> dict:
    p = {
        "norm1": _layernorm(sd, f"{pfx}.norm1"),
        "norm2": _layernorm(sd, f"{pfx}.norm2"),
        "attn": {
            "qkv": _dense(sd, f"{pfx}.attn.qkv", bias=qkv_bias),
            "proj": _dense(sd, f"{pfx}.attn.proj"),
        },
        "mlp_fc1": _dense(sd, f"{pfx}.mlp.fc1"),
        "mlp_fc2": _dense(sd, f"{pfx}.mlp.fc2"),
    }
    if skip:
        p["skip_linear"] = _dense(sd, f"{pfx}.skip_linear")
    return p


def convert_uvit(state_dict: dict, cfg) -> dict:
    """Reference ``UViT`` → flax ``UViT`` params. The fused qkv weight is
    already K-major/head-major in both implementations — no permutation."""
    sd = _SD(state_dict)
    P: dict = {
        "patch_embed": {
            "kernel": sd.take("patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": sd.take("patch_embed.proj.bias"),
        },
        "pos_embed": sd.take("pos_embed"),
        "norm": _layernorm(sd, "norm"),
        "decoder_pred": _dense(sd, "decoder_pred"),
    }
    if cfg.num_classes:
        P["label_emb"] = {"embedding": sd.take("label_emb.weight")}
    if cfg.mlp_time_embed:
        P["time_dense_0"] = _dense(sd, "time_embed.0")
        P["time_dense_1"] = _dense(sd, "time_embed.2")
    for i in range(cfg.depth // 2):
        P[f"in_block_{i}"] = _uvit_block(sd, f"in_blocks.{i}", cfg.qkv_bias, skip=False)
        P[f"out_block_{i}"] = _uvit_block(sd, f"out_blocks.{i}", cfg.qkv_bias, skip=True)
    P["mid_block"] = _uvit_block(sd, "mid_block", cfg.qkv_bias, skip=False)
    if cfg.final_conv:
        P["final_layer"] = _conv(sd, "final_layer")
    sd.finish()
    return {"params": P}


# ---------------------------------------------------------------------------
# KL autoencoder
# ---------------------------------------------------------------------------


def _vae_resblock(sd: _SD, pfx: str, c_in: int, c_out: int) -> dict:
    p = {
        "norm1_scale": sd.take(f"{pfx}.norm1.weight"),
        "norm1_bias": sd.take(f"{pfx}.norm1.bias"),
        "conv1": _conv(sd, f"{pfx}.conv1"),
        "norm2_scale": sd.take(f"{pfx}.norm2.weight"),
        "norm2_bias": sd.take(f"{pfx}.norm2.bias"),
        "conv2": _conv(sd, f"{pfx}.conv2"),
    }
    if c_in != c_out:
        p["nin_shortcut"] = _conv(sd, f"{pfx}.nin_shortcut")
    return p


def _vae_attn(sd: _SD, pfx: str) -> dict:
    return {
        "norm_scale": sd.take(f"{pfx}.norm.weight"),
        "norm_bias": sd.take(f"{pfx}.norm.bias"),
        "q": _dense_from_conv1x1(sd, f"{pfx}.q"),
        "k": _dense_from_conv1x1(sd, f"{pfx}.k"),
        "v": _dense_from_conv1x1(sd, f"{pfx}.v"),
        "proj_out": _dense_from_conv1x1(sd, f"{pfx}.proj_out"),
    }


def convert_autoencoder_kl(state_dict: dict, cfg) -> dict:
    """CompVis KL-f8 VAE state dict (``uvit/autoencoder.py`` key layout) →
    flax ``AutoencoderKL`` params."""
    sd = _SD(state_dict)
    ch = cfg.ch

    enc: dict = {"conv_in": _conv(sd, "encoder.conv_in")}
    c = ch
    for lv, mult in enumerate(cfg.ch_mult):
        for i in range(cfg.num_res_blocks):
            enc[f"down_{lv}_block_{i}"] = _vae_resblock(sd, f"encoder.down.{lv}.block.{i}", c, ch * mult)
            c = ch * mult
        if lv != len(cfg.ch_mult) - 1:
            enc[f"down_{lv}_downsample"] = _conv(sd, f"encoder.down.{lv}.downsample.conv")
    enc["mid_block_1"] = _vae_resblock(sd, "encoder.mid.block_1", c, c)
    enc["mid_attn_1"] = _vae_attn(sd, "encoder.mid.attn_1")
    enc["mid_block_2"] = _vae_resblock(sd, "encoder.mid.block_2", c, c)
    enc["norm_out_scale"] = sd.take("encoder.norm_out.weight")
    enc["norm_out_bias"] = sd.take("encoder.norm_out.bias")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    block_in = ch * cfg.ch_mult[-1]
    dec: dict = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid_block_1"] = _vae_resblock(sd, "decoder.mid.block_1", block_in, block_in)
    dec["mid_attn_1"] = _vae_attn(sd, "decoder.mid.attn_1")
    dec["mid_block_2"] = _vae_resblock(sd, "decoder.mid.block_2", block_in, block_in)
    c = block_in
    for lv in reversed(range(len(cfg.ch_mult))):
        out_ch = ch * cfg.ch_mult[lv]
        for i in range(cfg.num_res_blocks + 1):
            dec[f"up_{lv}_block_{i}"] = _vae_resblock(sd, f"decoder.up.{lv}.block.{i}", c, out_ch)
            c = out_ch
        if lv != 0:
            dec[f"up_{lv}_upsample"] = _conv(sd, f"decoder.up.{lv}.upsample.conv")
    dec["norm_out_scale"] = sd.take("decoder.norm_out.weight")
    dec["norm_out_bias"] = sd.take("decoder.norm_out.bias")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    P = {"encoder": enc, "decoder": dec}
    # SD3/Flux VAEs (``AutoencoderKLConfig.sd3_kl``/``flux_kl``) drop the
    # (post_)quant convs — their diffusers checkpoints have no such keys
    if getattr(cfg, "use_quant_conv", True):
        P["quant_conv"] = _conv(sd, "quant_conv")
        P["post_quant_conv"] = _conv(sd, "post_quant_conv")
    sd.finish()
    return {"params": P}


def convert_clip_text(state_dict: dict, cfg) -> dict:
    """transformers ``CLIPTextModel`` state dict -> flax ``CLIPTextEncoder``
    params (the SD1.5 conditioning tower; exercised against a synthetic
    random-init torch model so real weights convert unmodified the day they
    are mountable — reference encode_prompt usage,
    ``pipeline_stable_diffusion_uncertainty_guided.py:577``)."""
    sd = _SD(state_dict)
    pfx = "text_model"
    P: dict = {
        "token_embedding": {"embedding": sd.take(f"{pfx}.embeddings.token_embedding.weight")},
        "position_embedding": sd.take(f"{pfx}.embeddings.position_embedding.weight"),
        "final_layer_norm": _layernorm(sd, f"{pfx}.final_layer_norm"),
    }
    for i in range(cfg.num_layers):
        b = f"{pfx}.encoder.layers.{i}"
        P[f"layer_{i}"] = {
            "layer_norm1": _layernorm(sd, f"{b}.layer_norm1"),
            "layer_norm2": _layernorm(sd, f"{b}.layer_norm2"),
            "self_attn": {
                "q_proj": _dense(sd, f"{b}.self_attn.q_proj"),
                "k_proj": _dense(sd, f"{b}.self_attn.k_proj"),
                "v_proj": _dense(sd, f"{b}.self_attn.v_proj"),
                "out_proj": _dense(sd, f"{b}.self_attn.out_proj"),
            },
            "fc1": _dense(sd, f"{b}.mlp.fc1"),
            "fc2": _dense(sd, f"{b}.mlp.fc2"),
        }
    # CLIPTextModelWithProjection (SD3/Flux towers incl. CLIP-G): the no-bias
    # pooled projection
    if getattr(cfg, "projection_dim", 0) > 0:
        P["text_projection"] = _dense(sd, "text_projection", bias=False)
    # transformers registers a position_ids buffer in some versions; consume
    # it so strict accounting passes either way
    sd.sd.pop(f"{pfx}.embeddings.position_ids", None)
    sd.finish()
    return {"params": P}


def convert_t5_encoder(state_dict: dict, cfg) -> dict:
    """transformers ``T5EncoderModel`` state dict -> flax ``T5Encoder`` params
    (SD3's text_encoder_3 / Flux's text_encoder_2, t5-v1_1-xxl —
    ``pipeline_stable_diffusion_3_uncertainty_guided.py:118-121``,
    ``pipeline_flux_uncertainty.py:60``)."""
    sd = _SD(state_dict)
    # encoder.embed_tokens.weight aliases shared.weight; consume both
    shared = sd.take("shared.weight")
    if sd.has("encoder.embed_tokens.weight"):
        sd.take("encoder.embed_tokens.weight")
    P: dict = {
        "token_embedding": {"embedding": shared},
        "relative_attention_bias": sd.take(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "final_layer_norm": {"weight": sd.take("encoder.final_layer_norm.weight")},
    }
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}"
        blk = {
            "attn_norm": {"weight": sd.take(f"{b}.layer.0.layer_norm.weight")},
            "attention": {
                "q": _dense(sd, f"{b}.layer.0.SelfAttention.q", bias=False),
                "k": _dense(sd, f"{b}.layer.0.SelfAttention.k", bias=False),
                "v": _dense(sd, f"{b}.layer.0.SelfAttention.v", bias=False),
                "o": _dense(sd, f"{b}.layer.0.SelfAttention.o", bias=False),
            },
            "ff_norm": {"weight": sd.take(f"{b}.layer.1.layer_norm.weight")},
        }
        if cfg.feed_forward_proj == "gated-gelu":
            blk["wi_0"] = _dense(sd, f"{b}.layer.1.DenseReluDense.wi_0", bias=False)
            blk["wi_1"] = _dense(sd, f"{b}.layer.1.DenseReluDense.wi_1", bias=False)
        else:
            blk["wi"] = _dense(sd, f"{b}.layer.1.DenseReluDense.wi", bias=False)
        blk["wo"] = _dense(sd, f"{b}.layer.1.DenseReluDense.wo", bias=False)
        P[f"block_{i}"] = blk
    sd.finish()
    return {"params": P}


def convert_clip_vision(state_dict: dict, cfg, prefix: str = "vision_model") -> dict:
    """transformers ``CLIPVisionModel[WithProjection]`` state dict -> flax
    ``CLIPVisionEncoder`` params (the safety-checker backbone; the reference
    constructs it inside diffusers' ``StableDiffusionSafetyChecker``,
    ``pipeline_stable_diffusion_uncertainty_guided.py:41``)."""
    sd = _SD(state_dict)
    P: dict = {
        "class_embedding": sd.take(f"{prefix}.embeddings.class_embedding"),
        "patch_embedding": {
            "kernel": sd.take(f"{prefix}.embeddings.patch_embedding.weight"
                              ).transpose(2, 3, 1, 0)
        },
        "position_embedding": sd.take(f"{prefix}.embeddings.position_embedding.weight"),
        "pre_layrnorm": _layernorm(sd, f"{prefix}.pre_layrnorm"),
        "post_layernorm": _layernorm(sd, f"{prefix}.post_layernorm"),
    }
    for i in range(cfg.num_layers):
        b = f"{prefix}.encoder.layers.{i}"
        P[f"layer_{i}"] = {
            "layer_norm1": _layernorm(sd, f"{b}.layer_norm1"),
            "layer_norm2": _layernorm(sd, f"{b}.layer_norm2"),
            "self_attn": {
                "q_proj": _dense(sd, f"{b}.self_attn.q_proj"),
                "k_proj": _dense(sd, f"{b}.self_attn.k_proj"),
                "v_proj": _dense(sd, f"{b}.self_attn.v_proj"),
                "out_proj": _dense(sd, f"{b}.self_attn.out_proj"),
            },
            "fc1": _dense(sd, f"{b}.mlp.fc1"),
            "fc2": _dense(sd, f"{b}.mlp.fc2"),
        }
    if getattr(cfg, "projection_dim", 0) > 0:
        P["visual_projection"] = _dense(sd, "visual_projection", bias=False)
    sd.sd.pop(f"{prefix}.embeddings.position_ids", None)
    sd.finish()
    return {"params": P}


def convert_safety_checker(state_dict: dict, cfg):
    """diffusers ``StableDiffusionSafetyChecker`` state dict (CLIP vision
    tower under the doubled ``vision_model.vision_model`` prefix + projection
    + fixed concept/special-care heads) -> ``SafetyCheckerParams``
    (``pipelines/safety_checker.py``)."""
    import jax.numpy as jnp

    from ..pipelines.safety_checker import SafetyCheckerParams

    heads = {}
    tower = {}
    for k, v in state_dict.items():
        if k in ("concept_embeds", "special_care_embeds",
                 "concept_embeds_weights", "special_care_embeds_weights"):
            heads[k] = np.asarray(v, np.float32)
        elif k.startswith("vision_model."):
            tower[k[len("vision_model."):]] = v  # strip the checker's prefix
        else:
            tower[k] = v  # visual_projection.weight
    missing = {"concept_embeds", "special_care_embeds", "concept_embeds_weights",
               "special_care_embeds_weights"} - set(heads)
    if missing:
        raise KeyError(f"safety checker heads missing: {sorted(missing)}")
    vision = convert_clip_vision(tower, cfg)
    return SafetyCheckerParams(
        vision=vision,
        concept_embeds=jnp.asarray(heads["concept_embeds"]),
        special_care_embeds=jnp.asarray(heads["special_care_embeds"]),
        concept_embeds_weights=jnp.asarray(heads["concept_embeds_weights"]),
        special_care_embeds_weights=jnp.asarray(heads["special_care_embeds_weights"]),
    )


def load_any_state_dict(path) -> Dict[str, np.ndarray]:
    """File OR diffusers/transformers model dir -> merged {key: f32 ndarray}.
    Handles torch .bin/.pt/.pth and single/sharded .safetensors (torch
    loader, not numpy — T2I checkpoints are often bf16)."""

    def _load_st(f):
        from safetensors.torch import load_file

        return {k: v.float().numpy() for k, v in load_file(f).items()}

    p = Path(path)
    if p.is_file():
        return _load_st(p) if p.suffix == ".safetensors" else load_torch_state_dict(p)
    st_files = sorted(p.glob("*.safetensors"))
    if st_files:
        out: Dict[str, np.ndarray] = {}
        for f in st_files:
            out.update(_load_st(f))
        return out
    bins = sorted(p.glob("*.bin")) + sorted(p.glob("*.pt")) + sorted(p.glob("*.pth"))
    if not bins:
        raise FileNotFoundError(f"no weight files under {p}")
    out = {}
    for f in bins:
        out.update(load_torch_state_dict(f))
    return out
