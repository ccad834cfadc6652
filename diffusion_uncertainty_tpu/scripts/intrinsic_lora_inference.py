"""Intrinsic-LoRA single-image SD inference (depth/normal/albedo/shading).

Parity: reference ``intrinsic_lora/inference_sd_single.py:52-147`` — load an
SD1.5 UNet, patch its attention projections with trained LoRA adapters, then
for each input image: VAE-encode (posterior mode), ONE UNet forward at
t = T-1 with the task prompt ("depth map" etc.), VAE-decode the prediction,
and save the task map (depth: min-max-normalized channel-mean grayscale,
``:131-137``; others: clamped RGB, ``:127-129``).

TPU-first differences: the LoRA deltas are merged functionally into the param
tree (``models/lora.py::apply_lora``) before the single jitted forward — no
per-call adapter dispatch; images batch through one compiled program.
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils import paths
from ..utils.config import parse_config
from ..utils.logging import get_logger

log = get_logger(__name__)

TASK_PROMPTS = {
    "depth": "depth map",
    "normal": "surface normal",
    "albedo": "albedo",
    "shading": "shading",
}


@dataclasses.dataclass
class Config:
    task: str = "depth"  # depth | normal | albedo | shading
    input_dir: Optional[str] = None  # folder of .png/.jpg RGB images
    out_dir: Optional[str] = None
    lora_weights: Optional[str] = None  # peft / attn-procs LoRA state dict (torch)
    unet_weights: Optional[str] = None
    vae_weights: Optional[str] = None
    clip_path: Optional[str] = None
    model: str = "sd15"  # sd15 | tiny
    random_init: bool = False
    lora_rank: int = 4  # synthetic-adapter rank when no lora_weights
    lora_scale: float = 1.0
    size: int = 512
    seed: int = 1015
    dtype: str = "float32"


def normalize_lora_keys(sd: dict) -> dict:
    """Accept BOTH diffusers LoRA layouts: peft (``*.lora_A.weight``) and the
    legacy attn-procs one the reference loads
    (``*.processor.to_q_lora.down.weight``) — normalized to peft naming."""
    out = {}
    for k, v in sd.items():
        k2 = k.replace(".processor.", ".")
        k2 = re.sub(r"\.to_out_lora\.", ".to_out.0.", k2)
        k2 = re.sub(r"\.(to_[qkv])_lora\.", r".\1.", k2)
        k2 = k2.replace(".down.weight", ".lora_A.weight")
        k2 = k2.replace(".up.weight", ".lora_B.weight")
        out[k2] = v
    return out


def sd_unet_lora_map(module: str) -> Optional[str]:
    """diffusers UNet attention module name -> flax ``SDUNet`` kernel-parent
    path (``models/convert.py::convert_sd_unet`` naming)."""
    module = module[5:] if module.startswith("unet.") else module
    m = re.match(
        r"(down_blocks\.(\d+)|mid_block|up_blocks\.(\d+))"
        r"\.attentions\.(\d+)\.transformer_blocks\.(\d+)"
        r"\.(attn[12])\.to_(q|k|v|out)(?:\.0)?$",
        module,
    )
    if not m:
        return None
    head, d_bi, u_bi, li, k, attn, proj = m.groups()
    if head == "mid_block":
        block = f"mid_attn_{li}"
    elif head.startswith("down_blocks"):
        block = f"down_{d_bi}_attn_{li}"
    else:
        block = f"up_{u_bi}_attn_{li}"
    return f"{block}/block_{k}/{attn}/to_{proj}"


def _load_images(cfg: Config) -> list:
    """[(stem, [H,W,3] float in [-1,1])] resized+center-cropped like the
    reference transforms (``inference_sd_single.py:102-109``)."""
    from PIL import Image

    out = []
    for f in sorted(Path(cfg.input_dir).iterdir()):
        if f.suffix.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        img = Image.open(f).convert("RGB")
        w, h = img.size
        s = cfg.size / min(w, h)
        img = img.resize((round(w * s), round(h * s)), Image.BILINEAR)
        w, h = img.size
        left, top = (w - cfg.size) // 2, (h - cfg.size) // 2
        img = img.crop((left, top, left + cfg.size, top + cfg.size))
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        out.append((f.stem, arr))
    return out


def main(argv=None) -> int:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..models import AutoencoderKL, AutoencoderKLConfig, SDUNet, SDUNetConfig
    from ..models.convert import (
        convert_autoencoder_kl,
        convert_sd_unet,
        load_torch_state_dict,
    )
    from ..models.lora import apply_lora, convert_peft_lora, init_lora
    from ..pipelines.text_encoder import encode_prompts, pseudo_text_embeddings

    cfg = parse_config(Config, argv)
    if cfg.task not in TASK_PROMPTS:
        raise SystemExit(f"unknown task {cfg.task!r}; one of {sorted(TASK_PROMPTS)}")
    prompt = TASK_PROMPTS[cfg.task]
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    tiny = cfg.model == "tiny"
    mcfg = SDUNetConfig.tiny() if tiny else dataclasses.replace(SDUNetConfig.sd15(), dtype=dtype)
    model = SDUNet(mcfg)
    acfg = AutoencoderKLConfig.tiny() if tiny else AutoencoderKLConfig.sd_kl_ema()
    ae = AutoencoderKL(acfg)
    latent_size = cfg.size // (2 ** (len(acfg.ch_mult) - 1))

    if cfg.unet_weights:
        params = convert_sd_unet(load_torch_state_dict(cfg.unet_weights), mcfg)
    elif cfg.random_init or tiny:
        z0 = jnp.zeros((1, latent_size, latent_size, mcfg.in_channels))
        ctx0 = jnp.zeros((1, 77, mcfg.cross_attention_dim))
        params = model.init(jax.random.key(0), z0, jnp.asarray(0), ctx0)
    else:
        raise SystemExit("need --unet-weights or --random-init true (no network egress)")
    if cfg.vae_weights:
        aparams = convert_autoencoder_kl(load_torch_state_dict(cfg.vae_weights), acfg)
    elif cfg.random_init or tiny:
        aparams = ae.init(
            jax.random.key(1), jnp.zeros((1, cfg.size, cfg.size, 3)), "init", jax.random.key(2)
        )
    else:
        raise SystemExit("need --vae-weights or --random-init true")

    # LoRA: trained adapters (reference ``unet.load_attn_procs``, :95) or a
    # synthetic zero-delta adapter so the path is exercisable without weights
    if cfg.lora_weights:
        raw = load_torch_state_dict(cfg.lora_weights)
        lora = convert_peft_lora(normalize_lora_keys(raw), sd_unet_lora_map)
        if not lora:
            raise SystemExit("no LoRA adapters matched the SD UNet attention paths")
    else:
        lora = init_lora(params, rank=cfg.lora_rank, key=jax.random.key(3), match="attn")
    log.info("merging %d LoRA adapters (scale %.3f)", len(lora), cfg.lora_scale)
    params = apply_lora(params, lora, scale=cfg.lora_scale)

    cond, _ = encode_prompts([prompt], local_path=cfg.clip_path)
    if cond.shape[-1] != mcfg.cross_attention_dim:
        cond = pseudo_text_embeddings([prompt], seq_len=5, dim=mcfg.cross_attention_dim)
    ctx = jnp.asarray(cond)

    t_last = jnp.asarray(999, jnp.int32)  # T-1 (ref :118-120)

    @jax.jit
    def predict(p, ap, rgb):
        moments = ae.apply(ap, rgb, "encode_moments")
        # posterior mode = mean half, scaled (ref ``latent_dist.mode()``, :121-122)
        z = acfg.scale_factor * moments[..., : acfg.embed_dim]
        pred = model.apply(p, z.astype(dtype), t_last, ctx)
        return ae.apply(ap, pred.astype(jnp.float32), "decode")

    if cfg.input_dir:
        images = _load_images(cfg)
    else:
        # synthetic single image (zero-egress smoke path)
        rs = np.random.RandomState(cfg.seed)
        images = [("synthetic", rs.rand(cfg.size, cfg.size, 3).astype(np.float32) * 2 - 1)]

    out_root = Path(cfg.out_dir) if cfg.out_dir else paths.results() / "intrinsic_lora" / cfg.task
    dest = paths.ensure(out_root / "predicted")
    for stem, arr in images:
        img = np.asarray(predict(params, aparams, jnp.asarray(arr)[None]))[0]
        if cfg.task == "depth":
            # min-max normalize, channel-mean grayscale (ref :131-137)
            img = (img - img.min()) / (img.max() - img.min() + 1e-12)
            gray = (img.mean(axis=-1) * 255.0).astype(np.uint8)
            Image.fromarray(gray).save(dest / f"{stem}_{cfg.task}.png")
        else:
            rgb = ((np.clip(img, -1.0, 1.0) * 0.5 + 0.5) * 255.0).astype(np.uint8)
            Image.fromarray(rgb).save(dest / f"{stem}_{cfg.task}.png")
    log.info("saved %d predictions to %s", len(images), dest)
    print(f"Saved {len(images)} predictions to {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
