"""Text-to-image uncertainty-guided generation (SD1.5-class), guided vs plain.

Parity: reference ``scripts/generate_with_uncertainty_threshold_stable_diffusion.py:13-74``
(and the SD3/Flux siblings) — run the uncertainty-guided pipeline on a prompt,
save ``output_sd_uc.png`` to a numbered folder with ``args.yaml``, then (unless
``--skip-original``) the plain pipeline's ``output_sd.png`` beside it. The
reference's module-global ``use_posterior`` toggle
(``uncertainty_guidance.py:8``, set by the script ``:16-17``) is an explicit
config field here.

Model stack: flax ``SDUNet`` (+ optional ``AutoencoderKL`` decode) with
weights converted from diffusers state dicts (``--unet-weights`` /
``--vae-weights`` torch files), or random-init (``--random-init true``) in
zero-egress environments. Text encoding is host-side
(``pipelines/text_encoder.py``), with a deterministic pseudo-embedding
fallback when CLIP weights are unavailable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..utils import paths
from ..utils.config import parse_config
from ..utils.logging import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    # reference flags (defaults from the reference script + config/stable_diffusion_guidance/base.yaml)
    prompt: str = "a photo of a cat"
    prompt_negative: str = ""
    num_steps: int = 20
    seed: int = 491
    start_step_threshold: int = 0
    num_steps_threshold: int = 20
    percentile: float = 0.95
    skip_original: bool = False
    use_posterior: bool = False
    strength: float = 0.99  # reference --strength -> guidance lr
    # model plumbing (this framework)
    model: str = "sd15"  # sd15 | sd21 | tiny | sd3 | sd3-tiny | sd35 | flux | flux-tiny
    streamed: bool = False  # host-resident params + per-block jit (full-size
    # Flux-dev 11.9B / SD3.5-large 8.1B on ONE chip; forces the stepwise
    # sampler and posterior guidance — see pipelines/streamed.py)
    guidance_scale: float = 7.5
    M: int = 5
    unet_weights: Optional[str] = None  # diffusers UNet state dict (torch file)
    vae_weights: Optional[str] = None  # diffusers/CompVis KL-VAE state dict
    # StableDiffusionSafetyChecker weights (file or dir); the reference's
    # SD1.5 pipeline runs this stage post-decode (run_safety_checker,
    # pipeline_stable_diffusion_uncertainty_guided.py:443-455). None = the
    # pipeline's documented safety_checker=None mode (:151-158).
    safety_checker_weights: Optional[str] = None
    clip_path: Optional[str] = None  # local CLIP text encoder dir
    # SD3/Flux conditioning source: "pseudo" (hash embeddings), "small"
    # (real flax towers, real widths, depth 2, random init) or "full" (real
    # CLIP-L/CLIP-G/T5-XXL architectures — weights-day / capability runs)
    text_towers: str = "pseudo"
    towers_params_dir: Optional[str] = None  # converted tower ckpts (T2ITowers.load)
    tower_seq_len: int = 77  # per-tower token length (T5 supports up to 256/512)
    random_init: bool = False
    dtype: str = "bfloat16"
    height: int = 512
    width: int = 512
    out_dir: Optional[str] = None


def build_sd_stack(cfg: Config):
    """(denoise_fn, decode_fn, schedule, latent_size) for the requested model.

    denoise_fn closes over nothing trainable — params are threaded as explicit
    jit arguments by the pipeline caller contract (CLAUDE.md rule 1), so we
    return (apply_fn, params) pairs and bind at the jit boundary.
    """
    import jax
    import jax.numpy as jnp

    from ..diffusion.schedule import make_schedule
    from ..models import SDUNet, SDUNetConfig
    from ..models.convert import convert_sd_unet, load_torch_state_dict

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    if cfg.model == "tiny":
        mcfg = SDUNetConfig.tiny()
    elif cfg.model == "sd21":
        mcfg = dataclasses.replace(SDUNetConfig.sd21(), dtype=dtype)
    else:
        mcfg = dataclasses.replace(SDUNetConfig.sd15(), dtype=dtype)
    model = SDUNet(mcfg)
    latent_size = cfg.height // 8 if cfg.model != "tiny" else mcfg.sample_size

    if cfg.unet_weights:
        params = convert_sd_unet(load_torch_state_dict(cfg.unet_weights), mcfg)
    elif cfg.random_init:
        x0 = jnp.zeros((1, latent_size, latent_size, mcfg.in_channels))
        ctx0 = jnp.zeros((1, 77, mcfg.cross_attention_dim))
        params = model.init(jax.random.key(0), x0, jnp.asarray(0), ctx0)
    else:
        raise SystemExit("need --unet-weights or --random-init true (no network egress)")

    # SD trains on the scaled-linear schedule (ref SD pipeline scheduler config)
    schedule = make_schedule("scaled_linear", 1000, beta_start=0.00085, beta_end=0.012)

    def make_denoise_fn(p):
        def denoise_fn(z, t, embeds, key):
            return model.apply(p, z, t, embeds)

        return denoise_fn

    decode = None
    if cfg.vae_weights or cfg.model == "tiny":
        from ..models import AutoencoderKL, AutoencoderKLConfig
        from ..models.convert import convert_autoencoder_kl

        acfg = AutoencoderKLConfig.tiny() if cfg.model == "tiny" else AutoencoderKLConfig.sd_kl_ema()
        ae = AutoencoderKL(acfg)
        if cfg.vae_weights:
            aparams = convert_autoencoder_kl(load_torch_state_dict(cfg.vae_weights), acfg)
        else:
            aparams = ae.init(
                jax.random.key(1),
                jnp.zeros((1, latent_size, latent_size, acfg.embed_dim)),
                "decode",
            )

        def decode(z):
            # AutoencoderKL.decode unscales by cfg.scale_factor internally
            return ae.apply(aparams, z, "decode")

    return model, params, make_denoise_fn, decode, schedule, latent_size, mcfg


def run_flow_match_family(cfg: Config) -> int:
    """SD3 (MMDiT) / Flux flow-matching path — parity with the reference's
    ``generate_with_uncertainty_threshold_stable_diffusion_3.py`` and
    ``generate_with_uncertainty_threshold_flux.py`` (same numbered-folder +
    args.yaml + guided/plain PNG-pair protocol as the SD1.5 script)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import yaml

    from ..diffusion.flow_match import FlowMatchConfig, sample_flow_match
    from ..models.convert import convert_flux, convert_sd3_mmdit, load_torch_state_dict
    from ..pipelines.text_encoder import pseudo_text_embeddings

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    is_flux = cfg.model.startswith("flux")
    tiny = cfg.model.endswith("tiny")

    if is_flux:
        from ..models import FluxConfig, FluxTransformer

        mcfg = FluxConfig.tiny() if tiny else dc.replace(FluxConfig.flux_dev(), dtype=dtype)
        model = FluxTransformer(mcfg)
        latent_size = 8 if tiny else cfg.height // 8
        channels = mcfg.in_channels
        convert = convert_flux
    else:
        from ..models import MMDiT, MMDiTConfig

        if tiny:
            mcfg = MMDiTConfig.tiny()
        elif cfg.model == "sd35":
            mcfg = dc.replace(MMDiTConfig.sd35_large(), dtype=dtype)
        else:
            mcfg = dc.replace(MMDiTConfig.sd3_medium(), dtype=dtype)
        model = MMDiT(mcfg)
        latent_size = mcfg.sample_size if tiny else cfg.height // 8
        channels = mcfg.in_channels
        convert = convert_sd3_mmdit

    b = 1
    pseudo_text = cfg.text_towers == "pseudo" or tiny
    pseudo_tokens = False
    if pseudo_text:
        if cfg.text_towers != "pseudo" and tiny:
            log.warning(
                "tiny model configs have non-standard conditioning dims; "
                "falling back to pseudo embeddings"
            )
        ctx = jnp.asarray(pseudo_text_embeddings([cfg.prompt], seq_len=16, dim=mcfg.joint_attention_dim))
        pooled = jnp.asarray(
            pseudo_text_embeddings([cfg.prompt], seq_len=1, dim=mcfg.pooled_projection_dim)[:, 0]
        )
        uncond_ctx = jnp.asarray(
            pseudo_text_embeddings([cfg.prompt_negative], seq_len=16, dim=mcfg.joint_attention_dim)
        )
        uncond_pooled = jnp.asarray(
            pseudo_text_embeddings([cfg.prompt_negative], seq_len=1, dim=mcfg.pooled_projection_dim)[:, 0]
        )
        log.warning(
            "PSEUDO TEXT CONDITIONING: prompts enter as hash-seeded gaussian "
            "embeddings, not real text encodings — outputs are NOT comparable "
            "to reference guided results (stamped pseudo_text=true in args.yaml)"
        )
    else:
        # real flax towers (CLIP-L [+CLIP-G] + T5): the reference's
        # text_encoder/2/3 stack (pipeline_stable_diffusion_3_uncertainty_
        # guided.py:90-93,118-121; pipeline_flux_uncertainty.py:60)
        from ..pipelines.text_encoder import T2ITowers

        towers = T2ITowers(
            "flux" if is_flux else "sd3", scale=cfg.text_towers,
            seed=cfg.seed, clip_seq=77, t5_seq=cfg.tower_seq_len,
        )
        if cfg.towers_params_dir:
            towers.load(cfg.towers_params_dir)
        c_ctx, c_pooled = towers.encode([cfg.prompt], clip_path=cfg.clip_path)
        u_ctx, u_pooled = towers.encode([cfg.prompt_negative], clip_path=cfg.clip_path)
        pseudo_tokens = towers.used_pseudo_tokens
        if pseudo_tokens:
            log.warning(
                "tokenizer vocab files unavailable: prompts tokenized as "
                "hash-seeded pseudo token ids (towers themselves are real; "
                "stamped pseudo_tokens=true in args.yaml)"
            )
        ctx, pooled = jnp.asarray(c_ctx), jnp.asarray(c_pooled)
        uncond_ctx, uncond_pooled = jnp.asarray(u_ctx), jnp.asarray(u_pooled)

    x0 = jnp.zeros((b, latent_size, latent_size, channels))
    streamed_exec = None
    if cfg.streamed:
        # host-resident params + per-block jit: the ONLY way Flux-dev (11.9B,
        # 23.8GB bf16) or SD3.5-large (8.1B) runs on one 16GB chip
        from ..pipelines.streamed import (
            StreamedFlux,
            StreamedMMDiT,
            random_flux_params,
            random_mmdit_params,
        )

        if cfg.unet_weights:
            params = convert(load_torch_state_dict(cfg.unet_weights), mcfg)
        elif cfg.random_init or tiny:
            params = (
                random_flux_params(mcfg, seq_txt=16, latent=latent_size)
                if is_flux
                else random_mmdit_params(mcfg, seq_txt=16)
            )
        else:
            raise SystemExit("need --unet-weights or --random-init true (no network egress)")
        streamed_exec = (StreamedFlux if is_flux else StreamedMMDiT)(mcfg, params)
    elif cfg.unet_weights:
        params = convert(load_torch_state_dict(cfg.unet_weights), mcfg)
    elif cfg.random_init or tiny:
        g0 = jnp.asarray(1000.0) if is_flux and mcfg.guidance_embeds else None
        if is_flux:
            params = model.init(jax.random.key(0), x0, jnp.asarray(1.0), ctx, pooled, g0)
        else:
            params = model.init(jax.random.key(0), x0, jnp.asarray(1.0), ctx, pooled)
    else:
        raise SystemExit("need --unet-weights or --random-init true (no network egress)")

    def velocity_fn(p):
        if streamed_exec is not None:
            apply = lambda *a: streamed_exec(*a)
        else:
            apply = lambda *a: model.apply(p, *a)
        if is_flux:
            g = jnp.asarray(cfg.guidance_scale * 1000.0) if mcfg.guidance_embeds else None

            def fn(x, t, key):
                return apply(x, t, ctx, pooled, g)

        else:
            scale = cfg.guidance_scale

            def fn(x, t, key):
                if scale <= 1.0:
                    return apply(x, t, ctx, pooled)
                x2 = jnp.concatenate([x, x], axis=0)
                c2 = jnp.concatenate([uncond_ctx, ctx], axis=0)
                p2 = jnp.concatenate([uncond_pooled, pooled], axis=0)
                v2 = apply(x2, t, c2, p2)
                vu, vc = jnp.split(v2, 2, axis=0)
                return vu + scale * (vc - vu)

        return fn

    fm = FlowMatchConfig(
        num_inference_steps=cfg.num_steps,
        shift=3.0,
        # Flux uses the dynamic exponential shift keyed on the 2x2-packed
        # token count (ref pipeline_flux_uncertainty.py:181-198); SD3 keeps
        # the constant shift=3.0 schedule.
        use_dynamic_shifting=is_flux,
        image_seq_len=(latent_size // 2) ** 2 if is_flux else 0,
        after_step=cfg.start_step_threshold,
        num_steps_uc=cfg.num_steps_threshold,
        M=cfg.M,
        percentile=cfg.percentile,
        use_posterior=cfg.use_posterior,
        lr=cfg.strength,
    )
    base_dir = (
        paths.flux_uncertainty_guidance() if is_flux else paths.sd3_uncertainty_guidance()
    )
    base = paths.ensure(base_dir if cfg.out_dir is None else __import__("pathlib").Path(cfg.out_dir))
    i = 0
    while (base / f"{i}").exists():
        i += 1
    dest = base / f"{i}"
    dest.mkdir()
    with open(dest / "args.yaml", "w") as f:
        # stamp the conditioning provenance so a fallback-conditioned output
        # can never be mistaken for a real guided result (VERDICT r3 #8)
        yaml.safe_dump(
            {**dataclasses.asdict(cfg), "pseudo_text": bool(pseudo_text),
             "pseudo_tokens": bool(pseudo_tokens)}, f,
        )

    # VAE decode (16-channel SD3/Flux AutoencoderKL) when weights are given;
    # otherwise the saved PNGs are raw latent channels — named latent_preview
    # to make the random-init limitation explicit (no real weights here).
    decode = None
    if cfg.vae_weights and not tiny:
        from ..models import AutoencoderKL, AutoencoderKLConfig
        from ..models.convert import convert_autoencoder_kl

        acfg = AutoencoderKLConfig.flux_kl() if is_flux else AutoencoderKLConfig.sd3_kl()
        ae = AutoencoderKL(acfg)
        aparams = convert_autoencoder_kl(load_torch_state_dict(cfg.vae_weights), acfg)
        decode = lambda z: ae.apply(aparams, z, "decode")

    def to_png(sample):
        if decode is not None:
            return np.asarray(decode(sample))
        return np.asarray(sample[..., :3])

    stem = "flux" if is_flux else "sd3"
    img_stem = stem if decode is not None else f"latent_preview_{stem}"

    vf = velocity_fn(params)
    xT = jax.random.normal(jax.random.key(cfg.seed), x0.shape)
    if cfg.streamed:
        # gradient mode would trace through the streamed executor and embed
        # host block params as constants (relay limit); posterior is exact here
        if not cfg.use_posterior and cfg.num_steps_threshold > 0:
            log.warning("streamed mode forces posterior guidance (see pipelines/streamed.py)")
            fm = dc.replace(fm, use_posterior=True)
        from ..diffusion.flow_match import sample_flow_match_stepwise as _sampler
    else:
        _sampler = sample_flow_match
    import time as _time

    t0 = _time.perf_counter()
    res = _sampler(vf, xT, jax.random.key(cfg.seed + 1), fm)
    jax.block_until_ready(res.sample)
    t_guided = _time.perf_counter() - t0
    n_fwd = cfg.num_steps + min(cfg.num_steps_threshold, cfg.num_steps) * cfg.M
    print(
        f"guided sampling: {t_guided:.1f}s for {cfg.num_steps} steps "
        f"(~{n_fwd} forwards, {t_guided / max(n_fwd, 1):.2f}s/forward)"
    )
    save_png(dest / f"output_{img_stem}_uc.png", to_png(res.sample))
    if res.uncertainty is not None:
        np.savez(dest / "uncertainty.npz", data=np.asarray(res.uncertainty))

    if not cfg.skip_original:
        plain = _sampler(vf, xT, jax.random.key(cfg.seed + 1), dc.replace(fm, num_steps_uc=0))
        save_png(dest / f"output_{img_stem}.png", to_png(plain.sample))
    log.info("saved to %s", dest)
    print(f"Saved to {dest}")
    return 0


def save_png(path, images: np.ndarray) -> None:
    """[B,H,W,3] float in [-1,1] -> horizontal-grid PNG (PIL, host)."""
    from PIL import Image

    arr = np.clip(np.asarray(images, np.float32) / 2.0 + 0.5, 0.0, 1.0)
    arr = (arr * 255.0).astype(np.uint8)
    grid = np.concatenate(list(arr), axis=1)
    Image.fromarray(grid).save(path)


def main(argv=None) -> int:
    import jax
    import yaml

    from ..pipelines.text_encoder import encode_prompts_ex
    from ..pipelines.text_to_image import T2IPipelineConfig, TextToImageUncertaintyPipeline

    cfg = parse_config(Config, argv, defaults={})
    if cfg.model.startswith(("sd3", "flux")):
        return run_flow_match_family(cfg)
    model, params, make_denoise_fn, decode, schedule, latent_size, mcfg = build_sd_stack(cfg)

    cond, uncond, pseudo_text = encode_prompts_ex(
        [cfg.prompt], [cfg.prompt_negative], local_path=cfg.clip_path
    )
    if cond.shape[-1] != mcfg.cross_attention_dim:  # tiny-model path
        from ..pipelines.text_encoder import pseudo_text_embeddings

        cond = pseudo_text_embeddings([cfg.prompt], seq_len=5, dim=mcfg.cross_attention_dim)
        uncond = pseudo_text_embeddings([cfg.prompt_negative], seq_len=5, dim=mcfg.cross_attention_dim)
        pseudo_text = True
    if pseudo_text:
        log.warning(
            "PSEUDO TEXT CONDITIONING: CLIP unavailable — prompts enter as "
            "hash-seeded gaussian embeddings; outputs are NOT comparable to "
            "reference guided results (stamped pseudo_text=true in args.yaml)"
        )

    pcfg = T2IPipelineConfig(
        num_inference_steps=cfg.num_steps,
        guidance_scale=cfg.guidance_scale,
        start_step_uc=cfg.start_step_threshold,
        num_steps_uc=cfg.num_steps_threshold,
        percentile=cfg.percentile,
        use_posterior=cfg.use_posterior,
        lr=cfg.strength,
        M=cfg.M,
        latent_channels=mcfg.in_channels,
        latent_size=latent_size,
    )
    pipe = TextToImageUncertaintyPipeline(make_denoise_fn(params), schedule, decode, pcfg)

    # numbered destination folder + args.yaml (ref script :44-52)
    base = paths.ensure(
        paths.sd_uncertainty_guidance() if cfg.out_dir is None else __import__("pathlib").Path(cfg.out_dir)
    )
    i = 0
    while (base / f"{i}").exists():
        i += 1
    dest = base / f"{i}"
    dest.mkdir()
    with open(dest / "args.yaml", "w") as f:
        yaml.safe_dump({**dataclasses.asdict(cfg), "pseudo_text": bool(pseudo_text)}, f)

    # post-decode safety-checker stage (reference run_safety_checker)
    safety = None
    if cfg.safety_checker_weights:
        import jax.numpy as jnp

        from ..models import CLIPVisionConfig
        from ..models.convert import convert_safety_checker, load_any_state_dict
        from ..pipelines.safety_checker import run_safety_checker

        vcfg = CLIPVisionConfig.vit_l_14()
        sc_params = convert_safety_checker(
            load_any_state_dict(cfg.safety_checker_weights), vcfg
        )

        def safety(images):  # [-1,1] images -> (filtered [-1,1], flags)
            filt, flags = run_safety_checker(
                vcfg, sc_params, (jnp.asarray(images, jnp.float32) + 1.0) / 2.0
            )
            return np.asarray(filt) * 2.0 - 1.0, flags

    def checked(images, tag):
        if safety is None:
            return images
        images, flags = safety(images)
        if flags is not None and flags.any():
            log.warning("%s: %d/%d images flagged nsfw and blacked out",
                        tag, int(flags.sum()), len(flags))
        with open(dest / "nsfw_flags.yaml", "a") as f:
            yaml.safe_dump({tag: [bool(x) for x in (flags if flags is not None else [])]}, f)
        return images

    key = jax.random.key(cfg.seed)
    res = pipe(cond, key, uncond_embeds=uncond)
    save_png(dest / "output_sd_uc.png", checked(np.asarray(res.images), "guided"))
    if res.uncertainty is not None:
        np.savez(dest / "uncertainty.npz", data=np.asarray(res.uncertainty))

    if not cfg.skip_original:
        plain_cfg = dataclasses.replace(pcfg, num_steps_uc=0)
        plain = TextToImageUncertaintyPipeline(make_denoise_fn(params), schedule, decode, plain_cfg)
        res0 = plain(cond, jax.random.key(cfg.seed), uncond_embeds=uncond)
        save_png(dest / "output_sd.png", checked(np.asarray(res0.images), "original"))

    log.info("saved to %s", dest)
    print(f"Saved to {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
