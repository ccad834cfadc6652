"""Model/scheduler factory — ``init_model.py`` parity, flax edition.

``instantiate_model_scheduler(dataset)`` returns a ``ModelBundle`` holding the
flax model, its params (converted from the reference's torch checkpoints when
present under ``models/``), the matching noise schedule, and a conditioned
``apply_fn(x, t, y, key)`` ready for the sampling orchestrator.

Hard-coded hparams mirror the reference exactly:
  imagenet64  — ADM cosine schedule + 64x64_diffusion.pt (``init_model.py:43-56,136-138``)
  imagenet128 — ADM linear schedule + 128x128_diffusion.pt (``init_model.py:20-41``)
  cifar10     — HF ddpm-cifar10-32 (+ dropout override) with its linear
                schedule (``init_model.py:160-193``)

Checkpoints cannot be downloaded in air-gapped environments; pass
``random_init=True`` for architecture-true random weights (throughput
benchmarks, smoke tests).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .diffusion.schedule import NoiseSchedule, make_schedule, cosine_schedule
from .models import (
    ADMClassifier,
    ADMClassifierConfig,
    ADMUNet,
    ADMUNetConfig,
    AutoencoderKL,
    AutoencoderKLConfig,
    UNet2D,
    UNet2DConfig,
    UViT,
    UViTConfig,
)
from .models.convert import (
    convert_adm_classifier,
    convert_adm_unet,
    convert_autoencoder_kl,
    convert_unet2d,
    convert_uvit,
    load_torch_state_dict,
)
from .utils import paths

__all__ = ["ModelBundle", "DATASET_IMAGE_SIZE", "instantiate_model_scheduler", "init_scheduler", "load_classifier"]

# reference ``utils.py:23-30`` (+ "tiny": in-repo test fixture, SURVEY.md §4)
DATASET_IMAGE_SIZE = {
    "imagenet64": 64,
    "imagenet128": 128,
    "imagenet256": 256,
    "imagenet512": 512,
    "cifar10": 32,
    "lsun_churches256": 256,
    "tiny": 16,
}

_CHECKPOINTS = {
    "imagenet64": "64x64_diffusion.pt",
    "imagenet128": "128x128_diffusion.pt",
    "imagenet64_classifier": "64x64_classifier.pt",
    "imagenet128_classifier": "128x128_classifier.pt",
    "cifar10": "ddpm-cifar10-32.bin",
    "imagenet256": "imagenet256_uvit_huge.pth",
    "imagenet512": "imagenet512_uvit_huge.pth",
    "autoencoder": "autoencoder_kl_ema.pth",
}


@dataclasses.dataclass
class ModelBundle:
    name: str
    model: Any
    params: Any
    schedule: NoiseSchedule
    image_size: int
    num_classes: Optional[int]
    # conditioned forward: (params, x, t, y, key) -> epsilon [B,H,W,3].
    # ``params`` is the bundle's params dict, passed as an explicit jit
    # argument by every caller — closing over it would embed the weights as
    # constants in each compiled program (SURVEY.md §7.1.4 donation discipline)
    apply_fn: Callable = None  # type: ignore[assignment]
    # stochastic variants used by estimators
    apply_fn_dropout: Callable = None  # type: ignore[assignment]
    apply_fn_act_noise: Callable = None  # type: ignore[assignment]
    # latent-space models (U-ViT + KL AE): sample shape & decoder
    sample_shape: tuple = None  # type: ignore[assignment]  # (H, W, C) the sampler operates on
    decode_fn: Optional[Callable] = None  # (params, latents[B,h,w,4]) -> images [B,H,W,3]


def _random_params(model, x, t, y, seed=0):
    shapes = jax.eval_shape(lambda k: model.init(k, x, t, y), jax.random.key(seed))
    leaves, treedef = jax.tree.flatten(shapes)
    keys = jax.random.split(jax.random.key(seed), len(leaves))
    return jax.tree.unflatten(
        treedef,
        [0.02 * jax.random.normal(k, s.shape, s.dtype) for k, s in zip(keys, leaves)],
    )


def init_scheduler(dataset: str) -> NoiseSchedule:
    """Reference ``init_scheduler`` (``init_model.py:265-298``)."""
    if dataset == "tiny":
        return make_schedule("linear", 1000)
    if dataset.startswith("imagenet64"):
        return make_schedule(trained_betas=cosine_schedule(1000))
    if dataset.startswith("imagenet128") or dataset in ("cifar10", "lsun_churches256"):
        return make_schedule("linear", 1000, 0.0001, 0.02)
    if dataset in ("imagenet256", "imagenet512"):
        # U-ViT uses an SD-style scaled-linear schedule (load_pretrained_models.py:44-62)
        return make_schedule("scaled_linear", 1000, 0.00085, 0.012)
    raise ValueError(f"unknown dataset: {dataset}")


def instantiate_model_scheduler(
    dataset: str,
    dropout: float = 0.0,
    dtype: Any = jnp.bfloat16,
    checkpoint: Optional[Path] = None,
    random_init: bool = False,
    models_dir: Optional[Path] = None,
) -> ModelBundle:
    """Reference ``instantiate_model_scheduler`` (``init_model.py:221-263``)."""
    models_dir = Path(models_dir or paths.models_dir())
    schedule = init_scheduler(dataset)

    if dataset == "imagenet64":
        cfg = dataclasses.replace(ADMUNetConfig.imagenet64(dropout=dropout or 0.1), dtype=dtype)
        model = ADMUNet(cfg)
        num_classes = cfg.num_classes
        convert = lambda sd: convert_adm_unet(sd, cfg)
    elif dataset == "imagenet128":
        cfg = dataclasses.replace(ADMUNetConfig.imagenet128(), dropout=dropout, dtype=dtype)
        model = ADMUNet(cfg)
        num_classes = cfg.num_classes
        convert = lambda sd: convert_adm_unet(sd, cfg)
    elif dataset == "cifar10":
        cfg = dataclasses.replace(UNet2DConfig.ddpm_cifar10(dropout=dropout), dtype=dtype)
        model = UNet2D(cfg)
        num_classes = None
        convert = lambda sd: convert_unet2d(sd, cfg)
    elif dataset in ("imagenet256", "imagenet512"):
        return _instantiate_uvit(dataset, dtype, checkpoint, random_init, models_dir, schedule)
    elif dataset == "tiny":
        cfg = dataclasses.replace(ADMUNetConfig.tiny(), dropout=dropout or 0.1, dtype=dtype)
        model = ADMUNet(cfg)
        num_classes = cfg.num_classes
        convert = lambda sd: convert_adm_unet(sd, cfg)
    else:
        raise ValueError(f"unsupported dataset for round-1 factory: {dataset!r}")

    size = DATASET_IMAGE_SIZE[dataset]
    x0 = jnp.zeros((1, size, size, 3))
    t0 = jnp.asarray(0, jnp.int32)
    y0 = jnp.zeros((1,), jnp.int32) if num_classes else None

    ckpt = checkpoint or (models_dir / _CHECKPOINTS.get(dataset, ""))
    if random_init or not Path(ckpt).exists():
        if not random_init:
            raise FileNotFoundError(
                f"checkpoint {ckpt} not found; download it (see reference readme) or "
                f"pass random_init=True for architecture-true random weights"
            )
        params = _random_params(model, x0, t0, y0)
    else:
        params = convert(load_torch_state_dict(ckpt))
        params = jax.tree.map(jnp.asarray, params)

    is_cc = num_classes is not None

    # params ALWAYS flow as an explicit argument (never closed over): closures
    # embed the weights as constants into each compiled program, which bloats
    # compilation (and overflows remote-compile transports) for 100M+ models
    def apply_fn(p, x, t, y, key):
        out = model.apply(p["model"], x, t, y if is_cc else None)
        return out[..., :3]  # learned-variance heads sliced off (ref generate_samples.py:76)

    def apply_fn_dropout(p, x, t, y, key):
        out = model.apply(
            p["model"], x, t, y if is_cc else None, deterministic=False, rngs={"dropout": key}
        )
        return out[..., :3]

    def apply_fn_act_noise(p, x, t, y, key):
        out = model.apply(p["model"], x, t, y if is_cc else None, rngs={"act_noise": key})
        return out[..., :3]

    return ModelBundle(
        name=dataset,
        model=model,
        params={"model": params},
        schedule=schedule,
        image_size=size,
        num_classes=num_classes,
        apply_fn=apply_fn,
        apply_fn_dropout=apply_fn_dropout,
        apply_fn_act_noise=apply_fn_act_noise,
        sample_shape=(size, size, 3),
    )


def _instantiate_uvit(dataset, dtype, checkpoint, random_init, models_dir, schedule):
    """Latent-space U-ViT-huge + frozen KL autoencoder (reference ``UViTAE``,
    ``uvit/uvit_ae.py:4-25``; configs ``uvit/load_pretrained_models.py:34-37``)."""
    size = DATASET_IMAGE_SIZE[dataset]
    cfg = dataclasses.replace(
        UViTConfig.imagenet256() if size == 256 else UViTConfig.imagenet512(), dtype=dtype
    )
    model = UViT(cfg)
    z = cfg.img_size
    x0 = jnp.zeros((1, z, z, cfg.in_chans))
    t0 = jnp.asarray(0, jnp.int32)
    y0 = jnp.zeros((1,), jnp.int32)

    models_dir = Path(models_dir)
    ckpt = checkpoint or models_dir / _CHECKPOINTS[dataset]
    if random_init or not Path(ckpt).exists():
        if not random_init:
            raise FileNotFoundError(f"checkpoint {ckpt} not found")
        params = _random_params(model, x0, t0, y0)
    else:
        params = jax.tree.map(jnp.asarray, convert_uvit(load_torch_state_dict(ckpt), cfg))

    ae_cfg = dataclasses.replace(AutoencoderKLConfig.sd_kl_ema(), dtype=dtype)
    ae = AutoencoderKL(ae_cfg)
    ae_ckpt = models_dir / _CHECKPOINTS["autoencoder"]
    if random_init or not Path(ae_ckpt).exists():
        if not random_init:
            raise FileNotFoundError(f"autoencoder checkpoint {ae_ckpt} not found")
        ae_params = jax.tree.map(
            lambda s: 0.02 * jnp.ones(s.shape, s.dtype),
            jax.eval_shape(
                lambda k: ae.init(k, jnp.zeros((1, size, size, 3)), "init", jax.random.key(0)),
                jax.random.key(0),
            ),
        )
    else:
        ae_params = jax.tree.map(
            jnp.asarray, convert_autoencoder_kl(load_torch_state_dict(ae_ckpt), ae_cfg)
        )

    def apply_fn(p, x, t, y, key):
        return model.apply(p["model"], x, t, y)

    def decode_fn(p, latents):
        return ae.apply(p["ae"], latents, "decode")

    return ModelBundle(
        name=dataset,
        model=model,
        params={"model": params, "ae": ae_params},
        schedule=schedule,
        image_size=size,
        num_classes=cfg.num_classes,
        apply_fn=apply_fn,
        apply_fn_dropout=apply_fn,  # U-ViT ckpts have no dropout at inference
        apply_fn_act_noise=apply_fn,
        sample_shape=(z, z, cfg.in_chans),
        decode_fn=decode_fn,
    )


def load_classifier(
    dataset: str,
    dtype: Any = jnp.float32,
    checkpoint: Optional[Path] = None,
    random_init: bool = False,
    models_dir: Optional[Path] = None,
):
    """ADM noisy classifier for classifier guidance (``init_model.py:58-126``)."""
    size = DATASET_IMAGE_SIZE[dataset]
    cfg = dataclasses.replace(ADMClassifierConfig.imagenet(size), dtype=dtype)
    model = ADMClassifier(cfg)
    models_dir = Path(models_dir or paths.models_dir())
    ckpt = checkpoint or models_dir / _CHECKPOINTS.get(f"{dataset}_classifier", "")
    x0 = jnp.zeros((1, size, size, 3))
    if random_init or not Path(ckpt).exists():
        if not random_init:
            raise FileNotFoundError(f"classifier checkpoint {ckpt} not found")
        shapes = jax.eval_shape(lambda k: model.init(k, x0, jnp.asarray(0)), jax.random.key(0))
        leaves, treedef = jax.tree.flatten(shapes)
        keys = jax.random.split(jax.random.key(0), len(leaves))
        params = jax.tree.unflatten(
            treedef, [0.02 * jax.random.normal(k, s.shape, s.dtype) for k, s in zip(keys, leaves)]
        )
    else:
        params = jax.tree.map(jnp.asarray, convert_adm_classifier(load_torch_state_dict(ckpt), cfg))
    return model, params, cfg
