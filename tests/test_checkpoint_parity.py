"""Checkpoint-gated parity tests — run only when real weights are present.

The build environment has zero egress, so these skip by default; drop the
reference checkpoints into ``models/`` (see README) to activate. They are the
test pyramid's top layer (SURVEY.md §4): converted-weight forwards must be
finite, well-scaled, and class-sensitive, and 50-step sampling must produce
non-degenerate images.
"""

import os
from pathlib import Path

import numpy as np
import pytest

MODELS = Path(os.environ.get("DIFFUSION_UNCERTAINTY_ROOT", ".")) / "models"

needs = lambda name: pytest.mark.skipif(
    not (MODELS / name).exists(), reason=f"checkpoint {name} not present"
)


@needs("64x64_diffusion.pt")
def test_adm64_checkpoint_forward():
    import jax
    import jax.numpy as jnp

    from diffusion_uncertainty_tpu.factory import instantiate_model_scheduler

    bundle = instantiate_model_scheduler("imagenet64", dtype=jnp.float32, models_dir=MODELS)
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
    t = jnp.asarray(500)
    y = jnp.asarray([1, 2])
    eps = bundle.apply_fn(bundle.params, x, t, y, jax.random.key(1))
    assert np.isfinite(np.asarray(eps)).all()
    # a trained epsilon-model's output on unit gaussians is ~unit-scale
    std = float(jnp.std(eps))
    assert 0.2 < std < 3.0, std
    # class conditioning must matter
    eps2 = bundle.apply_fn(bundle.params, x, t, jnp.asarray([3, 4]), jax.random.key(1))
    assert not np.allclose(np.asarray(eps), np.asarray(eps2), atol=1e-3)


@needs("ddpm-cifar10-32.bin")
def test_cifar10_checkpoint_sampling():
    import jax
    import jax.numpy as jnp

    from diffusion_uncertainty_tpu.diffusion import SamplerConfig, sample_ddim, to_uint8
    from diffusion_uncertainty_tpu.factory import instantiate_model_scheduler

    bundle = instantiate_model_scheduler("cifar10", dtype=jnp.float32, models_dir=MODELS)
    cfg = SamplerConfig(num_inference_steps=50)
    xT = jax.random.normal(jax.random.key(0), (4, 32, 32, 3))
    model_fn = lambda x, t, k: bundle.apply_fn(bundle.params, x, t, None, k)
    res = sample_ddim(model_fn, bundle.schedule, xT, jax.random.key(1), cfg)
    img = np.asarray(to_uint8(res.sample))
    # non-degenerate images: real spread in pixel values, not collapsed
    assert img.std() > 20
    assert 30 < img.mean() < 225


@needs("pt_inception-2015-12-05-6726825d.pth")
def test_inception_features_checkpoint():
    import jax.numpy as jnp

    from diffusion_uncertainty_tpu.metrics.features import InceptionV3Features

    ext = InceptionV3Features(MODELS / "pt_inception-2015-12-05-6726825d.pth")
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (4, 64, 64, 3), np.uint8)
    f = np.asarray(ext(jnp.asarray(imgs)))
    assert f.shape == (4, 2048)
    assert np.isfinite(f).all()
    # pooled inception features of random noise are positive-ish and non-constant
    assert f.std() > 1e-3
