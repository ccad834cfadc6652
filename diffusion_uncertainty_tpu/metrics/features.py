"""Feature extractors for FID / precision-recall, batched on TPU.

``InceptionV3Features`` reimplements the pytorch-fid InceptionV3 (the
tf-ported torchvision architecture with count_include_pad=False average pools
and a max-pool branch in the final InceptionE — reference uses it via
``pytorch_fid`` in ``fid.py:73-122`` and ``scripts/compute_dataset_fid.py``)
in flax/NHWC, with a converter from the pytorch-fid/torchvision state dict.
Weights are NOT downloadable in air-gapped environments; place
``pt_inception-2015-12-05-6726825d.pth`` under ``models/`` (the file
pytorch-fid caches) and pass its path.

``RandomConvFeatures`` is a weight-free deterministic extractor for tests and
for relative A/B comparisons when no checkpoint is available.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "RandomConvFeatures",
    "InceptionV3",
    "InceptionV3Features",
    "convert_inception",
    "VGG16",
    "VGG16Features",
    "convert_vgg16",
]


class RandomConvFeatures:
    """Deterministic random-projection features: strided random convs +
    global pooling. Weight-free stand-in with the same (uint8 NHWC -> [N, dim])
    contract as the Inception extractor."""

    def __init__(self, dim: int = 256, seed: int = 0, image_size: int = 32):
        self.dim = dim
        k1, k2 = jax.random.split(jax.random.key(seed))
        self._w1 = jax.random.normal(k1, (4, 4, 3, 64), jnp.float32) / 12.0
        self._w2 = jax.random.normal(k2, (4, 4, 64, dim), jnp.float32) / 48.0

        @jax.jit
        def fwd(images_uint8):
            x = images_uint8.astype(jnp.float32) / 127.5 - 1.0
            x = jax.lax.conv_general_dilated(
                x, self._w1, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            x = jnp.tanh(x)
            x = jax.lax.conv_general_dilated(
                x, self._w2, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return x.mean(axis=(1, 2))

        self._fwd = fwd

    def __call__(self, images_uint8: jnp.ndarray) -> jnp.ndarray:
        return self._fwd(images_uint8)


# ---------------------------------------------------------------------------
# InceptionV3 (pytorch-fid variant)
# ---------------------------------------------------------------------------


class BasicConv(nn.Module):
    out: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.out, self.kernel, strides=self.strides, padding=pad, use_bias=False, name="conv")(x)
        # inference-mode batchnorm, eps=1e-3 (torchvision InceptionV3)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (self.out,), jnp.float32)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avg_pool_no_pad(x, window=3):
    """3x3 stride-1 average pool with count_include_pad=False (the pytorch-fid
    patch vs torchvision): divide by the number of VALID taps per position."""
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    return summed / counts


def _max_pool(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_no_pad(x)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_no_pad(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # the FID variant's final block uses max pool

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            bp = _avg_pool_no_pad(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Feature trunk to the 2048-d pooled features (no fc)."""

    @nn.compact
    def __call__(self, x):  # x in [-1, 1], [B, 299, 299, 3]
        x = BasicConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # adaptive avg pool -> [B, 2048]


def convert_inception(sd: dict) -> dict:
    """pytorch-fid / torchvision InceptionV3 state dict → flax params."""
    params: dict = {}

    def put(path: list[str], leaf: str, value):
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for key, v in sd.items():
        if key.startswith(("fc.", "AuxLogits")):
            continue  # classifier head / aux tower unused for features
        parts = key.split(".")
        # e.g. Mixed_5b.branch1x1.conv.weight / ...bn.weight
        *mods, kind, leaf = parts
        path = mods
        v = np.asarray(v, np.float32)
        if kind == "conv" and leaf == "weight":
            put(path + ["conv"], "kernel", np.transpose(v, (2, 3, 1, 0)))
        elif kind == "bn":
            name = {
                "weight": "bn_scale",
                "bias": "bn_bias",
                "running_mean": "bn_mean",
                "running_var": "bn_var",
            }.get(leaf)
            if name is None:
                continue  # num_batches_tracked
            put(path, name, v)
        else:
            raise KeyError(f"unexpected inception key: {key}")
    return {"params": params}


class InceptionV3Features:
    """uint8 NHWC [N,H,W,3] -> [N, 2048] pytorch-fid pooled features:
    bilinear resize to 299², scale to [-1,1], Inception trunk."""

    dim = 2048

    def __init__(self, weights_path: Path, dtype=jnp.float32):
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        if not isinstance(sd, dict) or "state_dict" in sd:
            sd = sd.get("state_dict", sd)
        self.params = jax.tree.map(jnp.asarray, convert_inception({k: t.numpy() for k, t in sd.items()}))
        model = InceptionV3()

        @jax.jit
        def fwd(images_uint8):
            x = images_uint8.astype(jnp.float32) / 255.0
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
            x = 2.0 * x - 1.0
            return model.apply(self.params, x.astype(dtype)).astype(jnp.float32)

        self._fwd = fwd

    def __call__(self, images_uint8: jnp.ndarray) -> jnp.ndarray:
        return self._fwd(images_uint8)


# ---------------------------------------------------------------------------
# VGG16 (improved-P&R protocol: vgg16-fc2 features, reference
# ``metrics/precision_recall.py:128-161``)
# ---------------------------------------------------------------------------

# torchvision vgg16 "features" conv layer indices (keys features.{i}.weight)
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG16_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
# maxpool after these conv positions (0-based within the 13 convs)
_VGG16_POOL_AFTER = frozenset({1, 3, 6, 9, 12})


class VGG16(nn.Module):
    """torchvision VGG16 trunk + fc1/fc2 classifier head.

    ``__call__(x[B,224,224,3] float) -> [B, 4096]`` fc2 features — the
    improved-P&R embedding (``vgg16.classifier[:4]``: Linear→ReLU→Dropout→
    Linear, dropout inert at inference). Channel-last; converter handles the
    NCHW→HWIO transpose and the 7·7·512 flatten order.
    """

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate(_VGG16_CHANNELS):
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{i}")(x)
            x = nn.relu(x)
            if i in _VGG16_POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # torch flattens NCHW [B,512,7,7] -> [B, 512*7*7]; we are NHWC so
        # transpose before flattening to keep the fc1 weight layout identical
        b = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)
        x = nn.relu(nn.Dense(4096, name="fc1")(x))
        return nn.Dense(4096, name="fc2")(x)


def convert_vgg16(sd: dict) -> dict:
    """torchvision ``vgg16().state_dict()`` → flax params for ``VGG16``.

    classifier.6 (the 1000-way logits head) is unused by the P&R protocol and
    is accepted-but-dropped.
    """
    params: dict = {}
    for i, idx in enumerate(_VGG16_CONV_IDX):
        w = np.asarray(sd[f"features.{idx}.weight"], np.float32)  # [O,I,3,3]
        params[f"conv_{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": np.asarray(sd[f"features.{idx}.bias"], np.float32),
        }
    for name, key in (("fc1", "classifier.0"), ("fc2", "classifier.3")):
        params[name] = {
            "kernel": np.asarray(sd[f"{key}.weight"], np.float32).T,
            "bias": np.asarray(sd[f"{key}.bias"], np.float32),
        }
    expected = {f"features.{i}.{s}" for i in _VGG16_CONV_IDX for s in ("weight", "bias")}
    expected |= {f"classifier.{i}.{s}" for i in (0, 3, 6) for s in ("weight", "bias")}
    unknown = set(sd) - expected
    if unknown:
        raise ValueError(f"unexpected vgg16 checkpoint keys: {sorted(unknown)[:8]}")
    return {"params": params}


class VGG16Features:
    """uint8 NHWC [N,H,W,3] -> [N, 4096] improved-P&R features.

    Protocol parity with the reference extractor
    (``metrics/precision_recall.py:136-161``): inputs scaled to [0,1]
    (torchvision ToTensor), images smaller than 224 center-padded with zeros,
    larger ones nearest-resized (torch ``F.interpolate`` default mode), then
    the vgg16-fc2 embedding.
    """

    dim = 4096

    def __init__(self, weights_path: Path, dtype=jnp.float32):
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        self.params = jax.tree.map(
            jnp.asarray, convert_vgg16({k: t.numpy() for k, t in sd.items()})
        )
        model = VGG16()

        @jax.jit
        def fwd(images_uint8):
            x = images_uint8.astype(jnp.float32) / 255.0
            h, w = x.shape[1], x.shape[2]
            if h < 224 or w < 224:
                ph, pw = (224 - h) // 2, (224 - w) // 2
                x = jnp.pad(x, ((0, 0), (ph, 224 - h - ph), (pw, 224 - w - pw), (0, 0)))
            elif (h, w) != (224, 224):
                x = jax.image.resize(x, (x.shape[0], 224, 224, 3), "nearest")
            return model.apply(self.params, x.astype(dtype)).astype(jnp.float32)

        self._fwd = fwd

    def __call__(self, images_uint8: jnp.ndarray) -> jnp.ndarray:
        return self._fwd(images_uint8)
