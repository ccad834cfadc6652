"""Flax model zoo: ADM UNet (+classifier), HF-style UNet2D, SD-class
conditional UNet, U-ViT (+KL-AE).

All models are NHWC (TPU conv-native), take traced int32 timesteps, and expose
``.apply``-style pure forwards. Checkpoint converters from the reference's
PyTorch state dicts live in ``convert.py``.
"""

from .adm_unet import ADMUNet, ADMUNetConfig, ADMClassifier, ADMClassifierConfig  # noqa: F401
from .unet2d import UNet2D, UNet2DConfig  # noqa: F401
from .sd_unet import SDUNet, SDUNetConfig  # noqa: F401
from .mmdit import MMDiT, MMDiTConfig  # noqa: F401
from .flux import FluxTransformer, FluxConfig  # noqa: F401
from .uvit import UViT, UViTConfig  # noqa: F401
from .autoencoder import AutoencoderKL, AutoencoderKLConfig  # noqa: F401
from .clip_text import CLIPTextEncoder, CLIPTextConfig, CLIPTextOutput  # noqa: F401
from .clip_vision import CLIPVisionEncoder, CLIPVisionConfig, CLIPVisionOutput  # noqa: F401
from .t5_text import T5Encoder, T5Config  # noqa: F401
