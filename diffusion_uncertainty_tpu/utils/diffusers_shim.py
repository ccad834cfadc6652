"""``sys.modules`` stand-ins for the diffusers symbols the reference's
scheduler forks import.

The reference's uncertainty schedulers (``schedulers_uncertainty/*.py``) are
diffusers forks and import ``ConfigMixin``/``BaseOutput``/``randn_tensor``
etc. from the diffusers package, which is not installed in this zero-egress
environment. :func:`install_diffusers_shim` registers minimal *functional*
stand-ins so those reference files can be imported and run as numerical
oracles (see ``utils.activation_diff.zigzag_window_diff``); a real diffusers
installation, if present, always wins.

Only the surface the reference schedulers actually touch is provided:

- ``register_to_config`` captures the bound ``__init__`` arguments onto
  ``self.config`` (the forks read ``self.config.prediction_type`` & co.)
- ``BaseOutput`` is a plain attribute-record base for their ``@dataclass``
  step outputs
- ``randn_tensor`` forwards to ``torch.randn``
- the mixin/base/model types are empty placeholders (the forks only subclass
  or type-annotate with them)
"""

from __future__ import annotations

import enum
import functools
import inspect
import sys
import types

__all__ = ["install_diffusers_shim"]


def install_diffusers_shim() -> bool:
    """Register the shim modules; returns True if the shim is active.

    No-op (returns False) when a real diffusers is importable, True when the
    shim was installed now or by an earlier call.
    """
    try:
        import diffusers  # noqa: F401

        if not getattr(sys.modules["diffusers"], "__du_tpu_shim__", False):
            return False  # real diffusers present
        return True
    except ImportError:
        pass

    import torch

    def register_to_config(init):
        @functools.wraps(init)
        def wrapped(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            self.config = types.SimpleNamespace(
                **{k: v for k, v in bound.arguments.items() if k != "self"}
            )
            init(self, *args, **kwargs)

        return wrapped

    class ConfigMixin:
        config_name = "scheduler_config.json"

    class SchedulerMixin:
        pass

    class BaseOutput:
        pass

    class SchedulerOutput:
        def __init__(self, **kwargs):
            for k, v in kwargs.items():
                setattr(self, k, v)

    class UNet2DModel:  # type-annotation / isinstance target only
        pass

    class ResnetBlock2D:
        pass

    class KarrasDiffusionSchedulers(enum.Enum):
        # the forks only do `[e.name for e in KarrasDiffusionSchedulers]`
        DDIMScheduler = 1
        DDPMScheduler = 2
        PNDMScheduler = 3

    def randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
        if isinstance(generator, (list, tuple)):
            generator = generator[0] if generator else None
        return torch.randn(tuple(shape), generator=generator, dtype=dtype)

    def _mod(name: str, **attrs):
        m = types.ModuleType(name)
        m.__du_tpu_shim__ = True
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        parent, _, child = name.rpartition(".")
        if parent and parent in sys.modules:
            setattr(sys.modules[parent], child, m)
        return m

    _mod("diffusers")
    _mod("diffusers.models")
    _mod("diffusers.models.unets", UNet2DModel=UNet2DModel)
    _mod("diffusers.models.resnet", ResnetBlock2D=ResnetBlock2D)
    _mod(
        "diffusers.configuration_utils",
        ConfigMixin=ConfigMixin,
        register_to_config=register_to_config,
    )
    _mod("diffusers.utils", BaseOutput=BaseOutput)
    _mod("diffusers.utils.outputs", BaseOutput=BaseOutput)
    _mod("diffusers.utils.torch_utils", randn_tensor=randn_tensor)
    _mod("diffusers.schedulers")
    _mod(
        "diffusers.schedulers.scheduling_utils",
        KarrasDiffusionSchedulers=KarrasDiffusionSchedulers,
        SchedulerMixin=SchedulerMixin,
        SchedulerOutput=SchedulerOutput,
    )

    # the guided class-conditional pipelines additionally import beartype
    # (a runtime type-check decorator — pass-through here) and `click.Option`
    # (imported but unused, ``pipeline_..._posterior_distribution.py:3``)
    if "beartype" not in sys.modules:
        def _beartype(obj=None, **kwargs):
            if obj is None:  # @beartype(conf=...) usage
                return lambda f: f
            return obj

        _mod("beartype", beartype=_beartype)
    if "click" not in sys.modules:
        _mod(
            "click",
            Option=type("Option", (), {}),
            prompt=lambda *a, **k: None,
        )
    # metrics/precision_recall.py imports `path.Path` (jaraco/path.py) and
    # torchvision (vgg16 weights + transforms) at module top; the kNN math we
    # oracle (compute_pairwise_distances/distances2radii/compute_metric)
    # touches neither, so minimal stand-ins suffice
    if "path" not in sys.modules:
        import pathlib

        _mod("path", Path=pathlib.Path)
    if "torchvision" not in sys.modules:
        def _no_weights(*a, **k):
            raise RuntimeError("torchvision shim: model weights unavailable")

        _mod("torchvision")
        _mod("torchvision.models", vgg16=_no_weights, VGG16_Weights=types.SimpleNamespace(DEFAULT=None))
        _mod("torchvision.transforms", Compose=_no_weights, Resize=_no_weights, ToTensor=_no_weights)
    return True
