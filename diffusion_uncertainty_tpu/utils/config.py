"""Typed config system: dataclasses + YAML files + CLI overrides.

Replaces the reference's three-layer argparse/YAML merge
(``scripts/generate_images_with_uncertainty_threshold.py:111-117``,
``diffusion_uncertainty/argparse.py:4-48``) with one precedence rule:
**dataclass defaults < YAML config file < CLI flags** — the same effective
semantics (CLI wins) without the set_defaults/re-parse dance.

Usage:
    @dataclasses.dataclass
    class GenConfig:
        dataset: str = "cifar10"
        M: int = 30
        ...
    cfg = parse_config(GenConfig, argv)   # supports --config file.yaml + --M 5
    save_config(cfg, run_dir / "args.yaml")  # run-metadata round-trip
"""

from __future__ import annotations

import argparse
import dataclasses
import typing
from pathlib import Path
from typing import Any, Optional, Sequence, Type, TypeVar

import yaml

T = TypeVar("T")

__all__ = ["parse_config", "load_yaml", "save_config", "config_to_dict", "from_dict"]


def load_yaml(path: str | Path) -> dict[str, Any]:
    with open(path) as f:
        out = yaml.safe_load(f)
    return out or {}


def config_to_dict(cfg: Any) -> dict[str, Any]:
    return dataclasses.asdict(cfg)


def save_config(cfg: Any, path: str | Path) -> None:
    """Round-trip run metadata like the reference's per-run ``args.yaml``
    (``scripts/generate_dataset_score_uncertainty_imagenet.py:104-134``)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config_to_dict(cfg), f, sort_keys=True)


def _unwrap_optional(tp: Any) -> Any:
    if typing.get_origin(tp) is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0]
    return tp


def _coerce(tp: Any, value: Any) -> Any:
    tp = _unwrap_optional(tp)
    if value is None:
        return None
    origin = typing.get_origin(tp)
    if origin in (list, tuple) or tp in (list, tuple):
        args = typing.get_args(tp)
        elem = args[0] if args else str
        seq = value if isinstance(value, (list, tuple)) else str(value).split(",")
        out = [_coerce(elem, v) for v in seq]
        return tuple(out) if (origin is tuple or tp is tuple) else out
    if tp is bool:
        if isinstance(value, bool):
            return value
        return str(value).lower() in ("1", "true", "yes", "on")
    if tp in (int, float, str):
        return tp(value)
    return value


def from_dict(cls: Type[T], data: dict[str, Any], strict: bool = True) -> T:
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown and strict:
        raise KeyError(f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    kwargs = {}
    for name, f in fields.items():
        if name in data:
            kwargs[name] = _coerce(f.type if not isinstance(f.type, str) else _resolve(cls, f), data[name])
    return cls(**kwargs)


def _resolve(cls: Type, f: dataclasses.Field) -> Any:
    hints = typing.get_type_hints(cls)
    return hints.get(f.name, str)


def parse_config(
    cls: Type[T],
    argv: Optional[Sequence[str]] = None,
    defaults: Optional[dict[str, Any]] = None,
) -> T:
    """Build ``cls`` from defaults < ``--config`` YAML < explicit CLI flags."""
    hints = typing.get_type_hints(cls)
    parser = argparse.ArgumentParser(description=cls.__doc__)
    parser.add_argument("--config", type=str, default=None, help="YAML config file")
    for f in dataclasses.fields(cls):
        tp = _unwrap_optional(hints.get(f.name, str))
        flag = "--" + f.name.replace("_", "-")
        if tp is bool:
            parser.add_argument(flag, type=str, default=None, metavar="BOOL")
        elif typing.get_origin(tp) in (list, tuple) or tp in (list, tuple):
            parser.add_argument(flag, type=str, default=None, help="comma-separated")
        else:
            parser.add_argument(flag, type=str, default=None)
    ns = parser.parse_args(argv)

    merged: dict[str, Any] = dict(defaults or {})
    if ns.config:
        merged.update(load_yaml(ns.config))
    for f in dataclasses.fields(cls):
        v = getattr(ns, f.name, None)
        if v is not None:
            merged[f.name] = v
    return from_dict(cls, merged)
