"""Typed config tree + explicit registry.

Replaces both reference config generations (SURVEY.md §5 'Config / flag
system'): the ccdm flat-YAML `params` dict threaded through every
function (ddpm_train.py:23-24) and the LDM OmegaConf
`instantiate_from_config({target, params})` reflection (main.py:596-619,
the function itself lives in the missing models/util.py).

Here: a small explicit `Registry` maps names -> constructors, YAML files
load into plain dicts with dotted-key overrides, and `instantiate`
resolves `{target: name, params: {...}}` nodes through the registry only
— no arbitrary import-by-string, no magic sentinels."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence

__all__ = ["Registry", "instantiate", "load_yaml_config", "apply_overrides"]


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._items: Dict[str, Callable] = {}

    def register(self, name: str) -> Callable:
        def deco(fn):
            if name in self._items:
                raise KeyError(f"{self.name}: duplicate registration {name!r}")
            self._items[name] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable:
        if name not in self._items:
            raise KeyError(f"{self.name}: unknown target {name!r}; known: {sorted(self._items)}")
        return self._items[name]

    def __contains__(self, name: str) -> bool:
        return name in self._items


# global registries
MODELS = Registry("models")
DATASETS = Registry("datasets")
ENCODERS = Registry("encoders")


def instantiate(node: dict, registry: Registry, **extra):
    """{'target': name, 'params': {...}} -> registry[name](**params, **extra)."""
    if not isinstance(node, dict) or "target" not in node:
        raise ValueError(f"config node must be a dict with 'target', got {node!r}")
    params = dict(node.get("params") or {})
    params.update(extra)
    return registry.get(node["target"])(**params)


def load_yaml_config(*paths, overrides: Optional[Sequence[str]] = None) -> dict:
    """Merge YAML files left-to-right, then apply key=value dotlist overrides
    (the LDM CLI surface: --base cfg1 cfg2 k.x=v, main.py:596-598)."""
    import yaml

    cfg: dict = {}
    for p in paths:
        with open(p) as f:
            _deep_merge(cfg, yaml.safe_load(f) or {})
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg


def _deep_merge(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def apply_overrides(cfg: dict, overrides: Sequence[str]) -> dict:
    """'a.b.c=value' dotlist; values parsed as YAML scalars."""
    import yaml

    for ov in overrides:
        key, _, raw = ov.partition("=")
        if not _:
            raise ValueError(f"override {ov!r} must be key=value")
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(raw)
    return cfg
