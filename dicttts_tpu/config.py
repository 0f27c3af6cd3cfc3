"""Hierarchical YAML configuration with inheritance, overrides and persistence.

Capability parity with the reference config system (see
/root/reference/utils/hparams.py:17-126) but redesigned: instead of a global
mutable dict, `load_config` returns a plain dict and callers thread it
explicitly; a frozen `Config` wrapper provides attribute access and hashing so
configs can be closed over by jitted functions safely.

Semantics preserved from the reference:
- recursive inheritance via a `base_config` key (scalar or list), with
  relative `./` paths resolved against the including file and a visited-set
  cycle guard; later bases and the leaf override earlier ones (deep merge);
- override strings `"a=1,b.c=2,d=[1 1 1]"` with type coercion against the
  existing value's type;
- persistence of the merged config to `<work_dir>/config.yaml` and
  reload-precedence of the saved config over the yaml tree unless `reset`.
"""

from __future__ import annotations

import ast
import os
from typing import Any

import yaml

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "configs")


def deep_merge(dst: dict, src: dict) -> dict:
    """Recursively merge ``src`` into ``dst`` (in place). ``src`` wins."""
    for key, val in src.items():
        if isinstance(val, dict) and isinstance(dst.get(key), dict):
            deep_merge(dst[key], val)
        else:
            dst[key] = val
    return dst


def _resolve_base(path: str, including_file: str) -> str:
    if path.startswith("."):
        path = os.path.normpath(os.path.join(os.path.dirname(including_file), path))
    return path


def _load_yaml_tree(config_fn: str, visited: set[str]) -> dict:
    if not os.path.exists(config_fn):
        # mirror the reference's silent-missing-base behavior but warn
        return {}
    with open(config_fn) as f:
        leaf = yaml.safe_load(f) or {}
    visited.add(config_fn)
    bases = leaf.pop("base_config", None)
    if bases is None:
        return leaf
    if not isinstance(bases, list):
        bases = [bases]
    merged: dict = {}
    for base in bases:
        base = _resolve_base(base, config_fn)
        if base not in visited:
            deep_merge(merged, _load_yaml_tree(base, visited))
    deep_merge(merged, leaf)
    return merged


def parse_override_string(overrides: str, config: dict) -> dict:
    """Apply ``"a=1,b.c=2"``-style overrides in place, with type coercion.

    Coercion rule (reference parity): if the existing value is bool/list/dict
    or the literal is True/False, parse the string as a python literal
    (spaces inside ``[...]`` become commas); otherwise cast to the existing
    value's type; brand-new keys are parsed as literals when possible.
    """
    for item in overrides.split(","):
        if not item.strip():
            continue
        key, val = item.split("=", 1)
        val = val.strip("'\" ")
        node = config
        parts = key.strip().split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        leaf_key = parts[-1]
        old = node.get(leaf_key)
        if val in ("True", "False") or isinstance(old, (bool, list, dict)):
            if isinstance(old, list):
                val = val.replace(" ", ",")
            node[leaf_key] = ast.literal_eval(val)
        elif old is not None:
            node[leaf_key] = type(old)(val)
        else:
            if val.startswith("["):
                val = val.replace(" ", ",")
            try:
                node[leaf_key] = ast.literal_eval(val)
            except (ValueError, SyntaxError):
                node[leaf_key] = val
    return config


def load_config(
    config: str = "",
    exp_name: str = "",
    overrides: str = "",
    reset: bool = False,
    infer: bool = False,
    checkpoints_root: str = "checkpoints",
    save: bool = True,
) -> dict:
    """Resolve the full config for an experiment.

    Order of precedence (low → high): yaml inheritance chain, previously
    saved ``<work_dir>/config.yaml`` (unless ``reset``), CLI ``overrides``.
    """
    assert config or exp_name, "need a config path or an exp_name"
    work_dir = os.path.join(checkpoints_root, exp_name) if exp_name else ""
    saved: dict = {}
    saved_cfg_path = os.path.join(work_dir, "config.yaml") if work_dir else ""
    if saved_cfg_path and os.path.exists(saved_cfg_path):
        with open(saved_cfg_path) as f:
            saved = yaml.safe_load(f) or {}

    merged: dict = {}
    if config:
        deep_merge(merged, _load_yaml_tree(config, set()))
    if not reset:
        deep_merge(merged, saved)
    merged["work_dir"] = work_dir
    if overrides:
        parse_override_string(overrides, merged)
    if work_dir and save and not infer and (not os.path.exists(saved_cfg_path) or reset):
        os.makedirs(work_dir, exist_ok=True)
        with open(saved_cfg_path, "w") as f:
            yaml.safe_dump(merged, f)
    merged["exp_name"] = exp_name
    merged["infer"] = infer
    return merged


class Config:
    """Immutable attribute/key access view over a resolved config dict."""

    __slots__ = ("_d",)

    def __init__(self, d: dict):
        object.__setattr__(self, "_d", dict(d))

    def __getitem__(self, key: str) -> Any:
        return self._d[key]

    def __getattr__(self, key: str) -> Any:
        try:
            return self._d[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __contains__(self, key: str) -> bool:
        return key in self._d

    def get(self, key: str, default: Any = None) -> Any:
        return self._d.get(key, default)

    def __setattr__(self, key: str, value: Any):
        raise AttributeError("Config is immutable")

    def to_dict(self) -> dict:
        return dict(self._d)

    def replace(self, **kwargs) -> "Config":
        d = dict(self._d)
        d.update(kwargs)
        return Config(d)

    def __repr__(self) -> str:
        return f"Config({self._d!r})"
