"""YAML config system with ``target``/``params`` reflective instantiation.

Drop-in replacement for the reference's OmegaConf-based loader
(reference: enhancing/utils/general.py:29-76): configs are YAML trees where any
node of the form ``{target: "dotted.path.Class", params: {...}}`` is buildable
via :func:`initialize_from_config`, and a top-level ``base_config`` key merges a
parent YAML recursively. Implemented on plain dicts (attribute-style access via
:class:`ConfigDict`) so there is no omegaconf dependency.
"""
from __future__ import annotations

import importlib
from pathlib import Path
from typing import Any, Mapping

import yaml


class ConfigDict(dict):
    """A dict with attribute access and recursive wrapping, OmegaConf-style."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __getitem__(self, key: str) -> Any:
        # Wrap IN PLACE: returning a fresh wrapper around a nested plain
        # dict hands the caller a shallow COPY, silently dropping mutations
        # like ``config.model["params"]["dtype"] = ...`` (main.py's -a flag
        # did exactly that and the dtype never reached the model).
        value = dict.__getitem__(self, key)
        wrapped = _wrap(value)
        if wrapped is not value and isinstance(value, (Mapping, list)):
            dict.__setitem__(self, key, wrapped)
        return wrapped

    def get(self, key: str, default: Any = None) -> Any:
        if key in self:
            return self[key]
        return _wrap(default)

    def to_dict(self) -> dict:
        return _unwrap(self)


def _wrap(value: Any) -> Any:
    if isinstance(value, ConfigDict):
        return value
    if isinstance(value, Mapping):
        return ConfigDict(value)
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    return value


def _unwrap(value: Any) -> Any:
    if isinstance(value, Mapping):
        return {k: _unwrap(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_unwrap(v) for v in value]
    return value


def merge_configs(base: Mapping, override: Mapping) -> ConfigDict:
    """Deep merge: ``override`` wins; dicts merge recursively, lists replace."""
    out = dict(base)
    for key, value in override.items():
        if key in out and isinstance(out[key], Mapping) and isinstance(value, Mapping):
            out[key] = merge_configs(out[key], value)
        else:
            out[key] = value
    return ConfigDict(out)


def load_config(path: str | Path) -> ConfigDict:
    """Load a YAML config, recursively merging an optional ``base_config``."""
    path = Path(path)
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if "base_config" in cfg:
        base_path = cfg.pop("base_config")
        if not str(base_path).endswith((".yaml", ".yml")):
            raise ValueError(f"base_config must be a YAML path, got {base_path!r}")
        base_path = Path(base_path)
        if not base_path.is_absolute():
            base_path = path.parent / base_path
        base = load_config(base_path)
        return merge_configs(base, cfg)
    return ConfigDict(cfg)


# Alias matching the reference public name (enhancing/utils/general.py:63).
get_config_from_file = load_config


def get_obj_from_str(name: str, reload: bool = False) -> Any:
    """Resolve ``"pkg.module.Attr"`` to the attribute object."""
    module_name, attr = name.rsplit(".", 1)
    module = importlib.import_module(module_name)
    if reload:
        module = importlib.reload(module)
    return getattr(module, attr)


def initialize_from_config(config: Mapping, **extra_kwargs: Any) -> Any:
    """Build the object described by ``{target: ..., params: {...}}``.

    ``extra_kwargs`` are merged over the config params — used to thread
    runtime-only objects (rngs, meshes) into constructors.
    """
    if "target" not in config:
        raise KeyError(f"Expected a 'target' key in config, got keys {list(config)}")
    params = _unwrap(config.get("params", {}) or {})
    params.update(extra_kwargs)
    return get_obj_from_str(config["target"])(**params)
