"""Config system: YAML + dotted CLI overrides, and ``target:`` instantiation.

Plays the role of the reference's OmegaConf usage (argparse merged with
YAML, CLI wins — ``src/inference.py:148-159``) and the dotted
``target:``+``params:`` object instantiation (``src/data/base.py:23-34``),
without depending on omegaconf.
"""

from __future__ import annotations

import copy
import importlib
from typing import Any, Iterable, Mapping

import yaml


class Config(dict):
    """A dict with attribute access and recursive wrapping."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, Mapping) and not isinstance(obj, Config):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, Config):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> dict:
        def unwrap(o):
            if isinstance(o, Mapping):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o
        return unwrap(self)

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node: Any = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], Mapping):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = Config.wrap(value)


def load_yaml(path: str) -> Config:
    with open(path, "r") as f:
        data = yaml.safe_load(f) or {}
    return Config.wrap(data)


def merge(base: Mapping, override: Mapping) -> Config:
    """Recursive merge; values in `override` win (CLI-wins semantics)."""
    out = Config.wrap(copy.deepcopy(dict(base)))
    for k, v in override.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = merge(out[k], v)
        else:
            out[k] = Config.wrap(v)
    return out


def parse_cli_overrides(args: Iterable[str]) -> Config:
    """Parse ``key.path=value`` tokens; values go through YAML typing."""
    cfg = Config()
    for token in args:
        if "=" not in token:
            raise ValueError(f"override must look like key=value, got {token!r}")
        key, raw = token.split("=", 1)
        key = key.lstrip("-")
        value = yaml.safe_load(raw)
        if isinstance(value, str):
            # YAML 1.1 won't parse "1e-4" as a float; people type it anyway.
            try:
                value = float(value)
            except ValueError:
                pass
        cfg.set_path(key, value)
    return cfg


def load_config(yaml_path: str | None = None, cli_args: Iterable[str] = ()) -> Config:
    base = load_yaml(yaml_path) if yaml_path else Config()
    return merge(base, parse_cli_overrides(cli_args))


def instantiate(spec: Mapping, **extra_kwargs: Any) -> Any:
    """Instantiate ``{"target": "pkg.mod.Cls", "params": {...}}`` specs."""
    target = spec["target"]
    module_name, _, attr = target.rpartition(".")
    cls = getattr(importlib.import_module(module_name), attr)
    params = dict(spec.get("params", {}) or {})
    params.update(extra_kwargs)
    return cls(**params)
