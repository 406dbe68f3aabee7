"""Hydra-style YAML config with dotted CLI overrides and ${...} interpolation.

The reference drives everything through hydra + omegaconf
(``/root/reference/train.py:201``, ``/root/reference/conf/conf.yaml``):
``python train.py data.num_worker=4 train.learning_rate=1e-3``.  This module
provides the same user surface without the hydra dependency:

  * ``load_config("conf/conf.yaml", overrides=["a.b=1"])``
  * attribute **and** item access (``cfg.train.learning_rate`` / ``cfg["train"]``)
  * ``${path.to.key}`` string interpolation (as in the reference's composed
    Comet experiment names, ``conf/conf.yaml:44-46``)
  * a ``defaults:`` list naming sibling YAML groups (``- log: hypra_logger``
    loads ``conf/log/hypra_logger.yaml`` under key ``log``)
"""

from __future__ import annotations

import copy
import json
import re
from pathlib import Path
from typing import Any, Iterable, Mapping

import yaml

_INTERP = re.compile(r"\$\{([^}]+)\}")


class Config(dict):
    """A dict with attribute access, recursive over nested mappings."""

    def __init__(self, data: Mapping[str, Any] | None = None):
        super().__init__()
        for k, v in (data or {}).items():
            self[k] = _wrap(v)

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def get(self, key: str, default: Any = None) -> Any:  # dotted get
        node: Any = self
        for part in key.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def set(self, key: str, value: Any) -> None:  # dotted set
        parts = key.split(".")
        node: Any = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], Config):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = _wrap(value)

    def to_dict(self) -> dict:
        return {k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()}

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False, allow_unicode=True)

    def __deepcopy__(self, memo):
        return Config(copy.deepcopy(self.to_dict(), memo))


def _wrap(v: Any) -> Any:
    if isinstance(v, Config):
        return v
    if isinstance(v, Mapping):
        return Config(v)
    if isinstance(v, list):
        return [_wrap(x) for x in v]
    return v


def _parse_value(text: str) -> Any:
    """Parse an override value with YAML semantics plus hydra-style numeric
    coercion (YAML 1.1 treats '5e-3' as a string; hydra reads it as float)."""
    try:
        value = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(value, str):
        try:
            return int(value)
        except ValueError:
            pass
        try:
            return float(value)
        except ValueError:
            pass
    return value


def parse_overrides(args: Iterable[str]) -> list[tuple[str, Any]]:
    """Parse ``key.path=value`` CLI override tokens."""
    out = []
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"override {arg!r} is not of the form key=value")
        key, _, value = arg.partition("=")
        out.append((key.strip(), _parse_value(value)))
    return out


def _resolve_interpolations(cfg: Config) -> None:
    """Resolve ``${a.b}`` references against the root config, in place.

    Also supports hydra's ``${now:%Y-%m-%d}`` resolver (one timestamp per
    resolution pass, so every ``now:`` in a config shares the same instant) —
    used by the run-dir template in ``conf/log/hypra_logger.yaml``, mirroring
    ``/root/reference/conf/log/hypra_logger.yaml:40-41``.
    """
    import datetime

    now = datetime.datetime.now()

    def lookup(name: str, depth: int) -> Any:
        if name.startswith("now:"):
            return now.strftime(name[4:])
        return resolve(cfg.get(name), depth)

    def resolve(val: Any, depth: int = 0) -> Any:
        if depth > 10:
            raise ValueError("interpolation depth exceeded (cycle?)")
        if isinstance(val, str):
            m = _INTERP.fullmatch(val.strip())
            if m:  # whole-string reference: keep the referenced type
                return lookup(m.group(1), depth + 1)

            def sub(mm: re.Match) -> str:
                ref = lookup(mm.group(1), depth + 1)
                return "" if ref is None else str(ref)

            return _INTERP.sub(sub, val)
        return val

    def walk(node: Any) -> Any:
        if isinstance(node, Config):
            for k in list(node.keys()):
                node[k] = walk(node[k])
            return node
        if isinstance(node, list):
            return [walk(x) for x in node]
        return resolve(node)

    walk(cfg)


def load_config(
    path: str | Path,
    overrides: Iterable[str] | None = None,
    resolve: bool = True,
) -> Config:
    """Load a YAML config, apply a ``defaults:`` group list, CLI overrides,
    then resolve interpolations."""
    path = Path(path)
    with open(path, encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config(raw)

    defaults = cfg.pop("defaults", None)
    if defaults:
        for entry in defaults:
            if isinstance(entry, Mapping):
                for group, name in entry.items():
                    gpath = path.parent / str(group) / f"{name}.yaml"
                    with open(gpath, encoding="utf-8") as f:
                        cfg[str(group)] = _wrap(yaml.safe_load(f) or {})
            elif isinstance(entry, str) and entry != "_self_":
                gpath = path.parent / f"{entry}.yaml"
                with open(gpath, encoding="utf-8") as f:
                    sub = yaml.safe_load(f) or {}
                for k, v in sub.items():
                    cfg.setdefault(k, _wrap(v))

    for key, value in parse_overrides(overrides or []):
        cfg.set(key, value)

    if resolve:
        _resolve_interpolations(cfg)
    return cfg


def config_from_dict(d: Mapping[str, Any]) -> Config:
    return Config(d)


def config_hash(cfg: Config) -> str:
    import hashlib

    return hashlib.sha256(json.dumps(cfg.to_dict(), sort_keys=True, default=str).encode()).hexdigest()[:12]
