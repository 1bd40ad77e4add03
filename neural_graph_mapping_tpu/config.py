"""Layered YAML configuration with dotted CLI overrides.

Self-contained, yoco-compatible replacement for the reference's config stack
(``yoco`` usage in run_mapping.py:2396-2406 and slam_dataset.py:192). Supports:

- ``load_config_from_args``: ``--config a.yaml b.yaml`` merged left-to-right,
  plus dotted overrides ``--model_kwargs.num_knn 4`` parsed as YAML values.
- Nested ``config:`` keys inside YAML files, which include parent files
  (parents first, own keys override).
- Search paths: each filename is resolved against a list of directories
  (cwd -> ~/.neural_graph_mapping_tpu -> package ``config/`` dir by default).
- ``str_to_object``: fully-qualified import strings as dependency injection
  (reference utils.py:114-138), e.g.
  ``neural_graph_mapping_tpu.models.NeuralFieldSet``.
"""

from __future__ import annotations

import argparse
import copy
import os
import pathlib
from pydoc import locate
from typing import Any, Iterable, List, Optional, Sequence, Union

import yaml

PACKAGE_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "config")

DEFAULT_SEARCH_PATHS = [
    "",  # current working dir
    "~/.neural_graph_mapping_tpu",
    os.path.normpath(PACKAGE_CONFIG_DIR),
]


def resolve_path(path: str, search_paths: Optional[Iterable[str]] = None) -> str:
    """Resolve a (possibly relative) path against a list of search dirs."""
    path = os.path.expanduser(str(path))
    if os.path.isabs(path) and os.path.isfile(path):
        return path
    for base in search_paths if search_paths is not None else DEFAULT_SEARCH_PATHS:
        candidate = os.path.join(os.path.expanduser(base), path)
        if os.path.isfile(candidate):
            return os.path.normpath(candidate)
    raise FileNotFoundError(f"Could not resolve config file {path!r}")


def _deep_merge(base: dict, override: dict) -> dict:
    """Recursively merge override into base (override wins)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _expand_env(x: Any) -> Any:
    """Recursively expand ${VAR} in string values (used for data roots)."""
    if isinstance(x, dict):
        return {k: _expand_env(v) for k, v in x.items()}
    if isinstance(x, list):
        return [_expand_env(v) for v in x]
    if isinstance(x, str):
        return os.path.expandvars(x)
    return x


def _load_file(path: str, search_paths: Optional[Iterable[str]]) -> dict:
    resolved = resolve_path(path, search_paths)
    with open(resolved) as f:
        data = _expand_env(yaml.safe_load(f) or {})
    # a file may pull in parent configs via a `config` key; parents first
    file_dir = os.path.dirname(resolved)
    local_search = [file_dir] + list(search_paths or DEFAULT_SEARCH_PATHS)
    return _expand_config_keys(data, local_search)


def _expand_config_keys(data: dict, search_paths: Iterable[str]) -> dict:
    if "config" not in data:
        return data
    parents = data.pop("config")
    if isinstance(parents, (str, os.PathLike)):
        parents = [parents]
    merged: dict = {}
    for parent in parents:
        merged = _deep_merge(merged, _load_file(parent, search_paths))
    return _deep_merge(merged, data)


def load_config(
    config: Union[str, os.PathLike, dict, None],
    current_dict: Optional[dict] = None,
    search_paths: Optional[Iterable[str]] = None,
) -> dict:
    """Merge a config (file path or dict) on top of ``current_dict``."""
    merged = copy.deepcopy(current_dict) if current_dict else {}
    if config is None:
        return merged
    if isinstance(config, (str, os.PathLike)):
        data = _load_file(str(config), search_paths)
    else:
        data = _expand_config_keys(copy.deepcopy(dict(config)), search_paths or DEFAULT_SEARCH_PATHS)
    return _deep_merge(merged, data)


def _set_dotted(config: dict, dotted_key: str, value: Any) -> None:
    keys = dotted_key.split(".")
    node = config
    for k in keys[:-1]:
        node = node.setdefault(k, {})
        if not isinstance(node, dict):
            raise ValueError(f"Cannot override non-dict key {k} in {dotted_key}")
    node[keys[-1]] = value


def load_config_from_args(
    argv: Optional[Sequence[str]] = None,
    search_paths: Optional[Iterable[str]] = None,
    default_config: Optional[List[str]] = None,
) -> dict:
    """Parse ``--config a.yaml b.yaml`` + dotted overrides from argv.

    Mirrors the reference entry point (run_mapping.py:2396-2406): config files
    merge left-to-right, then every ``--key.subkey value`` pair overrides, with
    values parsed as YAML (so numbers/bools/lists work).
    """
    parser = argparse.ArgumentParser(description="Run mapping.", allow_abbrev=False)
    parser.add_argument("--config", default=default_config or [], nargs="+")
    known, unknown = parser.parse_known_args(argv)

    config: dict = {}
    for path in known.config:
        config = _deep_merge(config, _load_file(path, search_paths))

    i = 0
    while i < len(unknown):
        arg = unknown[i]
        if not arg.startswith("--"):
            raise ValueError(f"Unexpected argument {arg!r}")
        key = arg[2:]
        if "=" in key:
            key, raw = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(unknown):
                raise ValueError(f"Missing value for override {arg!r}")
            raw = unknown[i + 1]
            i += 2
        _set_dotted(config, key, _parse_override_value(raw))
    return config


def _parse_override_value(raw: str) -> Any:
    """YAML-parse a CLI override, with a float fallback for exponent
    notation like ``1e-3`` that YAML 1.1 treats as a string."""
    value = yaml.safe_load(raw)
    if isinstance(value, str):
        try:
            return float(value)
        except ValueError:
            return value
    return value


def save_config_to_file(path: Union[str, os.PathLike], config: dict) -> None:
    """Write a config dict to YAML (reference run_mapping.py:2161-2164)."""
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(_plain(config), f, sort_keys=False)


def _plain(x: Any) -> Any:
    """Convert numpy/jax scalars and paths to plain python for YAML dumping."""
    if isinstance(x, dict):
        return {k: _plain(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_plain(v) for v in x]
    if isinstance(x, (str, int, float, bool)) or x is None:
        return x
    if isinstance(x, os.PathLike):
        return str(x)
    if hasattr(x, "item"):
        try:
            return x.item()
        except Exception:
            pass
    return str(x)


def str_to_object(name: str) -> Any:
    """Resolve a fully-qualified name to an object, importing as needed.

    Replaces reference utils.str_to_object (utils.py:114-138) minus the
    caller-frame inspection (configs here always use fully-qualified names).
    """
    obj = locate(name)
    if obj is None:
        raise ImportError(f"Could not locate object {name!r}")
    return obj
