"""Dataset/camera YAML config loading with recursive `inherit_from` merge.

Behavioral parity with `load_dataset_config`
(/root/reference/datasets/gradslam_datasets/dataconfig.py:5-54): child values
override parent values, merging nested dicts key by key.
"""
from __future__ import annotations

import yaml


def _deep_update(base: dict, child: dict) -> dict:
    out = dict(base)
    for k, v in child.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_update(out[k], v)
        else:
            out[k] = v
    return out


def load_dataset_config(path: str, default_path: str | None = None,
                        _visited: tuple = ()) -> dict:
    if path in _visited:
        chain = " -> ".join(list(_visited) + [path])
        raise ValueError(f"inherit_from cycle: {chain}")
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    if cfg is None:
        raise ValueError(f"empty dataset config: {path}")
    base = {}
    if "inherit_from" in cfg:
        base = load_dataset_config(cfg["inherit_from"], default_path,
                                   _visited + (path,))
    elif default_path is not None:
        with open(default_path, "r") as f:
            base = yaml.safe_load(f) or {}
    return _deep_update(base, cfg)
