"""Seeding and persistence helpers.

Parity: `utils/common_utils.py` (seed_everything:8-22, save_params:55-74).
JAX determinism comes from explicit PRNG keys; numpy/python seeds cover the
host-side choices.
"""
from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 42) -> None:
    random.seed(seed)
    np.random.seed(seed)
    # PYTHONHASHSEED only affects CHILD processes (hash
    # randomization is fixed at interpreter startup)
    os.environ["PYTHONHASHSEED"] = str(seed)
    print(f"Seed set to: {seed} (type: {type(seed)})")


def save_params(output_params_ls: list, output_dir: str,
                name: str = "params_ls.npy") -> str:
    """Save the list of per-section params dicts (reference format,
    /root/reference/src/vtgaussian_slam.py:2870-2876)."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, name)
    np.save(path, np.array(output_params_ls, dtype=object), allow_pickle=True)
    return path


def save_params_ckpt(params: dict, output_dir: str, time_idx: int) -> str:
    """Emergency checkpoint (`params<t>.npz`, common_utils.py:45-52)."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"params{time_idx}.npz")
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
    return path
