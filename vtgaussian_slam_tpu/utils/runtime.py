"""Process-level JAX runtime setup.

Single-core hosts pay heavily for XLA compiles; the persistent compilation
cache makes every run after the first start hot. Called once by the CLI and
bench entry points (safe to call multiple times).
"""
from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    # Honor an explicit JAX_PLATFORMS=cpu request: the environment's TPU
    # plugin registration hook (sitecustomize) re-points jax_platforms at
    # the accelerator AFTER env parsing, so a user-level env override is
    # silently lost — and a CPU-intended run then blocks on accelerator
    # init. Re-assert the env value through jax.config (the same thing
    # tests/conftest.py does).
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "axon" not in plat and "tpu" not in plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    if cache_dir is None:
        cache_dir = os.environ.get(
            "VTGS_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "vtgs_jax"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass  # older jax without these flags
    # TPU matmuls default to single-pass bf16 on the MXU (~0.4% relative
    # error). This workload has no throughput-critical big matmuls outside
    # the Pallas kernels (which pin their precision explicitly); the small
    # ones that remain — (N,3) @ (3,3) pose transforms feeding projection —
    # directly move rendered pixel positions, so run them exact.
    try:
        jax.config.update("jax_default_matmul_precision", "highest")
    except Exception:
        pass
