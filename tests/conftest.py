"""Test configuration: force CPU with a virtual 8-device mesh.

Tests run the identical XLA code path the TPU uses; multi-chip sharding tests
use the 8 virtual host devices. The environment pins JAX_PLATFORMS=axon (the
real TPU) — override it so tests are hermetic and f32-exact, and enable the
persistent compilation cache (this host has a single CPU core; compiles are
the dominant test cost).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import gc

import jax
import pytest

# A pytest startup plugin may import (and initialize) jax before this conftest
# runs, locking in the environment's JAX_PLATFORMS=axon — force CPU here too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


@pytest.fixture(autouse=True, scope="module")
def _drop_jit_executables():
    """Release compiled executables between test modules.

    A full-suite run accumulates hundreds of XLA:CPU JIT executables in one
    process; past ~95% of the suite the NEXT compile (or persistent-cache
    deserialize) segfaults inside XLA — an LLVM JIT resource exhaustion, not
    a test bug (every module passes in isolation). Dropping the jit caches
    lets the executables and their code sections be collected; the
    persistent .jax_cache makes later re-compiles cheap."""
    yield
    jax.clear_caches()
    gc.collect()
