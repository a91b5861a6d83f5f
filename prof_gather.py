"""Micro-bench: TPU gather/scatter strategies for the inverse-map backward."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vtgaussian_slam_tpu.utils.runtime import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1e3


def main():
    N = 917504
    P = 3232 * 512
    key = jax.random.PRNGKey(0)
    flat = jax.random.normal(key, (P, 8), jnp.float32)
    idx1 = jax.random.randint(key, (N,), 0, P)
    idx2 = jax.random.randint(key, (N, 2), 0, P)
    idx4 = jax.random.randint(key, (N, 4), 0, P)
    # sorted variant (locality)
    idx2s = jnp.sort(idx2, axis=0)

    f = jax.jit(lambda flat: flat[idx1])
    print(f"gather (N,) rows of 32B:      {timeit(f, flat):7.2f} ms")
    f = jax.jit(lambda flat: flat[idx2].sum(1))
    print(f"gather (N,2) rows + sum:      {timeit(f, flat):7.2f} ms")
    f = jax.jit(lambda flat: flat[idx2s].sum(1))
    print(f"gather (N,2) SORTED rows:     {timeit(f, flat):7.2f} ms")
    f = jax.jit(lambda flat: flat[idx4].sum(1))
    print(f"gather (N,4) rows + sum:      {timeit(f, flat):7.2f} ms")

    flat4 = flat[:, :4].copy()
    f = jax.jit(lambda flat4: flat4[idx2].sum(1))
    print(f"gather (N,2) rows of 16B:     {timeit(f, flat4):7.2f} ms")

    flat16 = jnp.concatenate([flat, flat], 1)
    f = jax.jit(lambda flat16: flat16[idx2].sum(1))
    print(f"gather (N,2) rows of 64B:     {timeit(f, flat16):7.2f} ms")

    # scatter-add M rows into (N, 8)
    for M in (65536, 229376):
        tgt = jnp.zeros((N, 8), jnp.float32)
        src = jax.random.normal(key, (M, 8), jnp.float32)
        sid = jax.random.randint(key, (M,), 0, N)
        f = jax.jit(lambda tgt, src: tgt.at[sid].add(src))
        print(f"scatter-add {M:7d} rows:      {timeit(f, tgt, src):7.2f} ms")

    # gather from small table (N rows from (M,8))
    small = jax.random.normal(key, (229376, 8), jnp.float32)
    sidN = jax.random.randint(key, (N,), 0, 229376)
    f = jax.jit(lambda small: small[sidN])
    print(f"gather (N,) from 7MB table:   {timeit(f, small):7.2f} ms")

    # the current full inverse-gather composite at realistic shapes
    main_idx = jnp.maximum(idx2, 0)
    main_mask = jax.random.bernoulli(key, 0.7, (N, 2))
    Mcap = 229376
    ov_pos = jax.random.randint(key, (Mcap, 2), 0, P)
    ov_mask = jax.random.bernoulli(key, 0.5, (Mcap, 2))
    ov_slot = jax.random.randint(key, (N,), 0, Mcap)
    ov_valid = jax.random.bernoulli(key, 0.1, (N,))

    def cur(flat):
        m2 = main_mask.astype(flat.dtype)[..., None]
        g_main = jnp.sum(flat[main_idx] * m2, axis=1)
        mo = ov_mask.astype(flat.dtype)[..., None]
        ov_rows = jnp.sum(flat[ov_pos] * mo, axis=1)
        valid = ov_valid.astype(flat.dtype)[:, None]
        return g_main + ov_rows[ov_slot] * valid
    f = jax.jit(cur)
    print(f"CURRENT composite:            {timeit(f, flat):7.2f} ms")

    ov_gid = jnp.where(ov_valid[:Mcap], jnp.arange(Mcap), N)

    def new(flat):
        m2 = main_mask.astype(flat.dtype)[..., None]
        g_main = jnp.sum(flat[main_idx] * m2, axis=1)
        mo = ov_mask.astype(flat.dtype)[..., None]
        ov_rows = jnp.sum(flat[ov_pos] * mo, axis=1)
        return g_main.at[ov_gid].add(ov_rows, mode="drop")
    f = jax.jit(new)
    print(f"NEW scatter composite:        {timeit(f, flat):7.2f} ms")

    def new64k(flat):
        m2 = main_mask.astype(flat.dtype)[..., None]
        g_main = jnp.sum(flat[main_idx] * m2, axis=1)
        mo = ov_mask[:65536].astype(flat.dtype)[..., None]
        ov_rows = jnp.sum(flat[ov_pos[:65536]] * mo, axis=1)
        return g_main.at[ov_gid[:65536]].add(ov_rows, mode="drop")
    f = jax.jit(new64k)
    print(f"NEW scatter, mcap=64k:        {timeit(f, flat):7.2f} ms")


if __name__ == "__main__":
    main()
