"""Micro-bench TPU row-gather variants at SLAM working-set sizes.

The mapping iteration spends ~half its time in two row gathers
(slot gather + inverse-map gathers). This probes what actually bounds
them: row count, row width, dtype, and gather op count.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vtgaussian_slam_tpu.utils.runtime import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30, warmup=5):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1e3


def main():
    N = 917_504
    P = 1_654_784
    key = jax.random.PRNGKey(0)
    f8 = jax.random.normal(key, (N, 8), jnp.float32)
    f16w = jax.random.normal(key, (N, 16), jnp.float32)
    f8b = f8.astype(jnp.bfloat16)
    idx = jax.random.randint(key, (P,), 0, N, jnp.int32)
    idx2 = jax.random.randint(key, (N, 4), 0, P, jnp.int32)
    flatP = jax.random.normal(key, (P, 8), jnp.float32)
    flatPb = flatP.astype(jnp.bfloat16)

    t = timeit(jax.jit(lambda v, i: v[i]), f8, idx)
    print(f"gather (P={P}) rows of 8xf32 : {t:7.2f} ms  {t*1e6/P:5.2f} ns/row")
    t = timeit(jax.jit(lambda v, i: v[i]), f8b, idx)
    print(f"gather rows of 8xbf16       : {t:7.2f} ms  {t*1e6/P:5.2f} ns/row")
    t = timeit(jax.jit(lambda v, i: v[i]), f16w, idx)
    print(f"gather rows of 16xf32       : {t:7.2f} ms  {t*1e6/P:5.2f} ns/row")
    t = timeit(jax.jit(lambda v, i: v[:, :5][i]), f8, idx)
    print(f"gather rows of 5xf32 (slice): {t:7.2f} ms  {t*1e6/P:5.2f} ns/row")

    # two half-size gathers in one jit (do they overlap?)
    h = P // 2
    def two(v, i):
        return v[i[:h]], v[i[h:]]
    t = timeit(jax.jit(two), f8, idx)
    print(f"2 half gathers (8xf32)      : {t:7.2f} ms  {t*1e6/P:5.2f} ns/row")

    # inverse shape: s2=4 single-index gathers + FMA (current design)
    w = jnp.abs(jax.random.normal(key, (N, 4), jnp.float32))
    def inv4(flat, pos, w):
        g = flat[pos[:, 0]] * w[:, 0:1]
        for k in range(1, 4):
            g = g + flat[pos[:, k]] * w[:, k:k + 1]
        return g
    t = timeit(jax.jit(inv4), flatP, idx2, w)
    print(f"inverse s2=4 (f32 src)      : {t:7.2f} ms  {t*1e6/(4*N):5.2f} ns/row")
    t = timeit(jax.jit(inv4), flatPb, idx2, w)
    print(f"inverse s2=4 (bf16 src)     : {t:7.2f} ms  {t*1e6/(4*N):5.2f} ns/row")

    # fused (N, s2) gather + sum over span axis
    def inv_fused(flat, pos, w):
        return jnp.sum(flat[pos] * w[..., None], axis=1)
    t = timeit(jax.jit(inv_fused), flatP, idx2, w)
    print(f"inverse fused (N,4)+sum     : {t:7.2f} ms  {t*1e6/(4*N):5.2f} ns/row")

    # one-hot matmul gather for comparison at small table? (skip: N too big)

    # take_along_axis style 2D table gather (slot gather form)
    tab = jax.random.randint(key, (3232, 512), 0, N, jnp.int32)
    t = timeit(jax.jit(lambda v, i: v[i].transpose(0, 2, 1)), f8, tab)
    print(f"slot gather (T,mpt)+T       : {t:7.2f} ms  {t*1e6/tab.size:5.2f} ns/row")


if __name__ == "__main__":
    main()
