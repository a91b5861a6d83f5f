"""Validate gather timing: vary inputs per call, force host reads."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vtgaussian_slam_tpu.utils.runtime import setup_jax
setup_jax()
import jax
import jax.numpy as jnp
import numpy as np

N = 917_504
P = 1_654_784
key = jax.random.PRNGKey(0)
f8 = jax.random.normal(key, (N, 8), jnp.float32)
idx = jax.random.randint(key, (P,), 0, N, jnp.int32)

g = jax.jit(lambda v, i: v[i])
r = g(f8, idx); jax.block_until_ready(r)

# 1. same args every call
t0 = time.time()
for _ in range(30):
    r = g(f8, idx)
jax.block_until_ready(r)
print(f"same-args        : {(time.time()-t0)/30*1e3:7.2f} ms")

# 2. rotate among 4 distinct index arrays
idxs = [jax.random.randint(jax.random.PRNGKey(k), (P,), 0, N, jnp.int32)
        for k in range(4)]
for i in idxs: jax.block_until_ready(g(f8, i))
t0 = time.time()
for k in range(32):
    r = g(f8, idxs[k % 4])
jax.block_until_ready(r)
print(f"rotating-idx     : {(time.time()-t0)/32*1e3:7.2f} ms")

# 3. chain: output feeds next call (forces sequential real work)
g2 = jax.jit(lambda v, i: (v[i][:N] + 1.0, i))
r, i = g2(f8, idx); jax.block_until_ready(r)
t0 = time.time()
v = f8
for _ in range(30):
    v, i = g2(v, i)
jax.block_until_ready(v)
print(f"chained          : {(time.time()-t0)/30*1e3:7.2f} ms")

# 4. sum-reduced output (tiny transfer), same args
g3 = jax.jit(lambda v, i: jnp.sum(v[i]))
s = g3(f8, idx); jax.block_until_ready(s)
t0 = time.time()
for _ in range(30):
    s = g3(f8, idx)
jax.block_until_ready(s)
print(f"sum-reduced      : {(time.time()-t0)/30*1e3:7.2f} ms")

# 5. big elementwise op for bandwidth sanity: 2x53MB r/w
h = jax.jit(lambda v: v * 1.000001 + 0.5)
big = jax.random.normal(key, (P, 8), jnp.float32)
r = h(big); jax.block_until_ready(r)
t0 = time.time()
for _ in range(30):
    r = h(big)
jax.block_until_ready(r)
dt = (time.time()-t0)/30
print(f"elementwise 53MB : {dt*1e3:7.2f} ms  ({2*big.size*4/dt/1e9:.0f} GB/s)")
