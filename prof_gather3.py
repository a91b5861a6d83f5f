"""Determine whether block_until_ready blocks on axon; force host syncs."""
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

g3 = jax.jit(lambda v, i: jnp.sum(v[i]))
s = g3(f8, idx); _ = float(s)

# host-sync per call (float() forces transfer)
t0 = time.time()
for _ in range(20):
    s = float(g3(f8, idx))
print(f"gather+sum, host-sync each call : {(time.time()-t0)/20*1e3:7.2f} ms")

h = jax.jit(lambda v: v * 1.000001 + 0.5)
big = jax.random.normal(key, (P, 8), jnp.float32)
r = h(big); jax.block_until_ready(r)

# long async chain then one block
t0 = time.time()
v = big
for _ in range(300):
    v = h(v)
jax.block_until_ready(v)
dt = (time.time()-t0)/300
print(f"elementwise 53MB x300 chained   : {dt*1e3:7.2f} ms ({2*big.size*4/dt/1e9:.0f} GB/s)")

# same but host-sync at end via np.asarray
t0 = time.time()
v = big
for _ in range(100):
    v = h(v)
x = np.asarray(v[0, 0])
dt = (time.time()-t0)/100
print(f"elementwise 53MB x100 + np sync : {dt*1e3:7.2f} ms ({2*big.size*4/dt/1e9:.0f} GB/s)")

# gather chain with host sync
gi = jax.jit(lambda v, i: v[i][:N] * 1.000001)
v = gi(f8, idx); jax.block_until_ready(v)
t0 = time.time()
v = f8
for _ in range(100):
    v = gi(v, idx)
x = np.asarray(v[0, 0])
dt = (time.time()-t0)/100
print(f"gather 1.65M rows x100 + sync   : {dt*1e3:7.2f} ms ({dt*1e6/P:5.2f} ns/row)")
