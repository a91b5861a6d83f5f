"""Measure TPU gather cost vs operand orientation at SLAM sizes.

Decides the shape design for the mapping hot loop: row-major (N, 8)
tables (current; XLA inserts narrow-minor relayouts) vs channel-major
(8, N) tables (gather along dim 1). In-jit lax.scan timing (see
prof_map.py header for why naive timing lies on the axon tunnel).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vtgaussian_slam_tpu.utils.runtime import setup_jax
setup_jax()
import jax
import jax.numpy as jnp
import numpy as np

N = 917_504
Tp, mpt = 3232, 512
P = Tp * mpt
K = 30


def scan_time(step, init, label, k=K):
    @jax.jit
    def run(init):
        def body(c, _):
            return step(c), 0
        c, _ = jax.lax.scan(body, init, None, length=k)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), c, 0.0)
    float(run(init))
    t0 = time.time()
    float(run(init))
    total = time.time() - t0

    @jax.jit
    def empty(init):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), init, 0.0)
    float(empty(init))
    t0 = time.time()
    float(empty(init))
    over = time.time() - t0
    print(f"{label:44s}: {(total-over)/k*1e3:7.2f} ms")


key = jax.random.PRNGKey(0)
v_n8 = jax.random.normal(key, (N, 8), jnp.float32)
v_8n = jax.random.normal(key, (8, N), jnp.float32)
tab = jax.random.randint(key, (Tp, mpt), 0, N, jnp.int32)
pos = jax.random.randint(key, (N, 4), 0, P, jnp.int32)
w4 = jnp.abs(jax.random.normal(key, (N, 4), jnp.float32))
w4T = w4.T.copy()
flat_p8 = jax.random.normal(key, (P, 8), jnp.float32)
flat_8p = jax.random.normal(key, (8, P), jnp.float32)

# --- slot gather candidates (feed kernel (…,8,mpt) slots) ---
def a_step(v):           # current: row gather + transpose
    s = v[tab].transpose(0, 2, 1)            # (Tp, 8, mpt)
    return v + s[0, :, 0][None, :] * 1e-12
scan_time(a_step, v_n8, "slot gather: (N,8) rows + transpose")

def b_step(v):           # channel-major: dim-1 gather
    s = v[:, tab]                            # (8, Tp, mpt)
    return v + s[:, 0, 0][:, None] * 1e-12
scan_time(b_step, v_8n, "slot gather: (8,N) dim-1 gather")

def c_step(v):           # row gather, no transpose (kernel takes (mpt,8))
    s = v[tab]                               # (Tp, mpt, 8)
    return v + s[0, 0, :][None, :] * 1e-12
scan_time(c_step, v_n8, "slot gather: (N,8) rows, no transpose")

def d_step(v):           # 8 per-channel flat gathers from (8,N)
    cols = [v[i][tab] for i in range(8)]     # 8 x (Tp, mpt)
    s = jnp.stack(cols, axis=1)              # (Tp, 8, mpt)
    return v + s[0, :, 0][:, None] * 1e-12   # keep dep
scan_time(d_step, v_8n, "slot gather: 8 separate (Tp,mpt) gathers")

# --- inverse candidates (per-gaussian grad sums) ---
def ia_step(f):          # current: 4 row gathers from (P,8)
    g = f[pos[:, 0]] * w4[:, 0:1]
    for k in range(1, 4):
        g = g + f[pos[:, k]] * w4[:, k:k + 1]
    return f + g[0][None, :] * 1e-12
scan_time(ia_step, flat_p8, "inverse: 4 row gathers (P,8)->(N,8)")

def ib_step(f):          # channel-major: 4 dim-1 gathers from (8,P)
    g = f[:, pos[:, 0]] * w4T[0:1, :]
    for k in range(1, 4):
        g = g + f[:, pos[:, k]] * w4T[k:k + 1, :]
    return f + g[:, 0][:, None] * 1e-12
scan_time(ib_step, flat_8p, "inverse: 4 dim-1 gathers (8,P)->(8,N)")

def ic_step(f):          # 8 channels x 4 flat element gathers
    outs = []
    for ch in range(8):
        row = f[ch]
        g = row[pos[:, 0]] * w4[:, 0]
        for k in range(1, 4):
            g = g + row[pos[:, k]] * w4[:, k]
        outs.append(g)
    g = jnp.stack(outs, 0)
    return f + g[:, 0][:, None] * 1e-12
scan_time(ic_step, flat_8p, "inverse: 8ch x 4 flat elem gathers")

# --- combined round trip: gather + fake kernel + inverse in one graph ---
def rt_cur(v):
    s = v[tab].transpose(0, 2, 1)
    fake = s * 1.000001                      # stands in for the kernel
    flat = fake.transpose(0, 2, 1).reshape(P, 8)
    g = flat[pos[:, 0]] * w4[:, 0:1]
    for k in range(1, 4):
        g = g + flat[pos[:, k]] * w4[:, k:k + 1]
    return v + g * 1e-12
scan_time(rt_cur, v_n8, "round trip: current (N,8) shapes")

flat_128 = jax.random.normal(key, (P // 16, 128), jnp.float32)
pos_r = pos >> 4           # packed-row index
pos_g = pos & 15           # group within row
eye16 = jnp.eye(16, dtype=jnp.float32)

def iw_step(f):
    """inverse from 128-wide packed rows: gather + one-hot group select."""
    g = jnp.zeros((N, 8), jnp.float32)
    for k in range(4):
        r = f[pos_r[:, k]]                       # (N, 128)
        sel = eye16[pos_g[:, k]]                 # (N, 16)
        picked = jnp.einsum("ngc,ng->nc",
                            r.reshape(N, 16, 8), sel)
        g = g + picked * w4[:, k:k + 1]
    return f + g[0].sum() * 1e-12
scan_time(iw_step, flat_128, "inverse: 4 gathers of 128-wide rows+sel")

def iw2_step(f):
    """gather only (no select) to isolate the gather rate at width 128."""
    acc = f[pos_r[:, 0]]
    for k in range(1, 4):
        acc = acc + f[pos_r[:, k]]
    return f + acc[0][None, :] * 1e-12
scan_time(iw2_step, flat_128, "inverse: 4 gathers of 128-wide rows only")

# mask-table select: one (16, 128) gather per k replaces the einsum; the
# 4 masked contributions accumulate in 128-lane space and pay ONE 16-fold
# lane reduction at the end instead of 4 einsum contractions
masktab = jnp.zeros((16, 128), jnp.float32)
for gidx in range(16):
    masktab = masktab.at[gidx, gidx * 8:(gidx + 1) * 8].set(1.0)

def iw3_step(f):
    acc = jnp.zeros((N, 128), jnp.float32)
    for k in range(4):
        r = f[pos_r[:, k]]                       # (N, 128)
        mw = masktab[pos_g[:, k]] * w4[:, k:k + 1]
        acc = acc + r * mw
    g = acc.reshape(N, 16, 8).sum(axis=1)        # (N, 8)
    return f + g[0].sum() * 1e-12
scan_time(iw3_step, flat_128, "inverse: 4 packed gathers + masktab sel")

def iw4_step(f):
    """same but reduce via one MXU matmul (128 -> 8 fold matrix)."""
    fold = jnp.concatenate([jnp.eye(8, dtype=jnp.float32)] * 16, axis=0)
    acc = jnp.zeros((N, 128), jnp.float32)
    for k in range(4):
        r = f[pos_r[:, k]]
        mw = masktab[pos_g[:, k]] * w4[:, k:k + 1]
        acc = acc + r * mw
    g = acc @ fold                               # (N, 8)
    return f + g[0].sum() * 1e-12
scan_time(iw4_step, flat_128, "inverse: packed gathers + masktab + MXU fold")

i128g = jnp.arange(128, dtype=jnp.int32) >> 3    # lane -> group index

def iw5_step(f):
    """comparison mask in 128-lane space (no table gather), ONE deferred
    16-fold reduction instead of 4 einsum contractions."""
    acc = jnp.zeros((N, 128), jnp.float32)
    for k in range(4):
        r = f[pos_r[:, k]]
        sel = (pos_g[:, k:k + 1] == i128g[None, :]).astype(jnp.float32)
        acc = acc + r * (sel * w4[:, k:k + 1])
    g = acc.reshape(N, 16, 8).sum(axis=1)
    return f + g[0].sum() * 1e-12
scan_time(iw5_step, flat_128, "inverse: packed + cmp128 sel, 1 fold")

def iw6_step(f):
    """current production shape: per-k comparison one-hot (N, 16) einsum."""
    i16 = jnp.arange(16, dtype=jnp.int32)
    g = jnp.zeros((N, 8), jnp.float32)
    for k in range(4):
        r = f[pos_r[:, k]].reshape(N, 16, 8)
        sel = (pos_g[:, k:k + 1] == i16[None, :]).astype(jnp.float32)
        g = g + jnp.einsum("ngc,ng->nc", r, sel * w4[:, k:k + 1])
    return f + g[0].sum() * 1e-12
scan_time(iw6_step, flat_128, "inverse: packed + cmp16 einsum (prod)")


def rt_cm(v):
    s = v[:, tab]                            # (8, Tp, mpt)
    fake = s * 1.000001
    flat = fake.reshape(8, P)
    g = flat[:, pos[:, 0]] * w4T[0:1, :]
    for k in range(1, 4):
        g = g + flat[:, pos[:, k]] * w4T[k:k + 1, :]
    return v + g * 1e-12
scan_time(rt_cm, v_8n, "round trip: channel-major (8,N) shapes")
