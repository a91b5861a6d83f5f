"""Isolated timing of the boundary selection scorer at the bench working set.

overlap_percents(pixels=0, use_vis=True) over a 64-entry padded pool at
680x1200 shows up as ~3.2 s TWICE per boundary frame (tracking boundary
selection + mapping overlap pick). This probe times the jit alone at the
exact shapes to separate kernel cost from engine overhead.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vtgaussian_slam_tpu.core.selection import overlap_percents

H, W, B, S = 680, 1200, 64, 4

rng = jax.random.PRNGKey(0)
depth = jax.random.uniform(rng, (H, W), minval=0.5, maxval=4.0)
w2c = jnp.eye(4)
K = jnp.array([[600.0, 0, 600.0], [0, 600.0, 340.0], [0, 0, 1]])
kf_w2cs = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
kf_depths = jax.random.uniform(rng, (B, -(-H // S), -(-W // S)),
                               minval=0.5, maxval=4.0)

for tag, kwargs in (
    ("visbased pixels=0", dict(pixels=0, edge=20, use_vis=True,
                               kf_depth_thresh=0.01, depth_stride=S)),
    ("plain pixels=1600", dict(pixels=1600, edge=20, use_vis=False)),
):
    # warm
    pct = overlap_percents(depth, w2c, K, kf_w2cs, kf_depths, rng, **kwargs)
    pct.block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.time()
        pct = overlap_percents(depth, w2c, K, kf_w2cs, kf_depths, rng,
                               **kwargs)
        pct.block_until_ready()
        ts.append(time.time() - t0)
    print(f"{tag}: min {min(ts)*1e3:.1f} ms  median "
          f"{sorted(ts)[2]*1e3:.1f} ms  max {max(ts)*1e3:.1f} ms")
