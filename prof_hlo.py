"""Dump the optimized HLO of one mapping vg iteration; find big copies."""
import os, sys, re
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vtgaussian_slam_tpu.utils.runtime import setup_jax
setup_jax()
import jax
import jax.numpy as jnp
import numpy as np

from vtgaussian_slam_tpu.core.map_cache import (build_kf_cache, pack_fields8,
                                                splat_binned)
from vtgaussian_slam_tpu.datasets.synthetic import SyntheticRoomDataset
from vtgaussian_slam_tpu.models import gaussians as G
from vtgaussian_slam_tpu.ops.camera import setup_camera
from vtgaussian_slam_tpu.core.losses import Frame
from vtgaussian_slam_tpu.core.densify import first_frame_pointcloud
from vtgaussian_slam_tpu.ops import geometry as geo

H, W = 680, 1200
ds = SyntheticRoomDataset(num_frames=3, height=H, width=W, seed=0,
                          motion_scale=0.05)
cam = setup_camera(W, H, ds.scaled_intrinsics()[:3, :3])
color, depth, _, pose = ds[0]
frame0 = Frame(color=jnp.asarray(np.transpose(color, (2, 0, 1)) / 255.0,
                                 jnp.float32),
               depth=jnp.asarray(np.transpose(depth, (2, 0, 1)), jnp.float32))
w2c0 = np.linalg.inv(np.asarray(pose, np.float64))
pts, cols, msq, keep = first_frame_pointcloud(frame0, cam)
n = int(jnp.sum(keep))
cap = G.round_capacity(n, 1 << 17)
order = jnp.argsort(~keep)
sec = G.init_section(pts[order][:cap], cols[order][:cap], msq[order][:cap],
                     n, cap, 0.0, 1.0)
q, tr = geo.w2c_to_pose(jnp.asarray(w2c0, jnp.float32))
kfc = build_kf_cache(sec.params, sec.active_mask(), jnp.asarray(q),
                     jnp.asarray(tr), cam, span_cap=2, max_pairs_per_tile=512)
f8 = pack_fields8(sec.params)
chunk = 512


def accum_sum(v8):
    a = splat_binned(v8, kfc.tab, kfc.inv, kfc.quat, kfc.trans,
                     kfc.counts, cam, chunk, False)
    return jnp.sum(a[:, :6, :])


fn = jax.jit(jax.value_and_grad(accum_sum))
txt = fn.lower(f8).compile().as_text()
print(f"HLO length: {len(txt)} chars")

# big-shape copies / transposes / bitcast-convert at top level
pat = re.compile(r"^\s*(\S+) = (f32|bf16|s32|u32)\[([\d,]+)\][^ ]* (copy|transpose|bitcast|reshape|concatenate|convert)\(", re.M)
costs = []
for m in pat.finditer(txt):
    dims = [int(d) for d in m.group(3).split(",") if d]
    elems = int(np.prod(dims)) if dims else 0
    if elems >= 1 << 20:
        costs.append((elems, m.group(4), m.group(3), m.group(1)))
costs.sort(reverse=True)
for elems, op, shape, name in costs[:40]:
    print(f"{elems/1e6:8.1f}M  {op:12s} [{shape}]  {name}")

with open("/tmp/vg_hlo.txt", "w") as f:
    f.write(txt)
print("full HLO -> /tmp/vg_hlo.txt")
