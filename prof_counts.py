"""Probe: per-tile pair-count distribution at the bench working set.

Calibrates the two-class (dense/sparse) binning split: how many tiles
actually need the full pair budget, and what budget covers the rest.
Runs on CPU (binning is deterministic; no kernel launched).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp
import numpy as np

from vtgaussian_slam_tpu.core.losses import Frame
from vtgaussian_slam_tpu.datasets.synthetic import SyntheticRoomDataset
from vtgaussian_slam_tpu.models import gaussians as G
from vtgaussian_slam_tpu.ops import geometry as geo
from vtgaussian_slam_tpu.ops.camera import setup_camera
from vtgaussian_slam_tpu.ops.rasterizer.binning import tile_rects
from vtgaussian_slam_tpu.ops.rasterizer.projection import project_gaussians


def main():
    H, W = 680, 1200
    ds = SyntheticRoomDataset(num_frames=3, height=H, width=W, seed=0,
                              motion_scale=0.05)
    cam = setup_camera(W, H, ds.scaled_intrinsics()[:3, :3])
    color, depth, _, pose = ds[0]
    frame0 = Frame(color=jnp.asarray(np.transpose(color, (2, 0, 1)) / 255.0,
                                     jnp.float32),
                   depth=jnp.asarray(np.transpose(depth, (2, 0, 1)),
                                     jnp.float32))
    w2c0 = np.linalg.inv(np.asarray(pose, np.float64))
    from vtgaussian_slam_tpu.core.densify import first_frame_pointcloud
    pts, cols, msq, keep = first_frame_pointcloud(frame0, cam)
    n = int(jnp.sum(keep))
    cap = G.round_capacity(n, 1 << 17)
    order = jnp.argsort(~keep)
    sec = G.init_section(pts[order][:cap], cols[order][:cap],
                         msq[order][:cap], n, cap, 0.0, 1.0)
    active = sec.active_mask()
    q, tr = geo.w2c_to_pose(jnp.asarray(w2c0, jnp.float32))

    tile, span_cap = 16, 2
    tiles_x, tiles_y = -(-W // tile), -(-H // tile)
    n_tiles = tiles_x * tiles_y
    qn = geo.normalize(q)
    R = geo.quat_to_rotmat(qn)
    means_cam = sec.params.means3d @ R.T + tr
    proj = project_gaussians(means_cam, sec.params.unnorm_rotations,
                             jnp.exp(sec.params.log_scales),
                             sec.params.opacities(), cam, active)

    # replicate bin_gaussians' per-slot tile emission incl. the circle cut
    rx0, ry0, span_x, span_y, valid = tile_rects(
        proj, tile, span_cap, tiles_x, tiles_y)
    px, py = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r2 = (1.11 * proj.radius) ** 2
    cnt = jnp.zeros((n_tiles,), jnp.int32)
    for s in range(span_cap * span_cap):
        dy, dx = s // span_cap, s % span_cap
        ok = valid & (dy < span_y) & (dx < span_x)
        tx0 = (rx0 + dx).astype(px.dtype) * tile
        ty0 = (ry0 + dy).astype(py.dtype) * tile
        dxp = px - jnp.clip(px, tx0, tx0 + (tile - 1))
        dyp = py - jnp.clip(py, ty0, ty0 + (tile - 1))
        ok = ok & (dxp * dxp + dyp * dyp <= r2)
        tid = (ry0 + dy) * tiles_x + rx0 + dx
        cnt = cnt.at[jnp.where(ok, tid, n_tiles)].add(
            1, mode="drop")
    c = np.asarray(cnt)
    c_sorted = np.sort(c)[::-1]
    print(f"N={n} tiles={n_tiles} total_pairs={c.sum()}")
    print(f"count quantiles: max={c.max()} p99={np.percentile(c,99):.0f} "
          f"p95={np.percentile(c,95):.0f} p90={np.percentile(c,90):.0f} "
          f"p75={np.percentile(c,75):.0f} p50={np.percentile(c,50):.0f}")
    for mpt_lo in (128, 192, 256, 384):
        n_over = int((c > mpt_lo).sum())
        print(f"mpt_lo={mpt_lo}: tiles over = {n_over} "
              f"({n_over/n_tiles:.3f} of tiles)")
    for frac in (16, 8, 4):
        T_hi = -(-n_tiles // frac // 8) * 8
        thresh = c_sorted[T_hi]
        print(f"T_hi=Tp/{frac} ({T_hi} tiles): lo class must cover "
              f"count<={thresh}")


if __name__ == "__main__":
    main()
