"""Silhouette-driven densification (new-Gaussian insertion).

TPU redesign of `add_new_gaussians_base_frame`
(/root/reference/src/vtgaussian_slam.py:732-813). The reference concatenates
dynamically-sized point clouds per frame; here candidate Gaussians are
produced at static shape (one candidate per pixel of the base-res frame and
one per pixel of the hi-res densify stream, each with a boolean keep mask)
and scatter-appended into the section's padded tail. Only the kept COUNT
crosses to the host (to trigger capacity re-bucketing), not the data.

Semantics:
  non_presence = (silhouette < sil_thres)
               | ((render_depth > gt) & (depth_err > 50 * median(depth_err)))
  base stream keeps non_presence & valid-depth pixels (:749-768);
  densify stream keeps (resized non_presence) & valid & Canny edge mask
  (:775-794). Back-projection uses the x1.005 depth factor (:93) and the
  projective mean-square-distance scale init (:106-110).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianParams
from ..ops import geometry as geo
from ..ops.camera import Camera
from .losses import Frame, render_slam


class DensifyCandidates(NamedTuple):
    points: jnp.ndarray   # (M, 3) world
    colors: jnp.ndarray   # (M, 3)
    mean3_sq_dist: jnp.ndarray  # (M,)
    keep: jnp.ndarray     # (M,) bool
    non_presence: jnp.ndarray  # (H, W) bool — for resizing to densify stream


@functools.partial(jax.jit, static_argnames=("cam", "backend_kwargs"))
def densify_nonpresence(
    params: GaussianParams,
    active: jnp.ndarray,
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    frame: Frame,
    cam: Camera,
    sil_thres: float,
    backend_kwargs: tuple = (),
) -> jnp.ndarray:
    """The (H, W) non-presence mask (sil + depth-error terms, :749-756) —
    the engine compacts candidate pixel indices on the HOST (the mask is
    pulled there anyway for the densify-stream resize) so the appends
    scatter ~10-100k compacted rows instead of one-per-pixel static
    candidate arrays (3.26M rows at the hi-res stream; TPU scatter is
    row-count-bound at ~90 ns/row, so the dense form cost ~0.3-1.5 s/frame)."""
    r = render_slam(jax.lax.stop_gradient(params), active,
                    jax.lax.stop_gradient(cam_quat),
                    jax.lax.stop_gradient(cam_trans), cam,
                    dict(backend_kwargs))
    return _nonpresence_from_render(r, frame, sil_thres)


def _nonpresence_from_render(r, frame: Frame, sil_thres: float):
    gt_depth = frame.depth[0]
    render_depth = r.depth[0]
    depth_err = jnp.abs(gt_depth - render_depth) * (gt_depth > 0)
    # torch.median (the reference, :754) returns the LOWER middle element
    # for even-sized inputs; jnp.median interpolates — use method="lower"
    med = jnp.quantile(depth_err, 0.5, method="lower")
    return (r.silhouette < sil_thres) | (
        (render_depth > gt_depth) & (depth_err > 50 * med))


# NOTE: do NOT compute this mask through the tracking cache (a round-5
# experiment did; reverted). The cache bins at the tracking INIT pose, and
# once the init->committed pose delta reaches a few PIXELS, every tile's
# member list is coherently shifted — a band of each tile renders
# uncovered, the silhouette reads < sil_thres there, and densification
# re-adds already-mapped geometry every frame (816k -> 5M gaussians in 12
# longrun frames -> HBM OOM). Tracking tolerates the same staleness only
# because its presence mask DROPS low-silhouette pixels; densification
# INVERTS the sign. See core/pipeline._densify and ROADMAP round-5.


@functools.partial(jax.jit, static_argnames=("cam",))
def densify_from_pixels(
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    depth_vals: jnp.ndarray,   # (M,) gt depths of compacted candidate pixels
    colors: jnp.ndarray,       # (M, 3) in [0, 1]
    idx: jnp.ndarray,          # (M,) int32 flat pixel index (pad rows: any)
    valid: jnp.ndarray,        # (M,) bool — False = pad
    cam: Camera,
) -> DensifyCandidates:
    """Back-project host-compacted candidate pixels (same math as
    `densify_candidates_*`: +0.5 pixel center, x1.005 depth factor,
    projective mean-sq-dist — /root/reference/src/vtgaussian_slam.py:76-128)."""
    K = jnp.asarray(cam.intrinsics)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    f32 = depth_vals.dtype
    rows = (idx // cam.width).astype(f32)
    cols = (idx % cam.width).astype(f32)
    z = depth_vals * 1.005
    pts_cam = jnp.stack([(cols - cx + 0.5) / fx * z,
                         (rows - cy + 0.5) / fy * z, z], -1)
    w2c = geo.pose_to_w2c(geo.normalize(cam_quat), cam_trans)
    pts = geo.transform_points(geo.invert_se3(w2c), pts_cam)
    msq = geo.mean_sq_dist_projective(depth_vals, fx, fy)
    keep = valid & (depth_vals > 0)
    return DensifyCandidates(points=pts, colors=colors, mean3_sq_dist=msq,
                             keep=keep, non_presence=valid)


def first_frame_pointcloud(frame: Frame, cam: Camera,
                           mask: jnp.ndarray | None = None):
    """Full-frame back-projection for first-frame / base-frame section init
    (/root/reference/src/vtgaussian_slam.py:191-282). Returns
    (points, colors, mean_sq_dist, keep) at static H*W shape."""
    gt_depth = frame.depth[0]
    keep = gt_depth > 0
    if mask is not None:
        keep = keep & mask
    K = jnp.asarray(cam.intrinsics)
    pts = geo.backproject(gt_depth, K)  # camera frame == world for frame 0
    msq = geo.mean_sq_dist_projective(gt_depth.reshape(-1), K[0, 0], K[1, 1])
    colors = frame.color.reshape(3, -1).T
    return pts, colors, msq, keep.reshape(-1)


def base_frame_pointcloud(frame: Frame, cam: Camera, w2c: jnp.ndarray,
                          mask: jnp.ndarray | None = None):
    """Back-projection at a tracked pose for new-base-frame section init
    (/root/reference/src/vtgaussian_slam.py:285-373)."""
    gt_depth = frame.depth[0]
    keep = gt_depth > 0
    if mask is not None:
        keep = keep & mask
    K = jnp.asarray(cam.intrinsics)
    pts = geo.backproject(gt_depth, K, c2w=geo.invert_se3(w2c))
    msq = geo.mean_sq_dist_projective(gt_depth.reshape(-1), K[0, 0], K[1, 1])
    colors = frame.color.reshape(3, -1).T
    return pts, colors, msq, keep.reshape(-1)
