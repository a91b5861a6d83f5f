"""Jit-resident point-to-plane candidate metric.

Replaces `compute_point2plane_dist` (/root/reference/src/vtgaussian_slam.py:
1070-1155), which round-tripped to Open3D's `evaluate_registration`
correspondence search on the CPU *every tracking iteration* — the dominant
host-sync stall of the reference (SURVEY.md section 3.2). TPU redesign:

- target frame (fixed during a tracked frame): back-project all valid pixels
  (depth factor 1, :1087), finite-difference normals (replacing kornia
  `depth_to_normals`, :1081), both lifted to world via the target pose.
- source frame (pose = current iterate): back-project, then associate
  correspondences *projectively* — project source points into the target
  camera and take the target point at the nearest pixel — instead of a
  nearest-neighbor tree. Pairs farther than the same 0.02 m threshold are
  dropped, and both frustum culls (:1117-1122, edge 0) are applied.
- metric over pairs: sum((n . dp)^2) | max|n . dp| | mean of top-100
  (:1149-1154, methods "sum"/"max"/"max100").

Everything is static-shape and differentiating-free (metric only steers
candidate selection, parity with torch.no_grad usage).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import geometry as geo


class P2PTarget(NamedTuple):
    # (H*W, 8) rows [pt_world(3), normal_world(3), valid, pad]: ONE fused
    # row per target pixel, so the per-iteration projective association
    # costs a single 32-byte-row gather instead of three separate gathers
    # over (pts, normals, valid) tables — the metric runs INSIDE the fused
    # tracking loop every iteration at section boundaries, and TPU gathers
    # are row-count-bound (round-5 profile: the split form cost the
    # boundary loop ~2x the steady per-iteration time).
    packed: jnp.ndarray
    w2c: jnp.ndarray            # (4, 4)
    intrinsics: jnp.ndarray     # (3, 3)
    height: int
    width: int

    @property
    def pts_world(self) -> jnp.ndarray:
        return self.packed[:, 0:3]

    @property
    def normals_world(self) -> jnp.ndarray:
        return self.packed[:, 3:6]

    @property
    def valid(self) -> jnp.ndarray:
        return self.packed[:, 6] > 0


def make_p2p_target(depth: jnp.ndarray, intrinsics: jnp.ndarray,
                    w2c: jnp.ndarray) -> P2PTarget:
    """Precompute target-frame geometry (once per tracked frame)."""
    d = depth[0] if depth.ndim == 3 else depth
    H, W = d.shape
    c2w = geo.invert_se3(w2c)
    pts = geo.backproject(d, intrinsics, c2w=c2w, depth_factor=1.0)
    normals_cam = geo.depth_to_normals(d, intrinsics).reshape(-1, 3)
    normals_world = normals_cam @ c2w[:3, :3].T
    valid = (d > 0).reshape(-1, 1).astype(pts.dtype)
    packed = jnp.concatenate(
        [pts, normals_world, valid, jnp.zeros_like(valid)], axis=1)
    return P2PTarget(
        packed=packed,
        w2c=w2c,
        intrinsics=intrinsics,
        height=H,
        width=W,
    )


def point2plane_metric(
    target: P2PTarget,
    src_depth: jnp.ndarray,    # (1, H, W) or (H, W)
    src_intrinsics: jnp.ndarray,
    src_w2c: jnp.ndarray,      # current pose iterate
    method: str = "sum",
    dist_thres: float = 0.02,
) -> jnp.ndarray:
    d = src_depth[0] if src_depth.ndim == 3 else src_depth
    H, W = d.shape
    src_c2w = geo.invert_se3(src_w2c)
    src_pts = geo.backproject(d, src_intrinsics, c2w=src_c2w, depth_factor=1.0)
    src_valid = (d > 0).reshape(-1)

    # frustum cull, source -> target (reference frustum=True path)
    src_in_tgt = geo.frustum_mask(target.w2c, target.intrinsics, src_pts,
                                  target.height, target.width, edge=0.0)

    # projective association: source point -> nearest pixel in target image.
    # backproject() puts pixel (px, py)'s ray at (px + 0.5 - cx)/fx, so a
    # point on that ray projects to uv = px + 0.5 — floor (not round) is
    # the exact inverse; round() would shift half of all rows/columns to
    # the neighboring pixel even at the true pose.
    pts_tcam = geo.transform_points(target.w2c, src_pts)
    uv, z = geo.project_points(pts_tcam, target.intrinsics)
    px = jnp.floor(uv[:, 0]).astype(jnp.int32)
    py = jnp.floor(uv[:, 1]).astype(jnp.int32)
    inb = (px >= 0) & (px < target.width) & (py >= 0) & (py < target.height)
    pix = jnp.clip(py, 0, target.height - 1) * target.width + jnp.clip(
        px, 0, target.width - 1)
    # one fused 32-byte-row gather for [pt, normal, valid] (P2PTarget.packed)
    rows = target.packed[pix]
    tgt_pt = rows[:, 0:3]
    tgt_n = rows[:, 3:6]
    # target -> source frustum cull evaluated on the GATHERED points: the
    # gathered row IS target.pts_world[pix], so this equals the reference
    # order (cull the full target set, then gather the flag) bit-for-bit
    # while skipping both the full-set projection and the extra gather
    tgt_ok = (rows[:, 6] > 0) & geo.frustum_mask(
        src_w2c, src_intrinsics, tgt_pt, H, W, edge=0.0)

    dp = src_pts - tgt_pt
    pair = (
        src_valid & src_in_tgt & inb & tgt_ok
        & (jnp.sum(dp * dp, -1) < dist_thres * dist_thres)
        & (z > 0)
    )
    resid = jnp.sum(tgt_n * dp, axis=-1)
    resid = jnp.where(pair, resid, 0.0)
    n_pairs = jnp.sum(pair)

    # ZERO pairs (no overlap, or a NaN pose iterate — NaN comparisons are
    # all False) must score +inf, not 0: a vacuous 0 would beat every real
    # pose in the best-candidate selection. The reference hard-errors on an
    # empty Open3D correspondence set instead of preferring it.
    if method == "sum":
        m = jnp.sum(resid * resid)
    elif method == "max":
        m = jnp.max(jnp.abs(resid))
    elif method == "max100":
        # mean of the top-k PAIRED residuals: normalize by the actual pair
        # count, not a zero-diluted fixed 100 (which would favor low-overlap
        # poses)
        top = jax.lax.top_k(jnp.abs(resid), 100)[0]
        m = jnp.sum(top) / jnp.minimum(jnp.maximum(n_pairs, 1), 100)
    else:
        raise ValueError(f"unknown p2p method {method!r}")
    return jnp.where(n_pairs > 0, m, jnp.inf)
