"""Core differentiable geometry: quaternions, SE(3), back-projection.

Pure-JAX reimplementation of the reference's geometry semantics
(behavioral parity targets cited per function), written batched/static-shape
so everything is jit- and vmap-friendly on TPU.

Conventions (matching the reference):
- quaternions are wxyz, unnormalized storage, normalized on use
- `w2c` 4x4 world->camera; camera trajectory stored as per-frame (quat, trans)
  such that w2c[:3,:3] = R(quat), w2c[:3,3] = trans
- pixel back-projection uses (x - cx + 0.5)/fx pixel centers and the
  1.005 depth inflation factor of the reference's map back-projection
  (/root/reference/src/vtgaussian_slam.py:88-93).
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along `axis` (torch.nn.functional.normalize semantics)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) (..., 4) wxyz -> rotation matrix (..., 3, 3).

    Parity: `build_rotation` (/root/reference/utils/slam_external.py:25-42),
    which normalizes internally.
    """
    q = normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], -2)


def quat_mult(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, wxyz, shapes broadcast over leading dims.

    Parity: `quat_mult` (/root/reference/utils/slam_helpers.py:24-31).
    """
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        -1,
    )


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) wxyz.

    Best-conditioned-candidate construction, behavioral parity with
    `matrix_to_quaternion` (/root/reference/utils/slam_helpers.py:46-106).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        -1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    # candidate quaternions scaled by each of (r, i, j, k)
    cand = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
        ],
        -2,
    )
    cand = cand / (2.0 * jnp.maximum(q_abs[..., None], 0.1))
    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]


def pose_to_w2c(quat: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """(quat wxyz, trans 3) -> 4x4 w2c. Batched over leading dims."""
    r = quat_to_rotmat(quat)
    batch = quat.shape[:-1]
    w2c = jnp.zeros(batch + (4, 4), dtype=quat.dtype)
    w2c = w2c.at[..., :3, :3].set(r)
    w2c = w2c.at[..., :3, 3].set(trans)
    w2c = w2c.at[..., 3, 3].set(1.0)
    return w2c


def w2c_to_pose(w2c: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """4x4 w2c -> (quat wxyz, trans 3)."""
    return rotmat_to_quat(w2c[..., :3, :3]), w2c[..., :3, 3]


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid transform(s) (..., 4, 4) without a general solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(-(Rt @ t[..., None])[..., 0])
    out = out.at[..., 3, 3].set(1.0)
    return out


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 transform to (..., N, 3) points."""
    return pts @ jnp.swapaxes(T[..., :3, :3], -1, -2) + T[..., None, :3, 3]


def relative_transformation(T1: jnp.ndarray, T2: jnp.ndarray) -> jnp.ndarray:
    """T1^-1 @ T2 — pose of frame 2 relative to frame 1.

    Parity: `relative_transformation`
    (/root/reference/datasets/gradslam_datasets/geometryutils.py:413).
    """
    return invert_se3(T1) @ T2


def backproject(
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    c2w: jnp.ndarray | None = None,
    depth_factor: float = 1.005,
    pixel_center: float = 0.5,
) -> jnp.ndarray:
    """Back-project a depth image (H, W) into 3D points (H*W, 3).

    Parity: `get_pointcloud` (/root/reference/src/vtgaussian_slam.py:76-103):
    rays at (x - cx + pixel_center)/fx, depth scaled by `depth_factor`
    (1.005 on the map path, 1.0 for the point-to-plane metric, :1087).
    If `c2w` is given, points are returned in world frame.
    """
    H, W = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x = jnp.arange(W, dtype=depth.dtype)
    y = jnp.arange(H, dtype=depth.dtype)
    xx = (x[None, :] - cx + pixel_center) / fx
    yy = (y[:, None] - cy + pixel_center) / fy
    z = depth * depth_factor
    pts = jnp.stack([jnp.broadcast_to(xx, (H, W)) * z, jnp.broadcast_to(yy, (H, W)) * z, z], -1)
    pts = pts.reshape(-1, 3)
    if c2w is not None:
        pts = transform_points(c2w, pts)
    return pts


def backproject_at(
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    c2w: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Back-project selected pixels (row, col index arrays) to 3D points.

    Uses (col - cx)/fx WITHOUT the +0.5 pixel center and factor 1 — matching
    the keyframe-selection variant
    (/root/reference/utils/keyframe_selection.py:10-25).
    """
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    z = depth[rows, cols]
    xx = (cols.astype(depth.dtype) - cx) / fx
    yy = (rows.astype(depth.dtype) - cy) / fy
    pts = jnp.stack([xx * z, yy * z, z], -1)
    if c2w is not None:
        pts = transform_points(c2w, pts)
    return pts


def project_points(pts_cam: jnp.ndarray, intrinsics: jnp.ndarray, eps: float = 1e-5):
    """Project camera-frame points (N, 3) to pixels.

    Returns (uv (N, 2), z (N,)). Small-eps z guard matches the selection code
    (/root/reference/utils/keyframe_selection.py:79).
    """
    proj = pts_cam @ intrinsics.T
    z = proj[:, 2] + eps
    uv = proj[:, :2] / z[:, None]
    return uv, z


def mean_sq_dist_projective(depth_flat: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                            depth_factor: float = 1.005) -> jnp.ndarray:
    """Per-pixel squared scale for new Gaussians: (z / ((fx+fy)/2))^2.

    Parity: /root/reference/src/vtgaussian_slam.py:106-110.
    """
    scale = depth_flat * depth_factor / ((fx + fy) / 2.0)
    return scale * scale


def depth_to_normals(depth: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Finite-difference camera-space normals from a depth map (H, W) -> (H, W, 3).

    JAX replacement for kornia.geometry.depth_to_normals
    (/root/reference/src/vtgaussian_slam.py:1081): backproject to 3D, take
    central differences along x/y, cross product, normalize.
    """
    H, W = depth.shape
    pts = backproject(depth, intrinsics, depth_factor=1.0, pixel_center=0.0).reshape(H, W, 3)
    # central differences with edge replication (kornia uses spatial gradient)
    dx = jnp.gradient(pts, axis=1)
    dy = jnp.gradient(pts, axis=0)
    n = jnp.cross(dx, dy)
    return normalize(n)


def frustum_mask(w2c: jnp.ndarray, intrinsics: jnp.ndarray, points_world: jnp.ndarray,
                 H: int, W: int, edge: float = 0.0) -> jnp.ndarray:
    """In-image-frustum test for world points.

    Parity: `get_frustum_mask` (/root/reference/src/vtgaussian_slam.py:1047-1065):
    strict inequalities against image bounds with `edge` margin and z>0
    (z guarded by +1e-8).
    """
    pts_cam = transform_points(w2c, points_world)
    proj = pts_cam @ intrinsics.T
    z = proj[:, 2] + 1e-8
    uv = proj[:, :2] / z[:, None]
    return (
        (uv[:, 0] < W - edge) & (uv[:, 0] > edge)
        & (uv[:, 1] < H - edge) & (uv[:, 1] > edge)
        & (z > 0)
    )


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of img (H, W) at pixel coords uv (N, 2), zero padding.

    Matches torch grid_sample(align_corners=True, padding_mode='zeros') as used
    by the visibility masks (/root/reference/src/vtgaussian_slam.py:393-399):
    with align_corners=True the normalized grid maps back to exact pixel
    coordinates, so we sample directly at uv.
    """
    H, W = img.shape
    x, y = uv[:, 0], uv[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(yy, xx):
        inside = (xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1)
        xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        return jnp.where(inside, img[yi, xi], 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def visibility_mask(
    points_world: jnp.ndarray,
    overlap_w2c: jnp.ndarray,
    intrinsics: jnp.ndarray,
    overlap_depth: jnp.ndarray,
    thres: float,
) -> jnp.ndarray:
    """Depth-consistency visibility of world points in an overlap view.

    Parity: `get_vis_mask` (/root/reference/src/vtgaussian_slam.py:376-404):
    project points into the overlap camera, bilinearly sample its gt depth,
    visible iff |d_sample - z| < thres * min(d_sample, z).
    """
    pts_cam = transform_points(overlap_w2c, points_world)
    uv, z = project_points(pts_cam, intrinsics)
    d = bilinear_sample(overlap_depth, uv)
    return jnp.abs(d - z) < thres * jnp.minimum(d, z)


def constant_velocity_init(w2c_prev1: jnp.ndarray, w2c_prev2: jnp.ndarray) -> jnp.ndarray:
    """Forward-propagated pose init: c2w_new = c2w1 @ inv(c2w2) @ c2w1.

    Parity: `initialize_camera_pose` forward_prop branch
    (/root/reference/src/vtgaussian_slam.py:838-875).
    """
    c2w1 = invert_se3(w2c_prev1)
    c2w2 = invert_se3(w2c_prev2)
    init_c2w = c2w1 @ invert_se3(c2w2) @ c2w1
    return invert_se3(init_c2w)


def constant_velocity_init_multiavg(
    w2c_prev1: jnp.ndarray, w2c_prev2: jnp.ndarray, w2c_prev3: jnp.ndarray
) -> jnp.ndarray:
    """Two-step-averaged forward propagation:
    init_c2w = ((c2w2 inv(c2w3) + c2w1 inv(c2w2)) / 2) @ c2w1.

    Parity: the `multiavg` branch of `initialize_camera_pose`
    (/root/reference/src/vtgaussian_slam.py:852-866) — note the reference
    averages the two relative-motion matrices ELEMENTWISE (not on the
    manifold), reproduced verbatim. Off by default in all shipped configs.
    """
    c2w1 = invert_se3(w2c_prev1)
    c2w2 = invert_se3(w2c_prev2)
    c2w3 = invert_se3(w2c_prev3)
    avg_rel = 0.5 * (c2w2 @ invert_se3(c2w3) + c2w1 @ invert_se3(c2w2))
    # the elementwise average is NOT rigid (its 3x3 block is not
    # orthonormal), so the transpose-based invert_se3 would return a wrong
    # inverse — use the general inverse like the reference's torch.inverse
    return jnp.linalg.inv(avg_rel @ c2w1)
