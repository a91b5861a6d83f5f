"""EWA projection of 3D Gaussians to screen space.

From-scratch JAX implementation of the projection stage of a tile-based
Gaussian splatting rasterizer, replacing the external CUDA dependency
`diff-gaussian-rasterization-w-depth-smallerGSradii`
(/root/reference/requirements.txt:19; interface at
/root/reference/utils/recon_helpers.py:4-27). Math follows the standard
EWA splatting formulation (Zwicker et al.; Kerbl et al. 3DGS):

  Sigma3D = R S S^T R^T,  Sigma2D = J Sigma3D J^T + 0.3 I

with J the perspective Jacobian at the (frustum-clamped) view direction.
All branches are mask-guarded so culled Gaussians produce finite values and
zero gradients (TPU/XLA-friendly: no data-dependent shapes).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..camera import Camera
from ..geometry import normalize

# Near-plane cull threshold used by the Inria-lineage CUDA rasterizer's
# preprocess step (p_view.z <= 0.2 -> cull), independent of Camera.near.
NEAR_CULL = 0.2
# Low-pass filter added to the 2D covariance diagonal (anti-aliasing floor).
COV2D_DILATION = 0.3
# Gaussian is bounded at `RADIUS_SIGMA` standard deviations for tile binning.
RADIUS_SIGMA = 3.0


class ProjectedGaussians(NamedTuple):
    mean2d: jnp.ndarray    # (N, 2) pixel coordinates (integer-pixel convention)
    conic: jnp.ndarray     # (N, 3) upper-triangular inverse 2D covariance (a, b, c)
    depth: jnp.ndarray     # (N,) camera-space z
    radius: jnp.ndarray    # (N,) float bounding radius in pixels (0 if culled)
    opacity: jnp.ndarray   # (N,) post-sigmoid opacity
    valid: jnp.ndarray     # (N,) bool — survives near/extent culling


def project_gaussians(
    means_cam: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    cam: Camera,
    active: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project camera-frame 3D Gaussians to screen space.

    Args:
      means_cam: (N, 3) Gaussian centers in camera frame (the SLAM layer
        applies world->camera before rendering, mirroring `transform_to_frame`,
        /root/reference/utils/slam_helpers.py:323-385).
      quats: (N, 4) wxyz rotations (world/camera — irrelevant for isotropic).
      scales: (N, 3) per-axis standard deviations (post-exp).
      opacities: (N,) post-sigmoid opacities.
      active: optional (N,) bool mask for capacity-padded buffers.
    """
    f32 = means_cam.dtype
    x, y, z = means_cam[:, 0], means_cam[:, 1], means_cam[:, 2]

    valid = z > NEAR_CULL
    if active is not None:
        valid = valid & active
    z_safe = jnp.where(valid, z, 1.0)

    # frustum-clamped view direction for the Jacobian (matches CUDA preprocess)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    tx = jnp.clip(x / z_safe, -limx, limx) * z_safe
    ty = jnp.clip(y / z_safe, -limy, limy) * z_safe

    # J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]]
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    j00 = cam.fx * inv_z
    j02 = -cam.fx * tx * inv_z2
    j11 = cam.fy * inv_z
    j12 = -cam.fy * ty * inv_z2

    if scales.shape[1] == 1:
        # isotropic fast path: Sigma3D = s^2 I  =>  cov2d = s^2 * J J^T.
        # No rotation math at all — the SLAM configs are all isotropic
        # (configs/replica/room0.py:28). Fully elementwise: TPU-VPU friendly.
        s2 = scales[:, 0] * scales[:, 0]
        v00 = s2 * (j00 * j00 + j02 * j02) + COV2D_DILATION
        v01 = s2 * (j02 * j12)
        v11 = s2 * (j11 * j11 + j12 * j12) + COV2D_DILATION
    else:
        # anisotropic: Sigma = M M^T with M = R diag(s), fully expanded as
        # elementwise (N,) vector ops — batched (N,3,3) matmuls are
        # pathological on the MXU (3x3 tiles on a 128x128 systolic array).
        q = normalize(quats)
        r, xq, yq, zq = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        R00 = 1 - 2 * (yq * yq + zq * zq)
        R01 = 2 * (xq * yq - r * zq)
        R02 = 2 * (xq * zq + r * yq)
        R10 = 2 * (xq * yq + r * zq)
        R11 = 1 - 2 * (xq * xq + zq * zq)
        R12 = 2 * (yq * zq - r * xq)
        R20 = 2 * (xq * zq - r * yq)
        R21 = 2 * (yq * zq + r * xq)
        R22 = 1 - 2 * (xq * xq + yq * yq)
        s0, s1, s2_ = scales[:, 0] ** 2, scales[:, 1] ** 2, scales[:, 2] ** 2
        c00 = s0 * R00 * R00 + s1 * R01 * R01 + s2_ * R02 * R02
        c01 = s0 * R00 * R10 + s1 * R01 * R11 + s2_ * R02 * R12
        c02 = s0 * R00 * R20 + s1 * R01 * R21 + s2_ * R02 * R22
        c11 = s0 * R10 * R10 + s1 * R11 * R11 + s2_ * R12 * R12
        c12 = s0 * R10 * R20 + s1 * R11 * R21 + s2_ * R12 * R22
        c22 = s0 * R20 * R20 + s1 * R21 * R21 + s2_ * R22 * R22
        r0x = j00 * c00 + j02 * c02
        r0y = j00 * c01 + j02 * c12
        r0z = j00 * c02 + j02 * c22
        r1y = j11 * c11 + j12 * c12
        r1z = j11 * c12 + j12 * c22
        v00 = r0x * j00 + r0z * j02 + COV2D_DILATION
        v01 = r0y * j11 + r0z * j12
        v11 = r1y * j11 + r1z * j12 + COV2D_DILATION

    det = v00 * v11 - v01 * v01
    valid = valid & (det > 0)
    det_safe = jnp.where(det > 0, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([v11 * inv_det, -v01 * inv_det, v00 * inv_det], -1)

    # screen extent: largest eigenvalue of cov2d, bounded at RADIUS_SIGMA sigma
    mid = 0.5 * (v00 + v11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius = jnp.where(valid, jnp.ceil(RADIUS_SIGMA * jnp.sqrt(lam1)), 0.0)

    # pixel-space mean. The CUDA NDC->pixel convention lands the projected
    # center at fx*x/z + cx - 0.5 with Gaussians evaluated at integer pixel
    # coordinates; we keep that convention (see tiled.py/dense.py).
    px = cam.fx * x * inv_z + cam.cx - 0.5
    py = cam.fy * y * inv_z + cam.cy - 0.5
    mean2d = jnp.stack([px, py], -1)
    mean2d = jnp.where(valid[:, None], mean2d, -1e6)

    return ProjectedGaussians(
        mean2d=mean2d.astype(f32),
        conic=conic.astype(f32),
        depth=jnp.where(valid, z, jnp.inf).astype(f32),
        radius=radius.astype(f32),
        opacity=opacities.astype(f32),
        valid=valid,
    )
