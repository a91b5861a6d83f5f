"""RGB-D visual odometry: multi-scale point-to-plane (+hybrid) Gauss-Newton.

JAX replacement for the Open3D tensor odometry used on ScanNet++
(/root/reference/src/visual_odometer.py: `rgbd_odometry_multi_scale`, Hybrid
or PointToPlane, 3-level pyramid). Fully jit-compiled: projective data
association between depth maps, per-level fixed-iteration Gauss-Newton on an
se(3) twist, coarse-to-fine over a 3-level pyramid.

Returns the relative transform M with x_prev = M @ x_curr (the "odometer_rel"
the pose initializer composes as init_c2w = c2w_prev @ M,
/root/reference/src/vtgaussian_slam.py:822-837). Data is already in the
gradslam camera convention, so the reference's axis-flip postprocess
(visual_odometer.py:65-76, Open3D<->gradslam) has no analogue here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry as geo


def _so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    th = jnp.linalg.norm(w) + 1e-12
    k = w / th
    K = jnp.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return (jnp.eye(3) + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K))


def _se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """xi = [omega(3), t(3)] -> 4x4 (first-order V approx is avoided:
    use full SO(3) exp and V-matrix)."""
    w, t = xi[:3], xi[3:]
    th = jnp.linalg.norm(w) + 1e-12
    k = w / th
    K = jnp.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = jnp.eye(3) + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K)
    V = (jnp.eye(3) + (1 - jnp.cos(th)) / th * K
         + (th - jnp.sin(th)) / th * (K @ K))
    T = jnp.eye(4)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(V @ t)
    return T


def _downsample(depth: jnp.ndarray, color: jnp.ndarray):
    """2x pyramid level: 2x2 average over valid depths, color box filter."""
    H, W = depth.shape
    d = depth[: H // 2 * 2, : W // 2 * 2].reshape(H // 2, 2, W // 2, 2)
    m = (d > 0).astype(depth.dtype)
    dsum = jnp.sum(d * m, axis=(1, 3))
    dcnt = jnp.sum(m, axis=(1, 3))
    d2 = jnp.where(dcnt > 0, dsum / jnp.maximum(dcnt, 1), 0.0)
    c = color[: H // 2 * 2, : W // 2 * 2].reshape(H // 2, 2, W // 2, 2)
    c2 = jnp.mean(c, axis=(1, 3))
    return d2, c2


@functools.partial(jax.jit, static_argnames=("iters", "hybrid", "levels"))
def rgbd_odometry_multi_scale(
    src_depth: jnp.ndarray,   # (H, W) previous frame
    src_gray: jnp.ndarray,    # (H, W) intensity in [0,1]
    dst_depth: jnp.ndarray,   # (H, W) current frame
    dst_gray: jnp.ndarray,
    intrinsics: jnp.ndarray,  # (3, 3)
    init_T: jnp.ndarray | None = None,
    iters: int = 10,
    levels: int = 3,
    hybrid: bool = False,
    max_depth: float = 10.0,
    dist_thres: float = 0.07,
) -> jnp.ndarray:
    """Estimate T with x_dst = T @ x_src (source=prev, target=curr)."""
    # build pyramid (coarse last)
    pyr = [(src_depth, src_gray, dst_depth, dst_gray, intrinsics)]
    for _ in range(levels - 1):
        sd, sg, dd, dg, K = pyr[-1]
        sd2, sg2 = _downsample(sd, sg)
        dd2, dg2 = _downsample(dd, dg)
        K2 = K.at[:2].multiply(0.5)
        pyr.append((sd2, sg2, dd2, dg2, K2))

    T = jnp.eye(4) if init_T is None else init_T

    for sd, sg, dd, dg, K in reversed(pyr):
        H, W = sd.shape
        # target vertex + normal maps
        dst_pts = geo.backproject(dd, K, depth_factor=1.0,
                                  pixel_center=0.0).reshape(H, W, 3)
        dst_n = geo.depth_to_normals(dd, K)
        src_pts = geo.backproject(sd, K, depth_factor=1.0,
                                  pixel_center=0.0).reshape(-1, 3)
        src_valid = ((sd > 0) & (sd < max_depth)).reshape(-1)

        def gn_step(T, _):
            warped = geo.transform_points(T, src_pts)
            uv, z = geo.project_points(warped, K)
            px = jnp.round(uv[:, 0]).astype(jnp.int32)
            py = jnp.round(uv[:, 1]).astype(jnp.int32)
            inb = (px >= 0) & (px < W) & (py >= 0) & (py < H) & (z > 0)
            pxc = jnp.clip(px, 0, W - 1)
            pyc = jnp.clip(py, 0, H - 1)
            V = dst_pts[pyc, pxc]
            N = dst_n[pyc, pxc]
            dvalid = (dd[pyc, pxc] > 0) & (dd[pyc, pxc] < max_depth)
            dp = warped - V
            ok = (src_valid & inb & dvalid
                  & (jnp.sum(dp * dp, -1) < dist_thres * dist_thres))
            # hard-zero residual AND jacobian of invalid rows (weights alone
            # leave inf * 0 = NaN when depth holes backproject to inf)
            r = jnp.where(ok, jnp.sum(N * dp, -1), 0.0)
            Jw = jnp.cross(warped, N)      # d r / d omega
            J = jnp.where(ok[:, None], jnp.concatenate([Jw, N], -1), 0.0)
            JTJ = J.T @ J
            JTr = J.T @ r
            if hybrid:
                # photometric term: gray residual with image-gradient chain
                gval = dg[pyc, pxc]
                gr = jnp.where(ok, gval - sg.reshape(-1), 0.0)
                # finite-difference image gradients of dst gray
                gx = (dg[pyc, jnp.clip(pxc + 1, 0, W - 1)]
                      - dg[pyc, jnp.clip(pxc - 1, 0, W - 1)]) * 0.5
                gy = (dg[jnp.clip(pyc + 1, 0, H - 1), pxc]
                      - dg[jnp.clip(pyc - 1, 0, H - 1), pxc]) * 0.5
                zs = jnp.maximum(z, 1e-6)
                fx, fy = K[0, 0], K[1, 1]
                # d uv / d point (in dst cam frame) composed with d point/d xi
                jx = jnp.stack([gx * fx / zs, gy * fy / zs,
                                -(gx * fx * warped[:, 0]
                                  + gy * fy * warped[:, 1]) / (zs * zs)], -1)
                Jp = jnp.where(ok[:, None],
                               jnp.concatenate([jnp.cross(warped, jx), jx], -1),
                               0.0)
                JTJ = JTJ + 0.5 * (Jp.T @ Jp)
                JTr = JTr + 0.5 * (Jp.T @ gr)
            # Levenberg damping relative to the problem scale + a trust-region
            # step clamp: pure point-to-plane is rank-deficient on dominant
            # planes (sliding DOF), so near-singular solves must be tamed.
            lam = 1e-4 * jnp.trace(JTJ) / 6.0 + 1e-8
            delta = jnp.linalg.solve(JTJ + lam * jnp.eye(6), -JTr)
            delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta,
                              jnp.zeros_like(delta))
            rot_n = jnp.linalg.norm(delta[:3])
            tr_n = jnp.linalg.norm(delta[3:])
            max_rot, max_tr = 0.05, 0.05
            scale = jnp.minimum(
                1.0, jnp.minimum(max_rot / jnp.maximum(rot_n, 1e-12),
                                 max_tr / jnp.maximum(tr_n, 1e-12)))
            delta = delta * scale
            return _se3_exp(delta) @ T, None

        T, _ = jax.lax.scan(gn_step, T, None, length=iters)
    return T


class VisualOdometer:
    """API parity with the reference's VisualOdometer
    (/root/reference/src/visual_odometer.py)."""

    def __init__(self, intrinsics: np.ndarray, method_name: str = "hybrid",
                 device: str = "tpu"):
        self.intrinsics = jnp.asarray(np.asarray(intrinsics)[:3, :3],
                                      jnp.float32)
        if method_name not in ("hybrid", "point_to_plane"):
            raise ValueError("Odometry method does not exist!")
        self.hybrid = method_name == "hybrid"
        self.last_rgbd = None
        self.max_depth = 10.0

    @staticmethod
    def _gray(image: np.ndarray) -> jnp.ndarray:
        # scale by DTYPE, not by a per-frame value heuristic: a nearly-black
        # 0-255 frame (exposure glitch — exactly when the rescue odometer
        # runs) would otherwise skip the /255 and the hybrid photometric
        # residual would compare inconsistently scaled frames. The loader
        # contract is uint8-range color; float inputs already in [0, 1]
        # pass through unscaled.
        img = np.asarray(image, np.float32)
        if image.dtype == np.uint8 or img.max() > 1.001:
            img = img / 255.0
        return jnp.asarray(img @ np.array([0.299, 0.587, 0.114], np.float32))

    def update_last_rgbd(self, image: np.ndarray, depth: np.ndarray) -> None:
        d = np.asarray(depth, np.float32)
        if d.ndim == 3:
            d = d[..., 0]
        self.last_rgbd = (jnp.asarray(d), self._gray(image))

    def estimate_rel_pose(self, image: np.ndarray, depth: np.ndarray,
                          init_transform=None) -> np.ndarray:
        d = np.asarray(depth, np.float32)
        if d.ndim == 3:
            d = d[..., 0]
        curr = (jnp.asarray(d), self._gray(image))
        T = rgbd_odometry_multi_scale(
            self.last_rgbd[0], self.last_rgbd[1], curr[0], curr[1],
            self.intrinsics,
            None if init_transform is None else jnp.asarray(init_transform),
            hybrid=self.hybrid, max_depth=self.max_depth)
        self.last_rgbd = curr
        # T maps prev-frame coords -> curr-frame coords; the pose initializer
        # wants M with x_prev = M x_curr (c2w of curr relative to prev)
        return np.asarray(geo.invert_se3(T))
