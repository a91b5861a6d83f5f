"""Frozen-binning cached renderer vs the generic tiled renderer."""
import numpy as np
import jax
import jax.numpy as jnp

from vtgaussian_slam_tpu.core.losses import render_slam
from vtgaussian_slam_tpu.core.track_cache import (build_track_cache,
                                                  render_cached)
from vtgaussian_slam_tpu.models.gaussians import GaussianParams
from vtgaussian_slam_tpu.ops.camera import Camera

CAM = Camera(height=48, width=64, fx=60.0, fy=60.0, cx=32.0, cy=24.0)


def scene(n=160, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    z = jax.random.uniform(ks[0], (n,), minval=1.5, maxval=3.5)
    u = jax.random.uniform(ks[1], (n,), minval=4.0, maxval=60.0)
    v = jax.random.uniform(ks[2], (n,), minval=4.0, maxval=44.0)
    means = jnp.stack([(u - 32) / 60 * z, (v - 24) / 60 * z, z], -1)
    params = GaussianParams(
        means3d=means,
        rgb_colors=jax.random.uniform(ks[3], (n, 3)),
        unnorm_rotations=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        logit_opacities=jax.random.normal(ks[4], (n, 1)),
        log_scales=jax.random.uniform(ks[5], (n, 1), minval=-3.5, maxval=-2.5),
    )
    return params, jnp.ones((n,), bool)


BK = {"span_cap": 3, "max_pairs_per_tile": 256, "chunk": 128,
      "use_pallas": True}


class TestTrackCache:
    def test_exact_at_build_pose(self):
        params, active = scene()
        quat = jnp.array([1.0, 0.001, 0.0, 0.0])
        trans = jnp.array([0.01, 0.0, 0.0])
        ref = render_slam(params, active, quat, trans, CAM, BK)
        cache = build_track_cache(params, active, quat, trans, CAM,
                                  span_cap=3, max_pairs_per_tile=256,
                                  chunk=128)
        got = render_cached(cache, quat, trans, CAM, chunk=128)
        # atol covers the kernel's MXU quadratic-form expansion: power is
        # evaluated as phi @ coef (reordered f32 math vs the generic
        # renderer's dx/dy chain), shifting composited values ~2e-5
        np.testing.assert_allclose(np.asarray(got.im), np.asarray(ref.im),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(got.depth),
                                   np.asarray(ref.depth), atol=5e-5)
        np.testing.assert_allclose(np.asarray(got.silhouette),
                                   np.asarray(ref.silhouette), atol=5e-5)

    def test_close_at_perturbed_pose(self):
        """Millimeter pose deltas: cached render stays visually identical."""
        params, active = scene(seed=1)
        quat = jnp.array([1.0, 0, 0, 0])
        trans = jnp.zeros(3)
        cache = build_track_cache(params, active, quat, trans, CAM,
                                  span_cap=3, max_pairs_per_tile=256,
                                  chunk=128)
        quat2 = quat + jnp.array([0.0, 0.0005, -0.0005, 0.0])
        trans2 = trans + jnp.array([0.002, -0.001, 0.001])
        ref = render_slam(params, active, quat2, trans2, CAM, BK)
        got = render_cached(cache, quat2, trans2, CAM, chunk=128)
        diff = np.abs(np.asarray(got.im) - np.asarray(ref.im))
        assert diff.mean() < 1e-3, diff.mean()

    def test_pose_gradients_flow(self):
        params, active = scene(seed=2)
        quat = jnp.array([1.0, 0, 0, 0])
        trans = jnp.zeros(3)
        cache = build_track_cache(params, active, quat, trans, CAM,
                                  span_cap=3, max_pairs_per_tile=256,
                                  chunk=128)
        target = jnp.zeros((3, CAM.height, CAM.width))

        def loss(q, t):
            r = render_cached(cache, q, t, CAM, chunk=128)
            return jnp.sum((r.im - target) ** 2)

        gq, gt = jax.grad(loss, argnums=(0, 1))(quat, trans)
        assert np.all(np.isfinite(gq)) and np.all(np.isfinite(gt))
        assert float(jnp.abs(gt).max()) > 0

        # must match the generic renderer's pose gradients (FD is unreliable
        # at f32 on a sum-of-squares this size)
        def loss_generic(q, t):
            r = render_slam(params, active, q, t, CAM, BK)
            return jnp.sum((r.im - target) ** 2)

        gq2, gt2 = jax.grad(loss_generic, argnums=(0, 1))(quat, trans)
        # tolerance covers the splat kernel's moment-expansion rounding:
        # BOTH the forward quadratic (power via phi @ coef) and the backward
        # pixel reductions (phi^T @ g_power) reorder f32 math vs the generic
        # renderer, and the pose gradient is a cancellation-heavy sum over
        # ~1e5 slots, so small components drift ~1% relative. The per-
        # component bound is therefore loose — the DIRECTION and MAGNITUDE
        # checks below are the real regression gate (a genuine chain-rule
        # bug corrupts direction, cancellation noise does not).
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gt2), rtol=2e-2)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(gq2), rtol=2e-2,
                                   atol=1e-3)

        def cos(a, b):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

        assert cos(gq, gq2) > 1 - 1e-5, cos(gq, gq2)
        assert cos(gt, gt2) > 1 - 1e-5, cos(gt, gt2)
        assert abs(np.linalg.norm(gq) / np.linalg.norm(gq2) - 1) < 5e-3
        assert abs(np.linalg.norm(gt) / np.linalg.norm(gt2) - 1) < 5e-3


class TestFusedPoseGrads:
    def test_pose_grads_match_generic(self):
        """Fused splat kernel pose gradients == autodiff through the generic
        XLA renderer at the build pose (identical binning)."""
        params, active = scene(seed=7)
        quat = jnp.array([1.0, 0.02, -0.01, 0.005])
        trans = jnp.array([0.03, -0.02, 0.01])
        cache = build_track_cache(params, active, quat, trans, CAM,
                                  span_cap=3, max_pairs_per_tile=256,
                                  chunk=128)
        key = jax.random.PRNGKey(3)
        target = jax.random.uniform(key, (3, CAM.height, CAM.width))

        def loss_cached(q, t):
            r = render_cached(cache, q, t, CAM, chunk=128)
            return (jnp.sum(jnp.abs(r.im - target))
                    + 0.1 * jnp.sum(jnp.abs(r.depth))
                    + 0.05 * jnp.sum(r.silhouette))

        def loss_gen(q, t):
            r = render_slam(params, active, q, t, CAM, BK)
            return (jnp.sum(jnp.abs(r.im - target))
                    + 0.1 * jnp.sum(jnp.abs(r.depth))
                    + 0.05 * jnp.sum(r.silhouette))

        gq_c, gt_c = jax.grad(loss_cached, argnums=(0, 1))(quat, trans)
        gq_g, gt_g = jax.grad(loss_gen, argnums=(0, 1))(quat, trans)
        np.testing.assert_allclose(np.asarray(gq_c), np.asarray(gq_g),
                                   rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_g),
                                   rtol=2e-3, atol=1e-4)
