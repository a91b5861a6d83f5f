"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtgaussian_slam_tpu.models.gaussians import GaussianParams
from vtgaussian_slam_tpu.ops.camera import Camera
from vtgaussian_slam_tpu.ops.rasterizer import render_tiled
from vtgaussian_slam_tpu.parallel import (make_mesh, sharded_mapping_step,
                                          sharded_render,
                                          sharded_tracking_step)

CAM = Camera(height=64, width=64, fx=60.0, fy=60.0, cx=32.0, cy=32.0)


def scene(n=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    z = jax.random.uniform(ks[0], (n,), minval=1.5, maxval=3.5)
    u = jax.random.uniform(ks[1], (n,), minval=4.0, maxval=60.0)
    v = jax.random.uniform(ks[2], (n,), minval=4.0, maxval=60.0)
    means = jnp.stack([(u - 32) / 60 * z, (v - 32) / 60 * z, z], -1)
    params = GaussianParams(
        means3d=means,
        rgb_colors=jax.random.uniform(ks[3], (n, 3)),
        unnorm_rotations=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        logit_opacities=jax.random.normal(ks[4], (n, 1)),
        log_scales=jax.random.uniform(ks[5], (n, 1), minval=-3.5, maxval=-2.5),
    )
    return params


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(8)


class TestShardedRender:
    def test_matches_single_device(self, mesh8):
        p = scene()
        active = jnp.ones((128,), bool)
        colors = p.rgb_colors
        img1, _ = render_tiled(p.means3d, p.unnorm_rotations, p.scales3(),
                               p.opacities(), colors, CAM, active,
                               max_pairs_per_tile=128, chunk=32)
        img8 = sharded_render(p.means3d, p.unnorm_rotations, p.scales3(),
                              p.opacities(), colors, CAM, mesh8, active,
                              max_pairs_per_tile=128, chunk=32)
        assert img8.shape == img1.shape
        np.testing.assert_allclose(np.asarray(img8), np.asarray(img1),
                                   atol=2e-5)


class TestShardedSteps:
    def test_tracking_step_runs_and_descends(self, mesh8):
        p = scene(256, seed=1)
        active = jnp.ones((256,), bool)
        # render a gt frame at a reference pose, start slightly off
        q_gt = jnp.array([1.0, 0, 0, 0])
        t_gt = jnp.zeros(3)
        z = p.means3d[:, 2]
        colors6 = jnp.concatenate(
            [p.rgb_colors, jnp.stack([z, jnp.ones_like(z), z * z], -1)], 1)
        img, _ = render_tiled(p.means3d, p.unnorm_rotations, p.scales3(),
                              p.opacities(), colors6, CAM, active,
                              max_pairs_per_tile=128, chunk=32)
        gt_color, gt_depth = img[:3], img[3:4]

        q = q_gt + jnp.array([0.0, 0.002, -0.002, 0.001])
        t = t_gt + jnp.array([0.01, -0.01, 0.0])
        kwargs = tuple(sorted(dict(max_pairs_per_tile=128, chunk=32).items()))
        losses = []
        for _ in range(5):
            loss, q, t = sharded_tracking_step(
                p, active, q, t, gt_color, gt_depth, CAM, mesh8,
                raster_kwargs=kwargs)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_mapping_step_runs_and_descends(self, mesh8):
        p = scene(256, seed=2)
        active = jnp.ones((256,), bool)
        rng = jax.random.PRNGKey(3)
        gt_color = jax.random.uniform(rng, (3, CAM.height, CAM.width))
        gt_depth = jnp.full((1, CAM.height, CAM.width), 2.0)
        kwargs = tuple(sorted(dict(max_pairs_per_tile=128, chunk=32).items()))
        loss0, p1 = sharded_mapping_step(
            p, active, jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
            gt_color, gt_depth, CAM, mesh8, raster_kwargs=kwargs, lr=0.01)
        for _ in range(8):
            loss, p1 = sharded_mapping_step(
                p1, active, jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
                gt_color, gt_depth, CAM, mesh8, raster_kwargs=kwargs, lr=0.01)
        assert float(loss) < float(loss0)
