import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtgaussian_slam_tpu.ops.camera import Camera
from vtgaussian_slam_tpu.ops.rasterizer import render_dense, render_tiled
from vtgaussian_slam_tpu.ops.rasterizer.projection import project_gaussians

CAM = Camera(height=48, width=64, fx=60.0, fy=60.0, cx=32.0, cy=24.0)


def make_scene(key, n=200, depth_range=(1.0, 4.0)):
    """Random Gaussians inside the camera frustum."""
    ks = jax.random.split(key, 6)
    z = jax.random.uniform(ks[0], (n,), minval=depth_range[0], maxval=depth_range[1])
    # pixel targets inside image -> camera-frame xy
    u = jax.random.uniform(ks[1], (n,), minval=4.0, maxval=CAM.width - 4.0)
    v = jax.random.uniform(ks[2], (n,), minval=4.0, maxval=CAM.height - 4.0)
    x = (u - CAM.cx) / CAM.fx * z
    y = (v - CAM.cy) / CAM.fy * z
    means = jnp.stack([x, y, z], -1)
    quats = jax.random.normal(ks[3], (n, 4))
    scales = jnp.exp(jax.random.uniform(ks[4], (n, 3), minval=-3.5, maxval=-2.5))
    opac = jax.nn.sigmoid(jax.random.normal(ks[5], (n,)))
    colors = jax.random.uniform(key, (n, 3))
    return means, quats, scales, opac, colors


class TestProjection:
    def test_center_gaussian_projects_to_center(self):
        means = jnp.array([[0.0, 0.0, 2.0]])
        p = project_gaussians(means, jnp.array([[1.0, 0, 0, 0]]),
                              jnp.full((1, 3), 0.05), jnp.array([0.9]), CAM)
        # integer-pixel convention: center lands at (cx - 0.5, cy - 0.5)
        np.testing.assert_allclose(p.mean2d[0], [CAM.cx - 0.5, CAM.cy - 0.5], atol=1e-4)
        assert bool(p.valid[0])
        assert float(p.radius[0]) > 0

    def test_behind_camera_culled(self):
        means = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 0.1]])
        p = project_gaussians(means, jnp.ones((2, 4)), jnp.full((2, 3), 0.05),
                              jnp.ones(2), CAM)
        assert not bool(p.valid[0])
        assert not bool(p.valid[1])  # below NEAR_CULL=0.2
        assert float(p.radius[0]) == 0.0

    def test_isotropic_radius_scales_with_distance(self):
        means = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 4.0]])
        p = project_gaussians(means, jnp.ones((2, 4)), jnp.full((2, 3), 0.1),
                              jnp.ones(2), CAM)
        # screen radius ~ f*s/z (+dilation floor): farther -> smaller
        assert float(p.radius[0]) > float(p.radius[1])

    def test_active_mask(self):
        means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 2.0]])
        p = project_gaussians(means, jnp.ones((2, 4)), jnp.full((2, 3), 0.05),
                              jnp.ones(2), CAM, active=jnp.array([True, False]))
        assert bool(p.valid[0]) and not bool(p.valid[1])


class TestDenseRenderer:
    def test_single_gaussian_analytic(self):
        """One opaque-ish Gaussian: image equals alpha * color pointwise."""
        s = 0.05
        z = 2.0
        op = 0.8
        means = jnp.array([[0.0, 0.0, z]])
        img, radii = render_dense(
            means, jnp.array([[1.0, 0, 0, 0]]), jnp.full((1, 3), s),
            jnp.array([op]), jnp.array([[1.0, 0.5, 0.25]]), CAM)
        # analytic: sigma2d = (f*s/z)^2 + 0.3 ; alpha = op*exp(-d^2/(2 sigma2d))
        sig2 = (CAM.fx * s / z) ** 2 + 0.3
        ys, xs = np.meshgrid(np.arange(CAM.height), np.arange(CAM.width), indexing="ij")
        d2 = (xs - (CAM.cx - 0.5)) ** 2 + (ys - (CAM.cy - 0.5)) ** 2
        alpha = op * np.exp(-0.5 * d2 / sig2)
        alpha[alpha < 1 / 255.0] = 0.0
        np.testing.assert_allclose(np.asarray(img[0]), alpha * 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(img[1]), alpha * 0.5, atol=1e-4)
        # radius uses lam1 = mid + sqrt(max(0.1, mid^2 - det)) (CUDA formula):
        lam1 = sig2 + np.sqrt(0.1)  # isotropic: mid = sig2, mid^2 - det = 0
        assert float(radii[0]) == pytest.approx(np.ceil(3 * np.sqrt(lam1)))

    def test_occlusion_order(self):
        """Near opaque Gaussian hides a far one regardless of input order."""
        base = dict(
            quats=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1)),
            scales=jnp.full((2, 3), 0.3),
            opacities=jnp.array([0.999, 0.999]),
        )
        means_nf = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 3.0]])
        colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        img1, _ = render_dense(means_nf, base["quats"], base["scales"],
                               base["opacities"], colors, CAM)
        img2, _ = render_dense(means_nf[::-1], base["quats"], base["scales"],
                               base["opacities"], colors[::-1], CAM)
        np.testing.assert_allclose(img1, img2, atol=1e-5)
        # center pixel dominated by red (near)
        c = np.asarray(img1[:, CAM.height // 2, CAM.width // 2])
        assert c[0] > 0.95 and c[1] < 0.05

    def test_depth_sil_channels(self):
        """(z, 1, z^2) color channels give depth and silhouette on blending."""
        means = jnp.array([[0.0, 0.0, 2.0]])
        z = means[:, 2]
        colors = jnp.stack([z, jnp.ones_like(z), z * z], -1)
        img, _ = render_dense(means, jnp.array([[1.0, 0, 0, 0]]),
                              jnp.full((1, 3), 0.5), jnp.array([0.99]), colors, CAM)
        sil = np.asarray(img[1])
        depth = np.asarray(img[0])
        cy, cx = CAM.height // 2, CAM.width // 2
        assert sil[cy, cx] > 0.9
        np.testing.assert_allclose(depth[cy, cx] / sil[cy, cx], 2.0, atol=1e-3)

    def test_inactive_gaussians_invisible(self):
        means = jnp.array([[0.0, 0.0, 2.0], [0.1, 0.0, 2.0]])
        img_all, _ = render_dense(means, jnp.ones((2, 4)), jnp.full((2, 3), 0.1),
                                  jnp.array([0.9, 0.9]), jnp.ones((2, 3)), CAM)
        img_one, _ = render_dense(means, jnp.ones((2, 4)), jnp.full((2, 3), 0.1),
                                  jnp.array([0.9, 0.9]), jnp.ones((2, 3)), CAM,
                                  active=jnp.array([True, False]))
        img_single, _ = render_dense(means[:1], jnp.ones((1, 4)), jnp.full((1, 3), 0.1),
                                     jnp.array([0.9]), jnp.ones((1, 3)), CAM)
        assert not np.allclose(img_all, img_one, atol=1e-5)
        np.testing.assert_allclose(img_one, img_single, atol=1e-5)


class TestTiledMatchesDense:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_scene(self, seed):
        means, quats, scales, opac, colors = make_scene(jax.random.PRNGKey(seed))
        img_d, rad_d = render_dense(means, quats, scales, opac, colors, CAM)
        img_t, rad_t = render_tiled(means, quats, scales, opac, colors, CAM,
                                    max_pairs_per_tile=256, chunk=64)
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d), atol=2e-4)
        np.testing.assert_allclose(np.asarray(rad_t), np.asarray(rad_d), atol=0)

    def test_anisotropic(self):
        key = jax.random.PRNGKey(7)
        means, quats, _, opac, colors = make_scene(key, n=64)
        scales = jnp.exp(jax.random.uniform(key, (64, 3), minval=-4.0, maxval=-2.0))
        img_d, _ = render_dense(means, quats, scales, opac, colors, CAM)
        img_t, _ = render_tiled(means, quats, scales, opac, colors, CAM,
                                max_pairs_per_tile=128, chunk=32)
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d), atol=2e-4)

    def test_gradients_match(self):
        means, quats, scales, opac, colors = make_scene(jax.random.PRNGKey(3), n=64)
        target = jnp.zeros((3, CAM.height, CAM.width))

        def loss_fn(render):
            def f(m, o, c, s):
                img, _ = render(m, quats, s, o, c, CAM)
                return jnp.mean(jnp.abs(img - target))
            return f

        gd = jax.grad(loss_fn(render_dense), argnums=(0, 1, 2, 3))(
            means, opac, colors, scales)
        def tiled(m, q, s, o, c, cam):
            return render_tiled(m, q, s, o, c, cam, max_pairs_per_tile=128, chunk=32)
        gt = jax.grad(loss_fn(tiled), argnums=(0, 1, 2, 3))(
            means, opac, colors, scales)
        for a, b in zip(gd, gt):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    def test_gradcheck_finite_difference(self):
        """Finite-difference check of d(loss)/d(means) through the tiled path."""
        key = jax.random.PRNGKey(11)
        means, quats, scales, opac, colors = make_scene(key, n=8)

        def loss(m):
            img, _ = render_tiled(m, quats, scales, opac, colors, CAM,
                                  max_pairs_per_tile=64, chunk=16)
            return jnp.sum(img ** 2)

        g = jax.grad(loss)(means)
        eps = 1e-3
        for (i, j) in [(0, 0), (3, 2), (5, 1)]:
            e = jnp.zeros_like(means).at[i, j].set(eps)
            fd = (loss(means + e) - loss(means - e)) / (2 * eps)
            np.testing.assert_allclose(float(g[i, j]), float(fd), rtol=0.05, atol=1e-3)


class TestTileBoundaries:
    def test_gaussian_straddling_tiles(self):
        """A Gaussian centered on a tile corner must appear in all 4 tiles."""
        # tile grid is 16x16; corner at (16, 16) -> camera coords
        z = 2.0
        u, v = 16.0, 16.0
        x = (u + 0.5 - CAM.cx) / CAM.fx * z
        y = (v + 0.5 - CAM.cy) / CAM.fy * z
        means = jnp.array([[x, y, z]])
        img_d, _ = render_dense(means, jnp.array([[1.0, 0, 0, 0]]),
                                jnp.full((1, 3), 0.2), jnp.array([0.95]),
                                jnp.ones((1, 3)), CAM)
        img_t, _ = render_tiled(means, jnp.array([[1.0, 0, 0, 0]]),
                                jnp.full((1, 3), 0.2), jnp.array([0.95]),
                                jnp.ones((1, 3)), CAM,
                                max_pairs_per_tile=64, chunk=16)
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d), atol=1e-5)
        # energy present on both sides of the tile boundary
        assert float(img_t[0, 14, 14]) > 0.1 and float(img_t[0, 18, 18]) > 0.1

    def test_non_multiple_of_tile_image(self):
        cam = Camera(height=50, width=70, fx=60.0, fy=60.0, cx=35.0, cy=25.0)
        means, quats, scales, opac, colors = make_scene(jax.random.PRNGKey(5), n=64)
        img_d, _ = render_dense(means, quats, scales, opac, colors, cam)
        img_t, _ = render_tiled(means, quats, scales, opac, colors, cam,
                                max_pairs_per_tile=128, chunk=32)
        assert img_t.shape == (3, 50, 70)
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d), atol=2e-4)


class TestPallasPath:
    def test_pallas_matches_xla_blend(self):
        means, quats, scales, opac, colors = make_scene(jax.random.PRNGKey(2))
        img_x, rad_x = render_tiled(means, quats, scales, opac, colors, CAM,
                                    max_pairs_per_tile=128, chunk=32)
        img_p, rad_p = render_tiled(means, quats, scales, opac, colors, CAM,
                                    max_pairs_per_tile=128, chunk=32,
                                    use_pallas=True)
        np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(rad_p), np.asarray(rad_x))

    def test_pallas_gradients_match(self):
        means, quats, scales, opac, colors = make_scene(jax.random.PRNGKey(4),
                                                        n=64)

        def loss(use_pallas):
            def f(m, o, c):
                img, _ = render_tiled(m, quats, scales, o, c, CAM,
                                      max_pairs_per_tile=64, chunk=32,
                                      use_pallas=use_pallas)
                return jnp.sum(img ** 2)
            return f

        g_x = jax.grad(loss(False), argnums=(0, 1, 2))(means, opac, colors)
        g_p = jax.grad(loss(True), argnums=(0, 1, 2))(means, opac, colors)
        for a, b in zip(g_x, g_p):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-4, rtol=1e-4)


class TestBinningOrder:
    def test_per_tile_depth_sorted_and_outlier_robust(self):
        """The fused log-depth sort key must keep each tile's slot list
        depth-ordered — including with a single far outlier in the scene,
        which a linear frame-range quantization would have let coarsen the
        ordering for everyone (review finding, round 3)."""
        from vtgaussian_slam_tpu.ops.rasterizer.binning import bin_gaussians

        key = jax.random.PRNGKey(11)
        means, quats, scales, opac, colors = make_scene(key, n=300)
        # inject one far-depth outlier (valid, in-frustum)
        means = means.at[0].set(jnp.array([0.0, 0.0, 900.0]))
        proj = project_gaussians(means, quats, scales, opac, CAM,
                                 jnp.ones((300,), bool))
        tiles_x, tiles_y = 4, 3
        b = bin_gaussians(proj, 16, 3, tiles_x, tiles_y, 128,
                          with_inverse=True)
        depth = np.asarray(proj.depth)
        tab = np.asarray(b.tab)
        counts = np.asarray(b.counts)
        for t in range(tiles_x * tiles_y):
            d = depth[tab[t, : counts[t]]]
            # non-decreasing up to one quantization step (~6e-5 relative)
            assert np.all(np.diff(d) >= -1e-4 * np.maximum(d[:-1], 1)), t
        # inverse map positions point back at the right gaussian
        inv = np.asarray(b.inv_pos)
        mpt = tab.shape[1]
        for g in range(0, 300, 37):
            for p in inv[g]:
                if p >= 0:
                    assert tab[p // mpt, p % mpt] == g
