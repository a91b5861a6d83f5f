import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtgaussian_slam_tpu.ops import geometry as geo


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return geo.normalize(q)


class TestQuaternions:
    def test_identity(self):
        q = jnp.array([[1.0, 0, 0, 0]])
        np.testing.assert_allclose(geo.quat_to_rotmat(q)[0], jnp.eye(3), atol=1e-6)

    def test_known_rotation_z90(self):
        # 90 deg about z: q = (cos45, 0, 0, sin45)
        s = np.sin(np.pi / 4)
        q = jnp.array([[np.cos(np.pi / 4), 0, 0, s]])
        R = geo.quat_to_rotmat(q)[0]
        expected = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_roundtrip_matrix_quat(self):
        key = jax.random.PRNGKey(0)
        q = random_quats(key, 64)
        R = geo.quat_to_rotmat(q)
        q2 = geo.rotmat_to_quat(R)
        # quaternions are sign-ambiguous
        sign = jnp.sign(jnp.sum(q * q2, -1, keepdims=True))
        np.testing.assert_allclose(q, q2 * sign, atol=1e-5)

    def test_quat_mult_matches_matrix_product(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        q1, q2 = random_quats(k1, 16), random_quats(k2, 16)
        R12 = geo.quat_to_rotmat(geo.quat_mult(q1, q2))
        np.testing.assert_allclose(
            R12, geo.quat_to_rotmat(q1) @ geo.quat_to_rotmat(q2), atol=1e-5
        )

    def test_unnormalized_quat_rotation_valid(self):
        q = jnp.array([[2.0, 0, 0, 0], [0, 3.0, 0, 0]])
        R = geo.quat_to_rotmat(q)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2),
                                   jnp.broadcast_to(jnp.eye(3), (2, 3, 3)), atol=1e-6)


class TestSE3:
    def test_invert(self):
        key = jax.random.PRNGKey(2)
        q = random_quats(key, 8)
        t = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
        T = geo.pose_to_w2c(q, t)
        TT = geo.invert_se3(T) @ T
        np.testing.assert_allclose(TT, jnp.broadcast_to(jnp.eye(4), (8, 4, 4)), atol=1e-5)

    def test_pose_roundtrip(self):
        q = geo.normalize(jnp.array([[0.5, 0.5, -0.3, 0.2]]))
        t = jnp.array([[1.0, -2.0, 3.0]])
        T = geo.pose_to_w2c(q, t)
        q2, t2 = geo.w2c_to_pose(T)
        sign = jnp.sign(jnp.sum(q * q2, -1, keepdims=True))
        np.testing.assert_allclose(q, q2 * sign, atol=1e-5)
        np.testing.assert_allclose(t, t2, atol=1e-6)

    def test_relative_transformation(self):
        T1 = geo.pose_to_w2c(jnp.array([1.0, 0, 0, 0]), jnp.array([1.0, 0, 0]))
        T2 = geo.pose_to_w2c(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 1, 0]))
        rel = geo.relative_transformation(T1, T2)
        np.testing.assert_allclose(T1 @ rel, T2, atol=1e-6)

    def test_constant_velocity(self):
        # camera translating at constant velocity along x
        def w2c_at(d):
            return geo.pose_to_w2c(jnp.array([1.0, 0, 0, 0]), jnp.array([d, 0.0, 0.0]))
        pred = geo.constant_velocity_init(w2c_at(2.0), w2c_at(1.0))
        np.testing.assert_allclose(pred, w2c_at(3.0), atol=1e-5)


class TestBackprojection:
    def setup_method(self):
        self.K = jnp.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])

    def test_backproject_project_roundtrip(self):
        depth = jnp.full((48, 64), 2.0)
        pts = geo.backproject(depth, self.K, depth_factor=1.0, pixel_center=0.0)
        uv, z = geo.project_points(pts, self.K)
        xs, ys = jnp.meshgrid(jnp.arange(64.0), jnp.arange(48.0))
        np.testing.assert_allclose(uv[:, 0], xs.reshape(-1), atol=1e-3)
        np.testing.assert_allclose(uv[:, 1], ys.reshape(-1), atol=1e-3)
        np.testing.assert_allclose(z, 2.0, atol=1e-4)

    def test_depth_factor(self):
        depth = jnp.ones((4, 4))
        pts = geo.backproject(depth, self.K, depth_factor=1.005)
        np.testing.assert_allclose(pts[:, 2], 1.005, atol=1e-6)

    def test_world_transform(self):
        depth = jnp.ones((4, 4))
        c2w = geo.pose_to_w2c(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0, 10.0]))
        pts = geo.backproject(depth, self.K, c2w=c2w, depth_factor=1.0)
        np.testing.assert_allclose(pts[:, 2], 11.0, atol=1e-5)

    def test_backproject_at_matches_selection_convention(self):
        depth = jnp.arange(16.0).reshape(4, 4) + 1.0
        rows = jnp.array([1, 2])
        cols = jnp.array([3, 0])
        pts = geo.backproject_at(depth, self.K, rows, cols)
        z = depth[rows, cols]
        np.testing.assert_allclose(pts[:, 2], z)
        np.testing.assert_allclose(pts[:, 0], (cols - 32.0) / 100.0 * z, atol=1e-5)

    def test_normals_of_plane(self):
        # fronto-parallel plane -> normals along -z (or +z, consistent)
        depth = jnp.full((32, 32), 3.0)
        n = geo.depth_to_normals(depth, self.K)
        inner = jnp.abs(n[8:-8, 8:-8, 2])
        np.testing.assert_allclose(inner, 1.0, atol=1e-4)


class TestVisibility:
    def test_bilinear_sample_exact_grid(self):
        img = jnp.arange(12.0).reshape(3, 4)
        uv = jnp.array([[1.0, 1.0], [2.0, 0.0], [0.5, 0.5]])
        out = geo.bilinear_sample(img, uv)
        np.testing.assert_allclose(out[0], img[1, 1])
        np.testing.assert_allclose(out[1], img[0, 2])
        np.testing.assert_allclose(out[2], (0 + 1 + 4 + 5) / 4.0)

    def test_bilinear_outside_zero(self):
        img = jnp.ones((3, 4))
        out = geo.bilinear_sample(img, jnp.array([[-2.0, 0.0], [10.0, 1.0]]))
        np.testing.assert_allclose(out, 0.0)

    def test_visibility_mask_plane(self):
        K = jnp.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        depth = jnp.full((48, 64), 2.0)
        pts = geo.backproject(depth, K, depth_factor=1.0, pixel_center=0.0)
        eye = jnp.eye(4)
        vis = geo.visibility_mask(pts, eye, K, depth, thres=0.05)
        assert bool(jnp.all(vis))
        # points pushed forward 20% -> inconsistent
        vis2 = geo.visibility_mask(pts * jnp.array([1.0, 1.0, 1.2]), eye, K, depth, 0.05)
        assert float(jnp.mean(vis2)) < 0.1

    def test_frustum_mask(self):
        K = jnp.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        pts = jnp.array([
            [0.0, 0.0, 2.0],     # center, inside
            [0.0, 0.0, -2.0],    # behind
            [10.0, 0.0, 2.0],    # far off-image
        ])
        m = geo.frustum_mask(jnp.eye(4), K, pts, H=48, W=64, edge=0)
        assert m.tolist() == [True, False, False]
