"""TSDF fusion + marching tetrahedra mesh extraction tests."""
import numpy as np
import pytest

from vtgaussian_slam_tpu.eval.mesh import (TSDFVolume, accuracy_completion,
                                           clean_mesh, marching_cubes,
                                           sample_surface)


def sphere_sdf_grid(n=40, r=0.35):
    ax = np.linspace(-0.5, 0.5, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(x * x + y * y + z * z) - r, ax


class TestMarchingCubes:
    def test_sphere_surface(self):
        vol, ax = sphere_sdf_grid()
        verts, faces = marching_cubes(vol, 0.0)
        assert len(verts) > 100 and len(faces) > 100
        # vertices lie on the sphere of radius 0.35 (voxel -> world)
        scale = ax[1] - ax[0]
        world = verts * scale - 0.5
        radii = np.linalg.norm(world, axis=1)
        np.testing.assert_allclose(radii.mean(), 0.35, atol=0.01)
        assert radii.std() < 0.01

    def test_empty_volume(self):
        verts, faces = marching_cubes(np.ones((8, 8, 8)), 0.0)
        assert len(verts) == 0 and len(faces) == 0

    def test_nan_regions_skipped(self):
        vol, _ = sphere_sdf_grid(24)
        vol[:12] = np.nan
        verts, faces = marching_cubes(vol, 0.0)
        assert len(verts) > 0
        assert np.all(verts[:, 0] >= 11.0)


class TestTSDF:
    def test_fuse_synthetic_plane(self):
        """A fronto-parallel plane at z=2 fused from one view."""
        H, W = 60, 80
        K = np.array([[70.0, 0, 40], [0, 70.0, 30], [0, 0, 1]])
        depth = np.full((H, W), 2.0, np.float32)
        color = np.full((H, W, 3), 0.5, np.float32)
        vol = TSDFVolume([-1.2, -1.0, 1.7], [1.2, 1.0, 2.3],
                         voxel_length=0.03)
        vol.integrate(color, depth, K, np.eye(4))
        verts, faces = vol.extract_mesh()
        assert len(verts) > 50
        # reconstructed surface near z = 2
        np.testing.assert_allclose(np.median(verts[:, 2]), 2.0, atol=0.05)

    def test_multi_view_sphere_metrics(self):
        """Fuse several views of a plane and check accuracy/completion of the
        mesh against itself is ~0."""
        H, W = 48, 64
        K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
        depth = np.full((H, W), 1.5, np.float32)
        color = np.zeros((H, W, 3), np.float32)
        vol = TSDFVolume([-1.0, -0.8, 1.2], [1.0, 0.8, 1.8], 0.03)
        vol.integrate(color, depth, K, np.eye(4))
        verts, faces = vol.extract_mesh()
        verts2, faces2 = clean_mesh(verts, faces, min_faces=10)
        assert len(faces2) > 0
        acc, comp = accuracy_completion(verts2, faces2, verts, faces,
                                        n_samples=40000)
        # bounded by inter-sample spacing at this density
        assert acc < 0.006 and comp < 0.006


class TestCleanMesh:
    def test_small_components_removed(self):
        # two disconnected triangles + a big fan
        n_fan = 30
        center = np.array([[0.0, 0, 0]])
        ring = np.stack([np.cos(np.linspace(0, 3, n_fan)),
                         np.sin(np.linspace(0, 3, n_fan)),
                         np.zeros(n_fan)], -1)
        verts = np.concatenate([center, ring,
                                np.array([[5.0, 5, 5], [5.1, 5, 5],
                                          [5, 5.1, 5]])])
        fan = np.stack([np.zeros(n_fan - 1, int), np.arange(1, n_fan),
                        np.arange(2, n_fan + 1)], -1)
        tiny = np.array([[n_fan + 1, n_fan + 2, n_fan + 3]]) - 1 + 1
        faces = np.concatenate([fan, tiny])
        v2, f2 = clean_mesh(verts, faces, min_faces=5)
        assert len(f2) == len(fan)

    def test_sample_surface(self):
        verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
        faces = np.array([[0, 1, 2]])
        pts = sample_surface(verts, faces, 500)
        assert pts.shape == (500, 3)
        assert np.all(pts[:, 2] == 0)
        assert np.all(pts[:, 0] + pts[:, 1] <= 1.0 + 1e-9)


class TestLPIPS:
    def test_architecture_with_random_weights(self, tmp_path):
        import numpy as np
        from vtgaussian_slam_tpu.eval.lpips import lpips_fn

        rng = np.random.default_rng(0)
        w = {}
        chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3),
                 (256, 256, 3)]
        for i, (ci, co, k) in enumerate(chans):
            w[f"net.slice.{i}.weight"] = rng.normal(
                0, 0.05, (co, ci, k, k)).astype(np.float32)
            w[f"net.slice.{i}.bias"] = np.zeros(co, np.float32)
        for i, co in enumerate([64, 192, 384, 256, 256]):
            w[f"lin{i}.model.1.weight"] = np.abs(
                rng.normal(0, 1, (1, co, 1, 1))).astype(np.float32)
        f = lpips_fn(w)
        assert f is not None
        a = rng.uniform(size=(3, 64, 64)).astype(np.float32)
        b = rng.uniform(size=(3, 64, 64)).astype(np.float32)
        assert abs(f(a, a)) < 1e-6
        assert f(a, b) > 0

    def test_no_weights_returns_none(self):
        from vtgaussian_slam_tpu.eval.lpips import lpips_fn
        assert lpips_fn(None) is None or callable(lpips_fn(None))
