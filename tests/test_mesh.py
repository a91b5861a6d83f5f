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
        verts2, faces2 = clean_mesh(verts, faces, min_verts=10)
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
        v2, f2 = clean_mesh(verts, faces, min_verts=5)
        assert len(f2) == len(fan)

    def test_sample_surface(self):
        verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
        faces = np.array([[0, 1, 2]])
        pts = sample_surface(verts, faces, 500)
        assert pts.shape == (500, 3)
        assert np.all(pts[:, 2] == 0)
        assert np.all(pts[:, 0] + pts[:, 1] <= 1.0 + 1e-9)


def box_mesh(half=1.5, max_edge=0.12):
    """Closed axis-aligned cube room, subdivided for the rasterizer."""
    from vtgaussian_slam_tpu.eval.mesh import subdivide_to_edge

    s = half
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                  for z in (-s, s)], np.float64)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = []
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    return subdivide_to_edge(v, np.array(faces), max_edge, max_rounds=8)


class TestMeshDepthRender:
    def _cam(self):
        return np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]],
                        np.float32)

    def test_frontal_quad_depth(self):
        from vtgaussian_slam_tpu.eval.mesh import render_mesh_depth
        import jax.numpy as jnp

        # quad [-0.1, 0.1]^2 at z=2 -> ~12 px across at fx=60
        verts = jnp.asarray([[-0.1, -0.1, 2.0], [0.1, -0.1, 2.0],
                             [0.1, 0.1, 2.0], [-0.1, 0.1, 2.0]], jnp.float32)
        faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
        d = np.asarray(render_mesh_depth(verts, faces,
                                         jnp.eye(4, dtype=jnp.float32),
                                         jnp.asarray(self._cam()), 48, 64))
        assert abs(d[24, 32] - 2.0) < 1e-4       # center covered at z=2
        assert d[2, 2] == 0.0                    # background empty
        inside = d[d > 0]
        assert 30 < inside.size < 100            # ~7x7 px footprint
        np.testing.assert_allclose(inside, 2.0, atol=1e-4)

    def test_occlusion_scatter_min(self):
        from vtgaussian_slam_tpu.eval.mesh import render_mesh_depth
        import jax.numpy as jnp

        def quad(z, r):
            return [[-r, -r, z], [r, -r, z], [r, r, z], [-r, r, z]]

        # far quad: +-6 px at fx=60; near quad: +-2 px
        verts = jnp.asarray(quad(2.0, 0.2) + quad(1.5, 0.05), jnp.float32)
        faces = jnp.asarray([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]],
                            jnp.int32)
        d = np.asarray(render_mesh_depth(verts, faces,
                                         jnp.eye(4, dtype=jnp.float32),
                                         jnp.asarray(self._cam()), 48, 64))
        assert abs(d[24, 32] - 1.5) < 1e-4       # near quad wins the center
        assert abs(d[24, 32 + 5] - 2.0) < 1e-4   # far quad visible outside it

    def test_perspective_correct_slant(self):
        from vtgaussian_slam_tpu.eval.mesh import (render_mesh_depth,
                                                   subdivide_to_edge)
        import jax.numpy as jnp

        # plane z = 2 + x, x in [-0.2, 0.2]
        v = np.array([[-0.2, -0.2, 1.8], [0.2, -0.2, 2.2],
                      [0.2, 0.2, 2.2], [-0.2, 0.2, 1.8]])
        f = np.array([[0, 1, 2], [0, 2, 3]])
        v, f = subdivide_to_edge(v, f, 0.05)
        d = np.asarray(render_mesh_depth(jnp.asarray(v), jnp.asarray(f),
                                         jnp.eye(4, dtype=jnp.float32),
                                         jnp.asarray(self._cam()), 48, 64))
        # analytic: pixel u -> ray x/z=(u-cx)/fx, surface z=2+x
        #   z = 2 / (1 - (u-cx)/fx)
        for u in (30, 32, 34):
            expect = 2.0 / (1.0 - (u - 32) / 60.0)
            assert abs(d[24, u] - expect) < 2e-3


class TestSubdivideICP:
    def test_subdivide_edges_shrink(self):
        from vtgaussian_slam_tpu.eval.mesh import subdivide_to_edge

        v = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
        f = np.array([[0, 1, 2]])
        v2, f2 = subdivide_to_edge(v, f, 0.3, max_rounds=8)
        e = v2[f2]
        longest = np.linalg.norm(e[:, 0] - e[:, 1], axis=1)
        assert longest.max() <= 0.3 + 1e-6
        # total area preserved
        def area(vv, ff):
            p = vv[ff]
            return (0.5 * np.linalg.norm(
                np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=1)).sum()
        np.testing.assert_allclose(area(v2, f2), 0.5, rtol=1e-6)

    def test_icp_recovers_small_transform(self):
        from vtgaussian_slam_tpu.eval.mesh import icp_align

        rng = np.random.default_rng(0)
        src = rng.uniform(-1, 1, (2000, 3))
        ang = np.deg2rad(3.0)
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
        t = np.array([0.05, -0.03, 0.02])
        dst = src @ R.T + t
        T = icp_align(src, dst)
        aligned = src @ T[:3, :3].T + T[:3, 3]
        assert np.abs(aligned - dst).max() < 1e-3


class Test2DMetric:
    def test_identical_meshes_zero(self):
        from vtgaussian_slam_tpu.eval.mesh import calc_2d_metric

        v, f = box_mesh()
        out = calc_2d_metric(v, f, v, f, n_imgs=3, align=False, seed=1,
                             h=100, w=100, focal=50.0, max_edge=0.12)
        assert out["depth l1"] == 0.0

    def test_shifted_rec_detected(self):
        from vtgaussian_slam_tpu.eval.mesh import calc_2d_metric

        v, f = box_mesh()
        out = calc_2d_metric(v + np.array([0.05, 0, 0]), f, v, f,
                             n_imgs=3, align=False, seed=1,
                             h=100, w=100, focal=50.0, max_edge=0.12)
        assert 0.5 < out["depth l1"] < 30.0

    def test_unseen_rejection(self):
        from vtgaussian_slam_tpu.eval.mesh import calc_2d_metric

        v, f = box_mesh()
        # unseen points densely covering every direction -> no valid view
        g = np.arange(400) + 0.5
        phi = np.arccos(1 - 2 * g / 400)
        theta = np.pi * (1 + 5**0.5) * g
        sph = 5.0 * np.stack([np.sin(phi) * np.cos(theta),
                              np.sin(phi) * np.sin(theta), np.cos(phi)], -1)
        out = calc_2d_metric(v, f, v, f, pc_unseen=sph, n_imgs=2,
                             align=False, seed=1, h=100, w=100, focal=50.0,
                             max_edge=0.12, max_tries=20)
        assert np.isnan(out["depth l1"])


class TestPlyIO:
    def test_roundtrip_binary(self, tmp_path):
        from vtgaussian_slam_tpu.eval.plyio import read_ply, write_ply

        v, f = box_mesh(max_edge=2.0)
        rng = np.random.default_rng(0)
        c = rng.uniform(size=(len(v), 3))
        p = str(tmp_path / "m.ply")
        write_ply(p, v, f, c)
        v2, f2, c2 = read_ply(p)
        np.testing.assert_allclose(v2, v, atol=1e-6)
        np.testing.assert_array_equal(f2, f)
        np.testing.assert_allclose(c2, c, atol=1.0 / 255)

    def test_roundtrip_no_colors(self, tmp_path):
        from vtgaussian_slam_tpu.eval.plyio import read_ply, write_ply

        v, f = box_mesh(max_edge=2.0)
        p = str(tmp_path / "m.ply")
        write_ply(p, v, f)
        v2, f2, c2 = read_ply(p)
        np.testing.assert_allclose(v2, v, atol=1e-6)
        np.testing.assert_array_equal(f2, f)
        assert c2 is None

    def test_ascii_with_quads(self, tmp_path):
        from vtgaussian_slam_tpu.eval.plyio import read_ply

        p = tmp_path / "a.ply"
        p.write_text(
            "ply\nformat ascii 1.0\ncomment test\n"
            "element vertex 4\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\n"
            "property list uchar int vertex_indices\nend_header\n"
            "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
            "4 0 1 2 3\n")
        v, f, c = read_ply(str(p))
        assert v.shape == (4, 3) and c is None
        # quad fan-triangulated into 2 tris
        np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])

    def test_bad_magic(self, tmp_path):
        from vtgaussian_slam_tpu.eval.plyio import read_ply

        p = tmp_path / "bad.ply"
        p.write_bytes(b"obj\nnot a ply\n")
        with pytest.raises(ValueError):
            read_ply(str(p))


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
