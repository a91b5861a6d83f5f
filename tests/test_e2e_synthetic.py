"""End-to-end SLAM on a procedural synthetic scene (golden-value tests).

The reference has no tests (SURVEY.md section 4); these integration tests are
the replacement: known camera motion on an analytically-rendered room, so
tracking error and render quality have ground truth.
"""
import numpy as np
import pytest

from vtgaussian_slam_tpu.core.pipeline import VTGaussianSLAM
from vtgaussian_slam_tpu.eval.evaluate import eval_sequence
from vtgaussian_slam_tpu.eval.metrics import evaluate_ate

# full-engine / subprocess integration tests: minutes each on the
# 1-core CPU box. Fast safety net: pytest -m "not slow" (pytest.ini).
pytestmark = pytest.mark.slow


def make_config(num_frames=11, baseframe_every=5, use_gt_poses=False,
                track_iters=40, map_iters=40, motion_scale=0.25,
                auto_pair_budget=False):
    # auto_pair_budget is pinned OFF for the module fixtures: at 48x64 (12
    # tiles) it re-buckets to 4096 pairs/tile, which is correct for quality
    # but ~16x the blend work — too slow for CPU CI. The auto path has its
    # own dedicated small run in TestAutoPairBudget.
    return dict(
        workdir="/tmp/vtgs_test", run_name="synthetic", seed=3,
        baseframe_every=baseframe_every,
        map_every=1, keyframe_every=1, mapping_window_size=3,
        scene_radius_depth_ratio=3, mean_sq_dist_method="projective",
        gaussian_distribution="isotropic",
        report_global_progress_every=1000,
        eval_mode=False, eval_every=1, use_wandb=False,
        data=dict(
            dataset_name="synthetic",
            synthetic=dict(num_frames=num_frames, height=48, width=64,
                           seed=1, motion_scale=motion_scale),
            desired_image_height=48, desired_image_width=64,
            start=0, end=-1, stride=1, num_frames=-1,
        ),
        tracking=dict(
            use_gt_poses=use_gt_poses, forward_prop=True,
            num_iters=track_iters, use_sil_for_loss=True, sil_thres=0.95,
            use_l1=True, ignore_outlier_depth_loss=False,
            # reference replica hyperparameters (configs/replica/room0.py:74-86)
            loss_weights=dict(im=0.5, depth=0.025),
            lrs=dict(means3D=0.0, rgb_colors=0.0, unnorm_rotations=0.0,
                     logit_opacities=0.0, log_scales=0.0,
                     cam_unnorm_rots=0.0004, cam_trans=0.002),
        ),
        mapping=dict(
            num_iters=map_iters, add_new_gaussians=True, sil_thres=0.5,
            use_l1=True, use_sil_for_loss=False,
            ignore_outlier_depth_loss=False,
            loss_weights=dict(im=1.0, depth=1.0),
            lrs=dict(means3D=0.0, rgb_colors=0.0025, unnorm_rotations=0.0,
                     logit_opacities=0.05, log_scales=0.005,
                     cam_unnorm_rots=1e-8, cam_trans=1e-7),
            fixed_lrs=dict(means3D=0, rgb_colors=0, unnorm_rotations=0,
                           logit_opacities=0, log_scales=0,
                           cam_unnorm_rots=0.0, cam_trans=0.0),
        ),
        tpu=dict(capacity_quantum=4096, span_cap=3, max_pairs_per_tile=256,
                 blend_chunk=64, baseframe_capacity_quantum=8,
                 auto_pair_budget=auto_pair_budget),
    )


@pytest.fixture(scope="module")
def gt_pose_run():
    cfg = make_config(use_gt_poses=True, map_iters=150)
    engine = VTGaussianSLAM(cfg)
    engine.run(progress=False)
    return engine


@pytest.fixture(scope="module")
def tracked_run():
    cfg = make_config(use_gt_poses=False, track_iters=40, map_iters=60,
                      motion_scale=0.1)
    engine = VTGaussianSLAM(cfg)
    engine.run(progress=False)
    return engine


class TestGtPoseMapping:
    def test_sections_created(self, gt_pose_run):
        # 11 frames, baseframe_every=5 -> sections at t=0, 5, 10
        assert len(gt_pose_run.sections) == 3

    def test_gaussian_counts_positive(self, gt_pose_run):
        for sec in gt_pose_run.sections:
            assert int(sec.n_active) > 100
            assert int(sec.n_active) <= sec.capacity

    def test_mapped_scene_renders_well(self, gt_pose_run, tmp_path):
        params_ls = gt_pose_run.export_params_ls()
        res = eval_sequence(gt_pose_run.dataset, params_ls,
                            gt_pose_run.num_frames, str(tmp_path),
                            eval_every=1, baseframe_every=5)
        # mapped with ground-truth poses: renders must be converging toward gt.
        # Budgets here are tiny (60 iters at 48x64); full-scale runs use
        # 60-100 iters at 680x1200 and score far higher — this guards the
        # mechanism, benchmark configs guard the quality.
        assert res["psnr"] > 17.0, res
        assert res["depth_l1"] < 0.45, res
        assert res["ate_rmse"] < 1e-4, res
        assert np.isfinite(res["ms_ssim"]), res

    def test_params_ls_format_roundtrip(self, gt_pose_run, tmp_path):
        params_ls = gt_pose_run.export_params_ls()
        path = tmp_path / "params_ls.npy"
        np.save(path, np.array(params_ls, dtype=object), allow_pickle=True)
        loaded = np.load(path, allow_pickle=True)
        assert len(loaded) == 3
        p = loaded[0]
        for k in ("means3D", "rgb_colors", "unnorm_rotations",
                  "logit_opacities", "log_scales", "cam_unnorm_rots",
                  "cam_trans"):
            assert k in p
        assert p["cam_unnorm_rots"].shape == (1, 4, 11)
        assert p["means3D"].shape[1] == 3


class TestTrackedRun:
    def test_trajectory_error_bounded(self, tracked_run):
        import jax.numpy as jnp
        from vtgaussian_slam_tpu.ops import geometry as geo

        est, gt = [], []
        for t in range(tracked_run.num_frames):
            est.append(np.linalg.inv(np.asarray(
                geo.pose_to_w2c(geo.normalize(tracked_run.traj.quats[t]),
                                tracked_run.traj.trans[t]))))
            gt.append(np.linalg.inv(tracked_run.gt_w2c[t]))
        ate = evaluate_ate(gt, est)
        # synthetic room spans ~6m; tracked ATE must be far under motion scale
        assert ate < 0.05, ate

    def test_eval_recon_exports_scored_mesh(self, gt_pose_run, tmp_path):
        """Render -> TSDF-fuse -> clean -> .ply export -> self-score."""
        from vtgaussian_slam_tpu.eval import eval_recon
        from vtgaussian_slam_tpu.eval.plyio import read_ply

        eng = gt_pose_run
        params_ls = eng.export_params_ls()
        out = eval_recon(eng.dataset, params_ls, 4, str(tmp_path),
                         eval_every=1, baseframe_every=eng.bfe,
                         voxel_length=0.05, sdf_trunc=0.12,
                         backend_kwargs={"use_pallas": False,
                                         "max_pairs_per_tile": 256})
        assert out["n_faces"] > 50
        v, f, c = read_ply(out["mesh_path"])
        assert len(v) == out["n_verts"] and c is not None
        scored = eval_recon(eng.dataset, params_ls, 4, str(tmp_path / "s"),
                            eval_every=1, baseframe_every=eng.bfe,
                            voxel_length=0.05, sdf_trunc=0.12,
                            gt_mesh_path=out["mesh_path"],
                            backend_kwargs={"use_pallas": False,
                                            "max_pairs_per_tile": 256})
        # identical fusion scored against itself: only sampling noise
        assert scored["accuracy_cm"] < 3.0 and scored["completion_cm"] < 3.0

    def test_densification_grew_sections(self, tracked_run):
        # later frames should have added non-presence Gaussians
        assert any(n > 0 for n in tracked_run.num_gs_per_frame_ls[3:])

    def test_stats_populated(self, tracked_run):
        s = tracked_run.final_stats()
        assert s["avg_tracking_frame_s"] > 0
        assert s["avg_mapping_frame_s"] > 0
        assert s["num_gaussians"] > 0


class TestAutoPairBudget:
    def test_bucketing(self):
        from vtgaussian_slam_tpu.core.pipeline import auto_pair_budget

        # low density -> stays at the config floor
        assert auto_pair_budget(1000, 300, 2, 512) == 512
        # medium scene regime: 863k gaussians, 300 tiles, span 2
        # avg ~11.5k pairs/tile -> need ~960 -> bucket 1024 (validated)
        assert auto_pair_budget(863265, 300, 2, 256) == 1024
        # smoke regime: 20k gaussians over 12 tiles, span 3; tiny images
        # use divisor 4 -> need ~3.9k -> bucket 4096 (validated)
        assert auto_pair_budget(20813, 12, 3, 256) == 4096
        # memory cap binds at many tiles: 8M entries / 3225 tiles ~ 2601
        assert auto_pair_budget(10_000_000, 3225, 3, 512) == 2048
        # explicit floor above need is respected
        assert auto_pair_budget(100, 300, 2, 2048) == 2048

    def test_engine_rebuckets_as_sections_grow(self):
        # tiny dedicated run with the auto budget ON and a low floor: the
        # first frame alone back-projects 3072 gaussians over 12 tiles, so
        # the engine must raise the budget above the 64-pair floor
        from vtgaussian_slam_tpu.core.pipeline import auto_pair_budget

        cfg = make_config(num_frames=2, track_iters=3, map_iters=3,
                          auto_pair_budget=True)
        cfg["tpu"]["max_pairs_per_tile"] = 64
        eng = VTGaussianSLAM(cfg)
        eng.run(progress=False)
        bk = dict(eng.backend_kwargs)
        n = max(int(s.n_active) for s in eng.sections)
        expect = auto_pair_budget(n, 12, cfg["tpu"]["span_cap"], 64)
        assert expect > 64
        assert bk["max_pairs_per_tile"] == expect


class TestPairBudgetControl:
    """The measured-harm budget control (pipeline._update_pair_budget):
    boost x2 only on TWO consecutive probe readings > 1% (one transient —
    e.g. an untrained early map — cannot wind the budget up), decay /2 only
    on FOUR consecutive readings < 0.2%, history reset after each change
    so the new budget is re-probed from scratch."""

    def _engine(self):
        cfg = make_config(num_frames=2, track_iters=3, map_iters=3,
                          auto_pair_budget=True)
        eng = VTGaussianSLAM(cfg)
        eng.run(progress=False)
        return eng

    def test_hysteresis(self):
        import numpy as np

        eng = self._engine()
        eng._mpt_boost, eng._harm_hist = 1, []

        def feed(v):
            eng._pending_harm = np.float32(v)
            eng._update_pair_budget()

        feed(0.9)                      # transient: no boost yet
        assert eng._mpt_boost == 1
        assert eng._harm_hist == [pytest.approx(0.9)]
        feed(0.0001)                   # healed: still no boost
        assert eng._mpt_boost == 1
        feed(0.05)
        feed(0.02)                     # two consecutive > 1% -> boost
        assert eng._mpt_boost == 2 and eng._harm_hist == []
        for v in (0.0, 0.0, 0.0):      # three clean: not enough to decay
            feed(v)
        assert eng._mpt_boost == 2
        feed(0.0)                      # fourth clean -> decay
        assert eng._mpt_boost == 1 and eng._harm_hist == []
        feed(0.0)                      # at floor: clean readings no-op
        assert eng._mpt_boost == 1
        # probe cadence tightens while fewer than two readings exist
        assert len(eng._harm_hist) < 2

    def test_stat_records_max(self):
        import numpy as np

        eng = self._engine()
        base = eng.stats.get("trunc_probe_diff_max", 0.0)
        eng._pending_harm = np.float32(max(base, 0.5))
        eng._update_pair_budget()
        assert eng.stats["trunc_probe_diff_max"] >= 0.5


class TestTrackingLossViz:
    def test_viz_dump_lands(self, tmp_path):
        """visualize_tracking_loss writes per-frame debug figures
        (reference :616-675; fused-loop per-frame equivalent)."""
        cfg = make_config(num_frames=3, track_iters=3, map_iters=2)
        cfg["workdir"] = str(tmp_path)
        cfg["tracking"]["visualize_tracking_loss"] = True
        eng = VTGaussianSLAM(cfg)
        eng.run(progress=False)
        import glob
        pngs = glob.glob(str(tmp_path / "synthetic" / "tracking_loss_viz"
                             / "frame*.png"))
        assert len(pngs) >= 2, pngs


class TestTrackRebin:
    """tpu.track_rebin_every segments the fused tracking loop with cache
    rebuilds at the CURRENT pose between segments. Two separable claims:

    1. The segment carry (Adam moments/count, best-candidate bookkeeping,
       sil threshold) is exact: a single segment covering the whole budget
       must be BIT-IDENTICAL to the unsegmented loop.
    2. Actual rebinning re-culls/re-orders gaussians at the moved pose, so
       it is a genuinely different optimization path — poses shift within
       scene noise (diagnosed round 3: ~1e-2 at motion 0.05, carry verified
       exact). The spec is therefore QUALITY preservation: rebinning must
       not degrade tracking ATE on easy scenes.
    """

    @staticmethod
    def _run(rebin):
        cfg = make_config(num_frames=5, track_iters=12, map_iters=6,
                          motion_scale=0.05)
        cfg["tpu"]["track_rebin_every"] = rebin
        eng = VTGaussianSLAM(cfg)
        eng.run(progress=False)
        est = [np.asarray(eng._traj_w2c_np(t)) for t in range(5)]
        ate = float(evaluate_ate(eng.gt_w2c[:5], est))
        return eng, ate

    def test_segment_carry_is_exact(self):
        # rebin >= budget -> one segment through the rebin code path; must
        # reproduce the unsegmented loop bit-for-bit
        e0, _ = self._run(0)
        e1, _ = self._run(12)
        t0 = np.asarray(e0.traj.trans[:5])
        t1 = np.asarray(e1.traj.trans[:5])
        np.testing.assert_array_equal(t1, t0)

    def test_rebin_preserves_quality_on_low_motion(self):
        e0, ate0 = self._run(0)
        e1, ate1 = self._run(5)   # segments of 5, 5, 2
        assert e1.stats["tracking_jit_iters"] == e0.stats["tracking_jit_iters"]
        assert np.isfinite(np.asarray(e1.traj.trans[:5])).all()
        # rebinning must not hurt easy scenes: ATE within 25% + 2 mm of the
        # single-binning run (measured 0.0361 vs 0.0342 at this config)
        assert ate1 <= ate0 * 1.25 + 2e-3, (ate1, ate0)
