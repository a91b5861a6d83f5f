"""Checkpoint/resume: a resumed run must continue and produce consistent state."""
import numpy as np

from test_e2e_synthetic import make_config
from vtgaussian_slam_tpu.core.pipeline import VTGaussianSLAM
from vtgaussian_slam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

import pytest

# full-engine / subprocess integration tests: minutes each on the
# 1-core CPU box. Fast safety net: pytest -m "not slow" (pytest.ini).
pytestmark = pytest.mark.slow


def test_checkpoint_roundtrip(tmp_path):
    cfg = make_config(num_frames=7, baseframe_every=5, use_gt_poses=True,
                      track_iters=5, map_iters=8)
    cfg["workdir"] = str(tmp_path)
    e = VTGaussianSLAM(cfg)
    e.process_frame_zero()
    for t in range(1, 4):
        e.process_frame(t)
    path = save_checkpoint(e, 3)

    e2 = VTGaussianSLAM(cfg)
    resume_t = load_checkpoint(e2, path)
    assert resume_t == 4
    assert len(e2.sections) == len(e.sections)
    for a, b in zip(e.sections, e2.sections):
        assert int(a.n_active) == int(b.n_active)
        n = int(a.n_active)
        np.testing.assert_allclose(np.asarray(a.params.means3d[:n]),
                                   np.asarray(b.params.means3d[:n]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e.traj.quats),
                               np.asarray(e2.traj.quats), atol=1e-7)
    assert e2.baseframes.ids == e.baseframes.ids

    # resumed engine can continue processing
    for t in range(resume_t, 7):
        e2.process_frame(t)
    assert len(e2.sections) == 2  # sections at t=0 and t=5


def test_run_resume_via_config(tmp_path):
    cfg = make_config(num_frames=6, baseframe_every=5, use_gt_poses=True,
                      track_iters=4, map_iters=6)
    cfg["workdir"] = str(tmp_path)
    cfg["save_checkpoints"] = True
    cfg["checkpoint_interval"] = 3
    e = VTGaussianSLAM(cfg)
    e.run(progress=False)

    cfg2 = dict(cfg)
    cfg2["load_checkpoint"] = True
    cfg2["checkpoint_time_idx"] = 0  # latest
    e2 = VTGaussianSLAM(cfg2)
    e2.run(progress=False)
    assert len(e2.sections) == len(e.sections)
