import numpy as np
import pytest

from vtgaussian_slam_tpu.core.odometry import VisualOdometer
from vtgaussian_slam_tpu.datasets.synthetic import SyntheticRoomDataset


@pytest.mark.parametrize("method", ["point_to_plane", "hybrid"])
def test_odometry_recovers_relative_pose(method):
    # ~30 frames over the loop -> realistic centimeter-scale inter-frame motion
    ds = SyntheticRoomDataset(num_frames=30, height=96, width=128, seed=2,
                              motion_scale=0.3)
    c0, d0, K, p0 = ds[0]
    c1, d1, _, p1 = ds[1]
    odo = VisualOdometer(K[:3, :3], method_name=method)
    odo.update_last_rgbd(c0, d0)
    rel = odo.estimate_rel_pose(c1, d1)

    rel_gt = np.linalg.inv(np.asarray(p0, np.float64)) @ np.asarray(p1, np.float64)
    # translation error bounded by the inter-frame motion. Pure
    # point-to-plane has an unconstrained sliding DOF on this box room's
    # dominant planes, so only the hybrid (geometry+photometric) method is
    # held to a tight bound.
    t_err = np.linalg.norm(rel[:3, 3] - rel_gt[:3, 3])
    motion = np.linalg.norm(rel_gt[:3, 3])
    limit = 0.25 * motion if method == "hybrid" else 0.6 * motion
    assert t_err < max(limit, 0.005), (t_err, motion)
    # rotation error < 0.5 deg
    dR = rel[:3, :3].T @ rel_gt[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5, ang


def test_odometry_identity_for_same_frame():
    ds = SyntheticRoomDataset(num_frames=2, height=64, width=96, seed=0)
    c0, d0, K, _ = ds[0]
    odo = VisualOdometer(K[:3, :3], method_name="point_to_plane")
    odo.update_last_rgbd(c0, d0)
    rel = odo.estimate_rel_pose(c0, d0)
    np.testing.assert_allclose(rel, np.eye(4), atol=5e-4)


def test_invalid_method_raises():
    with pytest.raises(ValueError):
        VisualOdometer(np.eye(3), method_name="nope")
