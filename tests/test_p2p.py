"""Point-to-plane candidate metric (projective association)."""
import numpy as np
import jax.numpy as jnp
import pytest

from vtgaussian_slam_tpu.core.p2p import make_p2p_target, point2plane_metric
from vtgaussian_slam_tpu.datasets.synthetic import SyntheticRoomDataset
from vtgaussian_slam_tpu.ops import geometry as geo


@pytest.fixture(scope="module")
def frames():
    ds = SyntheticRoomDataset(num_frames=20, height=64, width=96, seed=3,
                              motion_scale=0.3)
    c0, d0, K, p0 = ds[0]
    c1, d1, _, p1 = ds[1]
    K3 = jnp.asarray(K[:3, :3], jnp.float32)
    w2c0 = jnp.asarray(np.linalg.inv(np.asarray(p0, np.float64)), jnp.float32)
    w2c1 = jnp.asarray(np.linalg.inv(np.asarray(p1, np.float64)), jnp.float32)
    return d0, d1, K3, w2c0, w2c1


class TestP2PMetric:
    def test_zero_at_true_pose_same_frame(self, frames):
        d0, _, K3, w2c0, _ = frames
        target = make_p2p_target(jnp.asarray(d0[..., 0]), K3, w2c0)
        m = point2plane_metric(target, jnp.asarray(d0[..., 0]), K3, w2c0)
        assert float(m) < 1e-6

    def test_true_pose_beats_offset(self, frames):
        d0, d1, K3, w2c0, w2c1 = frames
        target = make_p2p_target(jnp.asarray(d0[..., 0]), K3, w2c0)
        m_true = point2plane_metric(target, jnp.asarray(d1[..., 0]), K3, w2c1)
        # perturb the source pose by 1 cm along the normal-rich axis
        w2c_bad = w2c1.at[2, 3].add(0.01)
        m_bad = point2plane_metric(target, jnp.asarray(d1[..., 0]), K3, w2c_bad)
        assert float(m_true) < float(m_bad)

    def test_methods(self, frames):
        d0, d1, K3, w2c0, w2c1 = frames
        target = make_p2p_target(jnp.asarray(d0[..., 0]), K3, w2c0)
        for method in ("sum", "max", "max100"):
            m = point2plane_metric(target, jnp.asarray(d1[..., 0]), K3, w2c1,
                                   method=method)
            assert np.isfinite(float(m)) and float(m) >= 0

    def test_no_overlap_scores_infinite(self, frames):
        """Zero correspondence pairs (no overlap, or a NaN pose whose
        comparisons are all False) must score +inf — a vacuous 0 would beat
        every real pose in the best-candidate selection. The reference
        hard-errors on an empty correspondence set rather than prefer it."""
        d0, d1, K3, w2c0, _ = frames
        target = make_p2p_target(jnp.asarray(d0[..., 0]), K3, w2c0)
        # point the source camera the opposite way: no associations
        flip = geo.pose_to_w2c(jnp.array([0.0, 0.0, 1.0, 0.0]),
                               jnp.array([50.0, 0.0, 0.0]))
        m = point2plane_metric(target, jnp.asarray(d1[..., 0]), K3, flip)
        assert float(m) == float("inf")
        # NaN pose: every pair comparison is False -> also +inf, never best
        nan_pose = jnp.full((4, 4), jnp.nan)
        m2 = point2plane_metric(target, jnp.asarray(d1[..., 0]), K3, nan_pose)
        assert float(m2) == float("inf")
