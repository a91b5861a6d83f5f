"""Keyframe/base-frame selection: geometric scoring + host list logic."""
import numpy as np
import jax
import jax.numpy as jnp

from vtgaussian_slam_tpu.core.selection import (find_earliest_keyframe,
                                                overlap_percents,
                                                select_earliest_topk_base,
                                                select_topk_overlap,
                                                select_visbased)
from vtgaussian_slam_tpu.ops import geometry as geo


def make_views():
    """Current frame at origin; candidates at increasing lateral offsets."""
    K = jnp.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
    depth = jnp.full((48, 64), 2.0)
    offsets = [0.0, 0.5, 1.5, 4.0]  # meters sideways
    w2cs = jnp.stack([
        geo.pose_to_w2c(jnp.array([1.0, 0, 0, 0]), jnp.array([dx, 0.0, 0.0]))
        for dx in offsets])
    depths = jnp.stack([depth] * len(offsets))
    return K, depth, w2cs, depths


class TestOverlapPercents:
    def test_monotone_with_offset(self):
        K, depth, w2cs, depths = make_views()
        pct = overlap_percents(depth, jnp.eye(4), K, w2cs, depths,
                               jax.random.PRNGKey(0), pixels=1600, edge=2)
        p = np.asarray(pct)
        # same view: all inside except the 2px edge band (60*44/64/48=0.86)
        assert p[0] > 0.8
        assert p[0] > p[1] > p[2]             # decays with distance
        assert p[3] < 0.05                    # far view: almost no overlap

    def test_vis_mode_depth_consistency(self):
        K, depth, w2cs, depths = make_views()
        # corrupt candidate 1's depth: points no longer depth-consistent
        bad = depths.at[1].set(5.0)
        pct = overlap_percents(depth, jnp.eye(4), K, w2cs, bad,
                               jax.random.PRNGKey(0), pixels=0, edge=2,
                               use_vis=True, kf_depth_thresh=0.05)
        p = np.asarray(pct)
        assert p[0] > 0.75
        assert p[1] < 0.05  # visible-mask kills inconsistent candidate


class TestHostSelection:
    def test_topk_overlap(self):
        assert select_topk_overlap(np.array([0.1, 0.9, 0.0, 0.5]), 2) == [1, 3]
        assert select_topk_overlap(np.array([0.0, 0.0]), 2) == []

    def test_visbased_earliest(self):
        sel, earliest = select_visbased(np.array([0.9, 0.6, 0.55, 0.2]), 1,
                                        earliest_thres=0.5)
        assert sel == [0]
        assert earliest == [2]  # last above threshold in sorted order

    def test_earliest_topk_small_pool_early_out(self):
        cfg = {"baseframe_every": 30, "overlap_every": 5}
        # pool <= 3 sections: reference early-outs at the first non-empty
        # threshold (keyframe_selection.py:680)
        pct = np.array([0.05] * 6 + [0.2] * 6 + [0.6] * 6)
        secs = select_earliest_topk_base(pct, cfg, earliest_thres=0.5,
                                         lower_percent=0.8, topk_base=3)
        assert secs == [2]

    def test_earliest_topk_threshold_decay(self):
        cfg = {"baseframe_every": 30, "overlap_every": 5}
        # 4 sections; threshold decays 0.5 -> ~0.1 until >= 3 sections pass
        pct = np.array([0.05] * 6 + [0.2] * 6 + [0.35] * 6 + [0.6] * 6)
        secs = select_earliest_topk_base(pct, cfg, earliest_thres=0.5,
                                         lower_percent=0.8, topk_base=3)
        assert secs == [1, 2, 3]

    def test_earliest_topk_no_decay_needed(self):
        cfg = {"baseframe_every": 30, "overlap_every": 5}
        pct = np.array([0.9] * 6 + [0.8] * 6 + [0.7] * 6)
        secs = select_earliest_topk_base(pct, cfg, earliest_thres=0.5,
                                         lower_percent=0.8, topk_base=2)
        assert secs == [0, 1]

    def test_find_earliest_chain_walk(self):
        # corr chain: frame 120 tracked vs base 80, 80 vs 40, 40 vs 0
        corr = [[0, None, 40], [40, None, 80], [80, None, 120]]
        scores = {0: 0.9, 1: 0.9, 2: 0.9}
        got = find_earliest_keyframe(corr, lambda s: scores[s],
                                     baseframe_every=40, threshold=0.5)
        assert got == 0  # walks all the way back
        scores = {0: 0.2, 1: 0.9, 2: 0.9}
        got = find_earliest_keyframe(corr, lambda s: scores[s],
                                     baseframe_every=40, threshold=0.5)
        assert got == 40  # stops where overlap drops
