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

    def test_strided_depth_pool_preserves_ranking(self):
        """Scores from a stride-subsampled candidate depth pool match the
        full-res scores closely enough to preserve the selection ranking
        (BaseframeStore stores depths /stride; see pipeline.BaseframeStore).
        Uses a non-constant depth field so subsampling actually matters."""
        K = jnp.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
        yy, xx = jnp.meshgrid(jnp.arange(48.0), jnp.arange(64.0),
                              indexing="ij")
        depth = 2.0 + 0.3 * jnp.sin(xx / 7.0) + 0.2 * jnp.cos(yy / 5.0)
        offsets = [0.0, 0.3, 0.8, 2.0]
        w2cs = jnp.stack([
            geo.pose_to_w2c(jnp.array([1.0, 0, 0, 0]),
                            jnp.array([dx, 0.0, 0.0])) for dx in offsets])
        depths_full = jnp.stack([depth] * len(offsets))
        s = 4
        depths_sub = depths_full[:, ::s, ::s]
        p_full = np.asarray(overlap_percents(
            depth, jnp.eye(4), K, w2cs, depths_full, jax.random.PRNGKey(0),
            pixels=0, edge=2, use_vis=True, kf_depth_thresh=0.05))
        p_sub = np.asarray(overlap_percents(
            depth, jnp.eye(4), K, w2cs, depths_sub, jax.random.PRNGKey(0),
            pixels=0, edge=2, use_vis=True, kf_depth_thresh=0.05,
            depth_stride=s))
        np.testing.assert_allclose(p_sub, p_full, atol=0.08)
        assert list(np.argsort(-p_sub)) == list(np.argsort(-p_full))


class TestBaseframeStoreMemory:
    def test_pool_memory_scales_inverse_stride_squared(self):
        """The candidate pool's depth buffer is bounded by
        #entries * H*W / stride^2 — a 1,000-baseframe ScanNet-scale pool
        stays under 100 MB at the default stride (VERDICT round-2 item 4)."""
        from vtgaussian_slam_tpu.core.pipeline import BaseframeStore
        H, W, n = 480, 640, 1000
        store = BaseframeStore(H, W, quantum=256, stride=4)
        d = jnp.ones((H, W), jnp.float32)
        q = jnp.array([1.0, 0, 0, 0])
        tr = jnp.zeros(3)
        for i in range(n):
            store.append(i, d, q, tr)
        assert len(store) == n
        pool_bytes = store.depths.size * store.depths.dtype.itemsize
        full_bytes = n * H * W * 4
        assert pool_bytes < 100 * 1024 * 1024
        assert pool_bytes * 8 < full_bytes  # ~stride^2 = 16x smaller (+quantum)
        # stored values are exact strided samples
        np.testing.assert_array_equal(np.asarray(store.depths[0]),
                                      np.asarray(d[::4, ::4]))


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
