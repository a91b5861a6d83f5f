"""Two-class tile binning (binning.bin_two_class, map_cache.KFBinCache2C).

The dense class (top-k_dense tiles by pair count) keeps the full pair
budget; every other tile runs the smaller sparse budget. When k_dense
covers every tile whose count exceeds the sparse budget, the split is
BIT-EXACT vs single-class binning — these tests pin that invariant for
tables, renders and gradients, plus the inverse map's structural
exactness and graceful truncation when the dense set under-covers.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtgaussian_slam_tpu.core.map_cache import (build_kf_cache,
                                                build_kf_cache_2c,
                                                pack_fields8, render_binned,
                                                render_binned_2c)
from vtgaussian_slam_tpu.models.gaussians import GaussianParams
from vtgaussian_slam_tpu.ops.camera import Camera
from vtgaussian_slam_tpu.ops import geometry as geo
from vtgaussian_slam_tpu.ops.rasterizer.binning import (bin_gaussians,
                                                        bin_two_class)
from vtgaussian_slam_tpu.ops.rasterizer.pallas_splat import BLOCK
from vtgaussian_slam_tpu.ops.rasterizer.projection import project_gaussians

# full-engine / subprocess integration tests: minutes each on the
# 1-core CPU box. Fast safety net: pytest -m "not slow" (pytest.ini).
pytestmark = pytest.mark.slow

CAM = Camera(height=96, width=128, fx=60.0, fy=60.0, cx=64.0, cy=48.0)
TX, TY = 8, 6
N_TILES = TX * TY
QUAT = jnp.array([1.0, 0.0, 0.0, 0.0])
TRANS = jnp.zeros((3,))


def scene(n=3000, seed=7):
    """Deliberately HETEROGENEOUS tile density (u^2 concentrates splats
    toward the left of the image) so a genuine sparse tile class exists."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    z = jax.random.uniform(ks[0], (n,), minval=1.5, maxval=3.5)
    u = 4.0 + 120.0 * jax.random.uniform(ks[1], (n,)) ** 2
    v = jax.random.uniform(ks[2], (n,), minval=4.0, maxval=92.0)
    means = jnp.stack([(u - 64) / 60 * z, (v - 48) / 60 * z, z], -1)
    params = GaussianParams(
        means3d=means,
        rgb_colors=jax.random.uniform(ks[3], (n, 3)),
        unnorm_rotations=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        logit_opacities=jax.random.normal(ks[4], (n, 1)),
        log_scales=jax.random.uniform(ks[5], (n, 1), minval=-3.2,
                                      maxval=-2.2),
    )
    return params, jnp.ones((n,), bool)


def _proj(params, active):
    return project_gaussians(params.means3d, params.unnorm_rotations,
                             jnp.exp(params.log_scales), params.opacities(),
                             CAM, active)


def _covering_k(counts_full, mpt_s):
    """Smallest BLOCK multiple covering every tile with count > mpt_s."""
    n_over = int((np.asarray(counts_full) > mpt_s).sum())
    k = max(-(-max(n_over, 1) // BLOCK) * BLOCK, BLOCK)
    assert k < N_TILES, "test camera too small for this k"
    return k


def _full_counts(proj, span_cap=2):
    b = bin_gaussians(proj, 16, span_cap, TX, TY, 8192)
    return np.asarray(b.counts)


class TestBinTwoClass:
    @pytest.mark.parametrize("select", ["depth", "importance"])
    def test_bitexact_tables_when_covering(self, select):
        params, active = scene()
        proj = _proj(params, active)
        mpt, mpt_s = 512, 128
        k = _covering_k(_full_counts(proj), mpt_s)
        one = bin_gaussians(proj, 16, 2, TX, TY, mpt, with_inverse=True,
                            select=select)
        two = bin_two_class(proj, 16, 2, TX, TY, mpt, mpt_s, k, BLOCK,
                            with_inverse=True, select=select)
        counts1 = np.asarray(one.counts)
        tab1 = np.asarray(one.tab)
        # every tile appears in exactly one class, with identical rows
        # (rows past the real count per class are BLOCK padding)
        seen = np.zeros(N_TILES, bool)
        for tab_c, counts_c, tids_c, n_real in (
                (two.tab_d, two.counts_d, two.tids_d, k),
                (two.tab_s, two.counts_s, two.tids_s, N_TILES - k)):
            tab_c, counts_c, tids_c = map(np.asarray,
                                          (tab_c, counts_c, tids_c))
            assert (counts_c[n_real:] == 0).all()          # padding rows
            for row in range(n_real):
                t, c = int(tids_c[row]), int(counts_c[row])
                assert not seen[t]
                seen[t] = True
                assert c == counts1[t], (t, c, counts1[t])
                np.testing.assert_array_equal(tab_c[row, :c], tab1[t, :c])
        assert seen.all()

    def test_inverse_structural_exactness(self):
        params, active = scene(seed=3)
        proj = _proj(params, active)
        mpt, mpt_s, k = 512, 128, BLOCK
        two = bin_two_class(proj, 16, 2, TX, TY, mpt, mpt_s, k, BLOCK,
                            with_inverse=True, select="importance")
        Kp = two.tab_d.shape[0]
        tab_d, tab_s = np.asarray(two.tab_d), np.asarray(two.tab_s)
        cd, cs = np.asarray(two.counts_d), np.asarray(two.counts_s)
        inv = np.asarray(two.inv_pos)
        P_d = Kp * mpt
        hit = np.zeros(P_d + tab_s.size, bool)
        for g in range(inv.shape[0]):
            for pos in inv[g]:
                if pos < 0:
                    continue
                pos = int(pos)
                if pos < P_d:
                    r, j = divmod(pos, mpt)
                    assert j < cd[r] and tab_d[r, j] == g, (g, pos)
                else:
                    r, j = divmod(pos - P_d, mpt_s)
                    assert j < cs[r] and tab_s[r, j] == g, (g, pos)
                assert not hit[pos]
                hit[pos] = True
        # exactly the in-count slots are covered
        jd = np.arange(mpt)[None, :] < cd[:, None]
        js = np.arange(mpt_s)[None, :] < cs[:, None]
        np.testing.assert_array_equal(
            hit, np.concatenate([jd.reshape(-1), js.reshape(-1)]))

    def test_merge_is_a_permutation(self):
        params, active = scene(seed=1)
        proj = _proj(params, active)
        two = bin_two_class(proj, 16, 2, TX, TY, 512, 128, BLOCK, BLOCK)
        merge = np.asarray(two.merge)
        assert merge.shape == (N_TILES,)
        assert len(set(merge.tolist())) == N_TILES  # injective


class TestRenderTwoClass:
    def _caches(self, params, active, mpt, mpt_s, k, select="importance"):
        one = build_kf_cache(params, active, QUAT, TRANS, CAM, span_cap=2,
                             max_pairs_per_tile=mpt, select=select)
        two = build_kf_cache_2c(params, active, QUAT, TRANS, CAM,
                                span_cap=2, max_pairs_per_tile=mpt,
                                mpt_sparse=mpt_s, k_dense=k, select=select)
        return one, two

    def test_render_bitexact_when_covering(self):
        params, active = scene()
        proj = _proj(params, active)
        mpt, mpt_s = 512, 128
        k = _covering_k(_full_counts(proj), mpt_s)
        one, two = self._caches(params, active, mpt, mpt_s, k)
        f8 = pack_fields8(params)
        r1 = render_binned(f8, one, CAM, 128)
        r2 = render_binned_2c(f8, two, CAM, 128, 128)
        # identical per-tile inputs and walk order -> identical fp sums
        np.testing.assert_array_equal(np.asarray(r1.im), np.asarray(r2.im))
        np.testing.assert_array_equal(np.asarray(r1.depth),
                                      np.asarray(r2.depth))
        np.testing.assert_array_equal(np.asarray(r1.silhouette),
                                      np.asarray(r2.silhouette))

    def test_gradients_match_single_class(self):
        params, active = scene(seed=11)
        proj = _proj(params, active)
        mpt, mpt_s = 512, 128
        k = _covering_k(_full_counts(proj), mpt_s)
        one, two = self._caches(params, active, mpt, mpt_s, k)
        f8 = pack_fields8(params)
        w = jax.random.normal(jax.random.PRNGKey(0), (3,) + (CAM.height,
                                                             CAM.width))

        def loss1(v):
            return jnp.sum(render_binned(v, one, CAM, 128).im * w)

        def loss2(v):
            return jnp.sum(render_binned_2c(v, two, CAM, 128, 128).im * w)

        g1 = jax.grad(loss1)(f8)
        g2 = jax.grad(loss2)(f8)
        # same per-tile kernel math; only the s2-column ADD ORDER of the
        # inverse-map gather differs (slot_inverse sorts by position VALUE,
        # which the two flat layouts assign differently) -> fp-roundoff
        # level differences only
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=5e-3, atol=5e-5)
        # mean rows stay zero (kernel "vals" construction)
        assert float(jnp.abs(g2[:, :3]).max()) == 0.0

    def test_undercovered_sparse_truncates_gracefully(self):
        """k_dense too small: sparse tiles saturate at mpt_s with importance
        selection — render must stay finite and close to the full render
        (the measured-harm probe guards the real engine regime)."""
        params, active = scene(seed=5)
        f8 = pack_fields8(params)
        full = render_binned(
            f8, build_kf_cache(params, active, QUAT, TRANS, CAM, span_cap=2,
                               max_pairs_per_tile=2048, select="depth"),
            CAM, 128)
        two = build_kf_cache_2c(params, active, QUAT, TRANS, CAM,
                                span_cap=2, max_pairs_per_tile=512,
                                mpt_sparse=128, k_dense=BLOCK,
                                select="importance")
        assert int(jnp.max(two.counts_s)) == 128  # genuinely saturated
        r = render_binned_2c(f8, two, CAM, 128, 128)
        assert np.isfinite(np.asarray(r.im)).all()
        err = np.abs(np.asarray(r.im) - np.asarray(full.im)).mean()
        assert err < 0.05, err

    def test_probe_measures_two_class_point(self):
        from vtgaussian_slam_tpu.core.map_cache import trunc_probe
        params, active = scene(seed=5)
        h1 = float(trunc_probe(params, active, QUAT, TRANS, CAM, span_cap=2,
                               mpt=512, select="importance"))
        h2 = float(trunc_probe(params, active, QUAT, TRANS, CAM, span_cap=2,
                               mpt=512, select="importance", k_dense=BLOCK,
                               sparse_div=4))
        assert 0.0 <= h1 <= 1.0 and 0.0 <= h2 <= 1.0
        assert h2 >= h1 - 1e-6   # 2C can only truncate more


class TestMapFrameBinnedTwoClass:
    def test_matches_single_class_phase(self):
        """One full mapping phase through a 2C cache stack must reproduce
        the single-class phase bit-for-bit when the dense set covers every
        over-budget tile (same draws, same renders, same Adam steps)."""
        from vtgaussian_slam_tpu.core.losses import LossConfig
        from vtgaussian_slam_tpu.core.map_cache import dummy_global_cache
        from vtgaussian_slam_tpu.core.mapping import (KeyframeBuffer,
                                                      MappingConfig,
                                                      map_frame_binned)

        params, active = scene(n=800, seed=2)
        proj = _proj(params, active)
        mpt, mpt_s = 256, 128
        k = _covering_k(_full_counts(proj), mpt_s)
        f8 = pack_fields8(params)
        del f8
        # one keyframe, identity pose, tiny frame
        key = jax.random.PRNGKey(0)
        colors = jax.random.uniform(key, (1, 3, CAM.height, CAM.width))
        depths = jnp.full((1, 1, CAM.height, CAM.width), 2.5)
        kf = KeyframeBuffer(colors=colors, depths=depths,
                            quats=QUAT[None], trans=TRANS[None],
                            frame_ids=jnp.array([1], jnp.int32),
                            count=jnp.asarray(1, jnp.int32))
        lcfg = LossConfig(
            tracking=False, use_sil_for_loss=False,
            ignore_outlier_depth_loss=False, adaptive_sil=False,
            im_weight=0.5, depth_weight=1.0,
            backend_kwargs=tuple(sorted(
                {"span_cap": 2, "max_pairs_per_tile": mpt, "chunk": 128,
                 "use_pallas": True}.items())))
        mcfg = MappingConfig(
            num_iters=5,
            lrs=(("log_scales", 0.001), ("logit_opacities", 0.05),
                 ("means3D", 0.0), ("rgb_colors", 0.0025),
                 ("unnorm_rotations", 0.0)),
            loss_cfg=lcfg, use_global=False, baseframe_every=8,
            log_global_loss=False)
        rng = jax.random.PRNGKey(42)
        gc = dummy_global_cache(params)

        def stack_of(builder):
            one = builder()
            return jax.tree.map(lambda v: v[None], one)

        c1 = stack_of(lambda: build_kf_cache(
            params, active, QUAT, TRANS, CAM, span_cap=2,
            max_pairs_per_tile=mpt))
        c2 = stack_of(lambda: build_kf_cache_2c(
            params, active, QUAT, TRANS, CAM, span_cap=2,
            max_pairs_per_tile=mpt, mpt_sparse=mpt_s, k_dense=k))
        slot_ids = jnp.zeros((1,), jnp.int32)
        p1, h1 = map_frame_binned(params, kf, c1, slot_ids, gc, rng, CAM,
                                  mcfg)
        p2, h2 = map_frame_binned(params, kf, c2, slot_ids, gc, rng, CAM,
                                  mcfg)
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h1),
                                   rtol=1e-6)
        # gradient fp-order (see test_gradients_match_single_class)
        # compounds through Adam's rsqrt over the iterations
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=2e-5)


class TestTrackCacheTwoClass:
    """Two-class TRACKING cache (track_cache.TrackCache2C): pose-mode
    renders and (dR, dt) gradients must reproduce the single-class cache
    when the dense set covers every over-budget tile."""

    def _caches(self, params, active, mpt, mpt_s, k):
        from vtgaussian_slam_tpu.core.track_cache import (
            build_track_cache, build_track_cache_2c)
        one = build_track_cache(params, active, QUAT, TRANS, CAM,
                                span_cap=2, max_pairs_per_tile=mpt,
                                select="importance")
        two = build_track_cache_2c(params, active, QUAT, TRANS, CAM,
                                   span_cap=2, max_pairs_per_tile=mpt,
                                   mpt_sparse=mpt_s, k_dense=k,
                                   select="importance")
        return one, two

    def test_render_bitexact_when_covering(self):
        from vtgaussian_slam_tpu.core.track_cache import (render_cached,
                                                          render_cached_2c)
        params, active = scene(seed=13)
        proj = _proj(params, active)
        mpt, mpt_s = 512, 128
        k = _covering_k(_full_counts(proj), mpt_s)
        one, two = self._caches(params, active, mpt, mpt_s, k)
        # render at a pose NUDGED off the binning pose (the tracking regime)
        q = jnp.array([0.9998, 0.01, -0.012, 0.008])
        tr = jnp.array([0.004, -0.003, 0.002])
        r1 = render_cached(one, q, tr, CAM, 128)
        r2 = render_cached_2c(two, q, tr, CAM, 128, 128)
        np.testing.assert_array_equal(np.asarray(r1.im), np.asarray(r2.im))
        np.testing.assert_array_equal(np.asarray(r1.depth),
                                      np.asarray(r2.depth))
        np.testing.assert_array_equal(np.asarray(r1.silhouette),
                                      np.asarray(r2.silhouette))

    def test_pose_gradients_match_single_class(self):
        from vtgaussian_slam_tpu.core.track_cache import (render_cached,
                                                          render_cached_2c)
        params, active = scene(seed=17)
        proj = _proj(params, active)
        mpt, mpt_s = 512, 128
        k = _covering_k(_full_counts(proj), mpt_s)
        one, two = self._caches(params, active, mpt, mpt_s, k)
        w = jax.random.normal(jax.random.PRNGKey(1),
                              (3, CAM.height, CAM.width))
        q0 = jnp.array([0.9998, 0.01, -0.012, 0.008])
        t0 = jnp.array([0.004, -0.003, 0.002])

        def l1(q, tr):
            return jnp.sum(render_cached(one, q, tr, CAM, 128).im * w)

        def l2(q, tr):
            return jnp.sum(render_cached_2c(two, q, tr, CAM, 128, 128).im
                           * w)

        gq1, gt1 = jax.grad(l1, argnums=(0, 1))(q0, t0)
        gq2, gt2 = jax.grad(l2, argnums=(0, 1))(q0, t0)
        # identical per-tile kernel reductions; only the cross-tile ADD
        # ORDER of the 12-float pose reduction differs between the class
        # split and the single block sum -> fp-roundoff differences only
        # (measured: ~5e-5 rel on the small quat components, f32 sums
        # over hundreds of tiles)
        np.testing.assert_allclose(np.asarray(gq2), np.asarray(gq1),
                                   rtol=3e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gt2), np.asarray(gt1),
                                   rtol=3e-4, atol=1e-6)

    def test_track_loop_matches_single_class(self):
        """A short fused tracking loop must pick the same best pose through
        either cache (same renders -> same losses -> same Adam steps up to
        fp-roundoff in the pose-grad reduction)."""
        from vtgaussian_slam_tpu.core.losses import Frame, LossConfig
        from vtgaussian_slam_tpu.core.p2p import make_p2p_target
        from vtgaussian_slam_tpu.core.tracking import (TrackingConfig,
                                                       init_track_state,
                                                       track_frame_cached)
        params, active = scene(seed=19)
        proj = _proj(params, active)
        mpt, mpt_s = 512, 128
        k = _covering_k(_full_counts(proj), mpt_s)
        one, two = self._caches(params, active, mpt, mpt_s, k)
        key = jax.random.PRNGKey(2)
        frame = Frame(
            color=jax.random.uniform(key, (3, CAM.height, CAM.width)),
            depth=jnp.full((1, CAM.height, CAM.width), 2.5))
        mask = jnp.ones((CAM.height, CAM.width), bool)
        p2p = make_p2p_target(jnp.zeros((1, 8, 8), jnp.float32),
                              jnp.eye(3), jnp.eye(4))
        lcfg = LossConfig(
            tracking=True, use_sil_for_loss=True,
            ignore_outlier_depth_loss=False, adaptive_sil=False,
            im_weight=0.5, depth_weight=1.0,
            backend_kwargs=tuple(sorted(
                {"span_cap": 2, "max_pairs_per_tile": mpt, "chunk": 128,
                 "use_pallas": True}.items())))
        tcfg = TrackingConfig(num_iters=8, lr_quat=4e-4, lr_trans=2e-3,
                              metric="loss", p2p_method="max100",
                              loss_cfg=lcfg)
        s1, im1, d1 = track_frame_cached(
            one, init_track_state(QUAT, TRANS, 0.95), frame, mask, p2p,
            CAM, tcfg)
        s2, im2, d2 = track_frame_cached(
            two, init_track_state(QUAT, TRANS, 0.95), frame, mask, p2p,
            CAM, tcfg)
        np.testing.assert_allclose(np.asarray(im2), np.asarray(im1),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s2.best_quat),
                                   np.asarray(s1.best_quat),
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(s2.best_trans),
                                   np.asarray(s1.best_trans),
                                   rtol=1e-4, atol=1e-7)


class TestBenchTruncationProbe:
    """bench.measure_truncation must run against BOTH binning modes — it is
    the honesty gate the driver's BENCH json carries, and round 3 shipped a
    never-executed bench path once already."""

    def _run(self, two_class_frac):
        from test_e2e_synthetic import make_config
        from vtgaussian_slam_tpu.core.pipeline import VTGaussianSLAM
        cfg = make_config(num_frames=4, track_iters=4, map_iters=4,
                          motion_scale=0.05)
        if two_class_frac:
            cfg["tpu"]["two_class_frac"] = two_class_frac
        engine = VTGaussianSLAM(cfg)
        engine.run(progress=False)
        return engine

    @pytest.mark.parametrize("frac", [0.0, 0.5])
    def test_measure_truncation(self, frac):
        import bench
        engine = self._run(frac)
        assert (engine._k_dense > 0) == (frac > 0)
        out = bench.measure_truncation(engine)
        assert 0.0 <= out["trunc_tile_frac"] <= 1.0
        assert 0.0 <= out["pixel_diff_frac_vs_4x"] <= 1.0
        assert np.isfinite(out["pixel_diff_max_vs_4x"])
        assert np.isfinite(out["trunc_T_bound_mean"])
        if frac:
            assert out["two_class_k_dense"] == engine._k_dense
            assert out["two_class_mpt_s"] >= 128
        else:
            assert "two_class_k_dense" not in out
