"""Frozen-binning mapping path: inverse-map gradients + binned renders.

Checks the scatter-free mapping machinery (core/map_cache.py,
mapping.map_frame_binned) against the generic autodiff path (map_frame):
identical math, different execution strategy.
"""
import numpy as np
import jax
import jax.numpy as jnp

from vtgaussian_slam_tpu.core.losses import Frame, LossConfig, render_slam
from vtgaussian_slam_tpu.core.map_cache import (build_global_cache,
                                                build_kf_cache, pack_fields8,
                                                render_binned,
                                                render_binned_global)
from vtgaussian_slam_tpu.core.mapping import (KeyframeBuffer, MappingConfig,
                                              map_frame, map_frame_binned)
from vtgaussian_slam_tpu.models.gaussians import GaussianParams
from vtgaussian_slam_tpu.ops.camera import Camera
from vtgaussian_slam_tpu.ops.rasterizer.binning import (bin_gaussians,
                                                        table_gather)
from vtgaussian_slam_tpu.ops.rasterizer.projection import project_gaussians

CAM = Camera(height=48, width=64, fx=60.0, fy=60.0, cx=32.0, cy=24.0)
BK = {"span_cap": 2, "max_pairs_per_tile": 128, "chunk": 128,
      "use_pallas": True}
MPT = 128


def scene(n=200, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    z = jax.random.uniform(ks[0], (n,), minval=1.5, maxval=3.5)
    u = jax.random.uniform(ks[1], (n,), minval=4.0, maxval=60.0)
    v = jax.random.uniform(ks[2], (n,), minval=4.0, maxval=44.0)
    means = jnp.stack([(u - 32) / 60 * z, (v - 24) / 60 * z, z], -1)
    params = GaussianParams(
        means3d=means,
        rgb_colors=jax.random.uniform(ks[3], (n, 3)),
        unnorm_rotations=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        logit_opacities=jax.random.normal(ks[4], (n, 1)),
        log_scales=jax.random.uniform(ks[5], (n, 1), minval=-3.2, maxval=-2.2),
    )
    return params, jnp.ones((n,), bool)


def _bin(params, active, quat, trans):
    from vtgaussian_slam_tpu.ops import geometry as geo
    q = geo.normalize(quat)
    R = geo.quat_to_rotmat(q)
    means_cam = params.means3d @ R.T + trans
    proj = project_gaussians(means_cam, params.unnorm_rotations,
                             jnp.exp(params.log_scales), params.opacities(),
                             CAM, active)
    return bin_gaussians(proj, 16, 2, 4, 3, MPT, with_inverse=True)


class TestTableGather:
    def test_backward_matches_autodiff(self):
        """Inverse-map backward == the scatter-add transpose of the gather,
        for cotangents restricted to in-count slots (the only slots the
        blend kernels ever produce nonzero cotangents for)."""
        params, active = scene(seed=3)
        b = _bin(params, active, jnp.array([1.0, 0, 0, 0]), jnp.zeros(3))
        vals = jax.random.normal(jax.random.PRNGKey(7),
                                 (params.means3d.shape[0], 5))
        w = jax.random.normal(jax.random.PRNGKey(8), (*b.tab.shape, 5))
        j = jnp.arange(MPT)
        mask = (j[None, :] < b.counts[:, None])[..., None]

        def loss_ref(v):
            return jnp.sum(v[b.tab] * w * mask)

        def loss_inv(v):
            return jnp.sum(table_gather(v, b.tab, b.inv_pos) * w * mask)

        g_ref = jax.grad(loss_ref)(vals)
        g_inv = jax.grad(loss_inv)(vals)
        np.testing.assert_allclose(np.asarray(g_inv), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_weighted_inverse_packed_matches_rows(self):
        """The packed 128-wide fast path (C == 8, P % 16 == 0) is bit-exact
        vs the plain row-gather sum it replaces."""
        from vtgaussian_slam_tpu.ops.rasterizer.binning import (
            weighted_inverse)
        ks = jax.random.split(jax.random.PRNGKey(11), 3)
        P, N, s2 = 37 * 16, 300, 4
        flat = jax.random.normal(ks[0], (P, 8), jnp.float32)
        pos = jax.random.randint(ks[1], (N, s2), 0, P)
        w = (jax.random.uniform(ks[2], (N, s2)) < 0.7).astype(jnp.float32)
        got = np.asarray(weighted_inverse(flat, pos, w))
        f, p, ww = (np.asarray(a) for a in (flat, pos, w))
        want = sum(f[p[:, k]] * ww[:, k:k + 1] for k in range(s2))
        np.testing.assert_array_equal(got, want)

    def test_inverse_positions_are_consistent(self):
        """Every non-negative inv_pos entry points at a slot holding its
        own gaussian, within that tile's count."""
        params, active = scene(seed=4)
        b = _bin(params, active, jnp.array([1.0, 0, 0, 0]), jnp.zeros(3))
        inv = np.asarray(b.inv_pos)
        tab = np.asarray(b.tab).reshape(-1)
        counts = np.asarray(b.counts)
        n, s2 = inv.shape
        for g in range(n):
            for s in range(s2):
                p = inv[g, s]
                if p < 0:
                    continue
                assert tab[p] == g, (g, s, p, tab[p])
                t, off = divmod(p, MPT)
                assert off < counts[t]


class TestRenderBinned:
    def test_matches_generic_render(self):
        params, active = scene(seed=5)
        quat = jnp.array([1.0, 0.01, 0.0, 0.0])
        trans = jnp.array([0.02, -0.01, 0.0])
        ref = render_slam(params, active, quat, trans, CAM, BK)
        kfc = build_kf_cache(params, active, quat, trans, CAM, span_cap=2,
                             max_pairs_per_tile=MPT)
        got = render_binned(pack_fields8(params), kfc, CAM)
        # atol covers the kernel's MXU quadratic-form expansion (reordered
        # f32 math vs the generic renderer; see test_track_cache)
        np.testing.assert_allclose(np.asarray(got.im), np.asarray(ref.im),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(got.depth),
                                   np.asarray(ref.depth), atol=5e-5)
        np.testing.assert_allclose(np.asarray(got.silhouette),
                                   np.asarray(ref.silhouette), atol=5e-5)

    def test_wide_walk_chunks_match_128(self):
        """chunk=256/512 walks (two-level lane cumsum, pallas_splat.
        _cumsum_lanes) must reproduce the chunk=128 single-matmul path —
        forward channels AND field gradients — on tiles deep enough to
        cross sub-block boundaries."""
        params, active = scene(n=3000, seed=11)
        # fatter splats -> hundreds of pairs per tile
        params = params.replace(log_scales=params.log_scales + 0.8)
        quat = jnp.array([1.0, 0.02, -0.01, 0.0])
        trans = jnp.array([0.01, 0.02, -0.03])
        kfc = build_kf_cache(params, active, quat, trans, CAM, span_cap=2,
                             max_pairs_per_tile=512)
        assert int(jnp.max(kfc.counts)) > 256, "scene too shallow for test"
        f8 = pack_fields8(params)

        def loss(v8, chunk):
            r = render_binned(v8, kfc, CAM, chunk)
            return (jnp.sum(r.im ** 2) + jnp.sum(r.depth ** 2)
                    + jnp.sum(r.silhouette ** 2))

        outs, grads = {}, {}
        for chunk in (128, 256, 512):
            outs[chunk] = render_binned(f8, kfc, CAM, chunk)
            grads[chunk] = jax.grad(lambda v: loss(v, chunk))(f8)
        for chunk in (256, 512):
            np.testing.assert_allclose(np.asarray(outs[chunk].im),
                                       np.asarray(outs[128].im), atol=2e-5)
            np.testing.assert_allclose(np.asarray(outs[chunk].depth),
                                       np.asarray(outs[128].depth), atol=2e-4)
            np.testing.assert_allclose(np.asarray(grads[chunk]),
                                       np.asarray(grads[128]),
                                       rtol=2e-4, atol=2e-4)

    def test_global_matches_concat_render(self):
        fixed, f_active = scene(n=150, seed=6)
        params, active = scene(n=200, seed=7)
        quat = jnp.array([1.0, 0, 0, 0])
        trans = jnp.zeros(3)
        cat = GaussianParams(
            means3d=jnp.concatenate([fixed.means3d, params.means3d]),
            rgb_colors=jnp.concatenate([fixed.rgb_colors, params.rgb_colors]),
            unnorm_rotations=jnp.concatenate(
                [fixed.unnorm_rotations, params.unnorm_rotations]),
            logit_opacities=jnp.concatenate(
                [fixed.logit_opacities, params.logit_opacities]),
            log_scales=jnp.concatenate([fixed.log_scales, params.log_scales]),
        )
        ref = render_slam(cat, jnp.concatenate([f_active, active]), quat,
                          trans, CAM, BK)
        gc = build_global_cache(fixed, f_active, params, active, quat, trans,
                                CAM, span_cap=2, max_pairs_per_tile=MPT)
        got = render_binned_global(pack_fields8(params), gc, CAM)
        np.testing.assert_allclose(np.asarray(got.im), np.asarray(ref.im),
                                   atol=1e-5)

    def test_global_gradients_flow_to_trainable_only(self):
        fixed, f_active = scene(n=150, seed=8)
        params, active = scene(n=200, seed=9)
        quat = jnp.array([1.0, 0, 0, 0])
        trans = jnp.zeros(3)
        gc = build_global_cache(fixed, f_active, params, active, quat, trans,
                                CAM, span_cap=2, max_pairs_per_tile=MPT)

        def loss_binned(v8):
            return jnp.sum(render_binned_global(v8, gc, CAM).im ** 2)

        def loss_ref(v8):
            # pack_fields8 cols: [means3d(3), logit_op, log_scale, r, g, b]
            cat = GaussianParams(
                means3d=jnp.concatenate([fixed.means3d, params.means3d]),
                rgb_colors=jnp.concatenate([fixed.rgb_colors, v8[:, 5:8]]),
                unnorm_rotations=jnp.concatenate(
                    [fixed.unnorm_rotations, params.unnorm_rotations]),
                logit_opacities=jnp.concatenate(
                    [fixed.logit_opacities, v8[:, 3:4]]),
                log_scales=jnp.concatenate([fixed.log_scales, v8[:, 4:5]]),
            )
            r = render_slam(cat, jnp.concatenate([f_active, active]), quat,
                            trans, CAM, BK)
            return jnp.sum(r.im ** 2)

        v8 = pack_fields8(params)
        g_binned = jax.grad(loss_binned)(v8)
        g_ref = jax.grad(loss_ref)(v8)
        # mean columns carry zero grads by kernel construction in the binned
        # path; the generic path never sees them as inputs — compare the
        # trainable columns
        np.testing.assert_allclose(np.asarray(g_binned[:, 3:8]),
                                   np.asarray(g_ref[:, 3:8]),
                                   rtol=2e-3, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(g_binned[:, 0:3]), 0.0)


def _frames(params, active, poses):
    colors, depths = [], []
    for quat, trans in poses:
        r = render_slam(params, active, quat, trans, CAM, BK)
        colors.append(r.im)
        depths.append(jnp.maximum(r.depth, 0.1))
    return jnp.stack(colors), jnp.stack(depths)


LCFG = LossConfig(tracking=False, use_sil_for_loss=False,
                  ignore_outlier_depth_loss=False, adaptive_sil=False,
                  im_weight=1.0,
                  depth_weight=1.0,
                  backend_kwargs=tuple(sorted(BK.items())))
LRS = (("log_scales", 0.005), ("logit_opacities", 0.05), ("means3D", 0.0),
       ("rgb_colors", 0.0025), ("unnorm_rotations", 0.0))


class TestMapFrameBinned:
    def test_matches_map_frame(self):
        """Binned mapping == the generic per-iteration-rebinning mapping for
        a few steps (means frozen => identical binning up to scale drift)."""
        target, t_active = scene(n=260, seed=10)
        params, active = scene(n=200, seed=11)
        poses = [
            (jnp.array([1.0, 0, 0, 0]), jnp.zeros(3)),
            (jnp.array([1.0, 0.01, 0, 0]), jnp.array([0.03, 0.0, 0.0])),
        ]
        colors, depths = _frames(target, t_active, poses)
        kf = KeyframeBuffer(
            colors=colors, depths=depths,
            quats=jnp.stack([p[0] for p in poses]),
            trans=jnp.stack([p[1] for p in poses]),
            frame_ids=jnp.asarray([1, 2], jnp.int32),
            count=jnp.asarray(2, jnp.int32))
        cfg = MappingConfig(num_iters=6, lrs=LRS, loss_cfg=LCFG,
                            use_global=False, baseframe_every=40)
        rng = jax.random.PRNGKey(0)

        dummy = GaussianParams(
            means3d=jnp.zeros((1, 3)), rgb_colors=jnp.zeros((1, 3)),
            unnorm_rotations=jnp.array([[1.0, 0, 0, 0]]),
            logit_opacities=jnp.zeros((1, 1)), log_scales=jnp.zeros((1, 1)))
        ref_params, ref_hist = map_frame(params, active, dummy,
                                         jnp.zeros((1,), bool), kf, rng, CAM,
                                         cfg)

        caches = [build_kf_cache(params, active, q, t, CAM, span_cap=2,
                                 max_pairs_per_tile=MPT)
                  for q, t in poses]
        kfc = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)
        gcdummy = build_global_cache(dummy, jnp.zeros((1,), bool), params,
                                     active, poses[0][0], poses[0][1], CAM,
                                     span_cap=2, max_pairs_per_tile=MPT)
        got_params, got_hist = map_frame_binned(
            params, kf, kfc, jnp.arange(2, dtype=jnp.int32), gcdummy, rng,
            CAM, cfg)
        np.testing.assert_allclose(np.asarray(got_hist), np.asarray(ref_hist),
                                   rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_params.rgb_colors),
                                   np.asarray(ref_params.rgb_colors),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_params.log_scales),
                                   np.asarray(ref_params.log_scales),
                                   rtol=1e-3, atol=1e-4)
        # frozen channels stay bit-identical
        np.testing.assert_array_equal(np.asarray(got_params.means3d),
                                      np.asarray(params.means3d))

    def test_global_term_matches(self):
        """With use_global on and a base keyframe, the binned loss equals the
        generic path's local+global loss at iteration 0."""
        target, t_active = scene(n=260, seed=12)
        params, active = scene(n=200, seed=13)
        fixed, f_active = scene(n=150, seed=14)
        pose = (jnp.array([1.0, 0, 0, 0]), jnp.zeros(3))
        colors, depths = _frames(target, t_active, [pose])
        kf = KeyframeBuffer(
            colors=colors, depths=depths, quats=pose[0][None],
            trans=pose[1][None],
            frame_ids=jnp.asarray([40], jnp.int32),   # 40 % 40 == 0: base
            count=jnp.asarray(1, jnp.int32))
        cfg = MappingConfig(num_iters=1, lrs=LRS, loss_cfg=LCFG,
                            use_global=True, baseframe_every=40)
        rng = jax.random.PRNGKey(1)
        _, ref_hist = map_frame(params, active, fixed, f_active, kf, rng,
                                CAM, cfg)
        kfc = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[build_kf_cache(params, active, *pose, CAM, span_cap=2,
                             max_pairs_per_tile=MPT)])
        gc = build_global_cache(fixed, f_active, params, active, *pose, CAM,
                                span_cap=2, max_pairs_per_tile=MPT)
        _, got_hist = map_frame_binned(params, kf, kfc,
                                       jnp.zeros((1,), jnp.int32), gc, rng,
                                       CAM, cfg)
        np.testing.assert_allclose(np.asarray(got_hist), np.asarray(ref_hist),
                                   rtol=5e-4)

    def test_skipping_value_only_global_keeps_params_identical(self):
        """log_global_loss=False skips the value-only (iter > 0) global
        renders; trained parameters must be BIT-identical, and only the
        logged hist on base-frame draws after iteration 0 may differ."""
        target, t_active = scene(n=260, seed=12)
        params, active = scene(n=200, seed=13)
        fixed, f_active = scene(n=150, seed=14)
        pose = (jnp.array([1.0, 0, 0, 0]), jnp.zeros(3))
        colors, depths = _frames(target, t_active, [pose])
        kf = KeyframeBuffer(
            colors=colors, depths=depths, quats=pose[0][None],
            trans=pose[1][None],
            frame_ids=jnp.asarray([40], jnp.int32),   # always a base draw
            count=jnp.asarray(1, jnp.int32))
        rng = jax.random.PRNGKey(2)
        kfc = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[build_kf_cache(params, active, *pose, CAM, span_cap=2,
                             max_pairs_per_tile=MPT)])
        gc = build_global_cache(fixed, f_active, params, active, *pose, CAM,
                                span_cap=2, max_pairs_per_tile=MPT)
        outs = {}
        for log in (True, False):
            cfg = MappingConfig(num_iters=4, lrs=LRS, loss_cfg=LCFG,
                                use_global=True, baseframe_every=40,
                                log_global_loss=log)
            outs[log] = map_frame_binned(
                params, kf, kfc, jnp.zeros((1,), jnp.int32), gc, rng,
                CAM, cfg)
        for a, b in zip(jax.tree.leaves(outs[True][0]),
                        jax.tree.leaves(outs[False][0])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        h_log, h_skip = (np.asarray(outs[True][1]),
                         np.asarray(outs[False][1]))
        np.testing.assert_allclose(h_log[0], h_skip[0], rtol=1e-6)
        # hist columns are [total, im, depth]: only the TOTAL carries the
        # skipped value-only global component; im/depth are the local terms
        assert (h_log[1:, 0] > h_skip[1:, 0]).all()
        np.testing.assert_allclose(h_log[1:, 1:], h_skip[1:, 1:], rtol=1e-6)
