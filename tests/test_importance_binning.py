"""Importance pair selection (binning.bin_gaussians select="importance").

Depth-prefix truncation drops a saturated tile's ENTIRE depth tail;
importance selection keeps the top-alpha pairs and restores exact depth
order (see the bin_gaussians docstring and prof_imp.py measurements).
These tests pin:
  1. bit-identical tables/inverse to select="depth" when nothing saturates;
  2. a strictly more faithful render than depth-prefix under saturation;
  3. inverse-map structural exactness (every valid inv entry points at its
     own gaussian's slot; every in-count slot is covered exactly once).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtgaussian_slam_tpu.models.gaussians import GaussianParams
from vtgaussian_slam_tpu.ops.camera import Camera
from vtgaussian_slam_tpu.ops import geometry as geo
from vtgaussian_slam_tpu.ops.rasterizer.binning import bin_gaussians
from vtgaussian_slam_tpu.ops.rasterizer.projection import project_gaussians

CAM = Camera(height=48, width=64, fx=60.0, fy=60.0, cx=32.0, cy=24.0)
TX, TY = 4, 3   # 16px tiles


def projected(n=400, seed=0, spread=1.0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    z = jax.random.uniform(ks[0], (n,), minval=1.5, maxval=3.5)
    u = jax.random.uniform(ks[1], (n,), minval=4.0, maxval=60.0) * spread
    v = jax.random.uniform(ks[2], (n,), minval=4.0, maxval=44.0) * spread
    means = jnp.stack([(u - 32) / 60 * z, (v - 24) / 60 * z, z], -1)
    params = GaussianParams(
        means3d=means,
        rgb_colors=jax.random.uniform(ks[3], (n, 3)),
        unnorm_rotations=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        logit_opacities=jax.random.normal(ks[4], (n, 1)),
        log_scales=jax.random.uniform(ks[5], (n, 1), minval=-3.2,
                                      maxval=-2.2),
    )
    proj = project_gaussians(means, params.unnorm_rotations,
                             jnp.exp(params.log_scales), params.opacities(),
                             CAM, jnp.ones((n,), bool))
    return params, proj


class TestImportanceBinning:
    def test_identical_when_unsaturated(self):
        _, proj = projected()
        big = 2048   # far above any tile's pair count here
        a = bin_gaussians(proj, 16, 3, TX, TY, big, with_inverse=True,
                          select="depth")
        b = bin_gaussians(proj, 16, 3, TX, TY, big, with_inverse=True,
                          select="importance")
        np.testing.assert_array_equal(np.asarray(a.counts),
                                      np.asarray(b.counts))
        counts = np.asarray(a.counts)
        ta, tb = np.asarray(a.tab), np.asarray(b.tab)
        for t in range(ta.shape[0]):
            np.testing.assert_array_equal(ta[t, :counts[t]],
                                          tb[t, :counts[t]])
        np.testing.assert_array_equal(np.asarray(a.inv_pos),
                                      np.asarray(b.inv_pos))

    def test_inverse_map_structural_exactness(self):
        _, proj = projected(seed=3)
        mpt = 128    # force saturation on dense tiles
        b = bin_gaussians(proj, 16, 3, TX, TY, mpt, with_inverse=True,
                          select="importance")
        tab = np.asarray(b.tab)
        counts = np.asarray(b.counts)
        inv = np.asarray(b.inv_pos)                      # (N, s2)
        N = inv.shape[0]
        hit = np.zeros(tab.size, bool)
        for g in range(N):
            for pos in inv[g]:
                if pos < 0:
                    continue
                t, j = divmod(int(pos), mpt)
                assert j < counts[t], (g, pos)
                assert tab[t, j] == g, (g, pos, tab[t, j])
                assert not hit[pos]                      # one pair per slot
                hit[pos] = True
        # every in-count slot is covered by exactly one inverse entry
        j = np.arange(mpt)[None, :]
        in_count = (j < counts[:, None]).reshape(-1)
        np.testing.assert_array_equal(hit, in_count)

    def test_depth_order_preserved_under_saturation(self):
        params, proj = projected(seed=5)
        mpt = 128
        b = bin_gaussians(proj, 16, 3, TX, TY, mpt, select="importance")
        tab = np.asarray(b.tab)
        counts = np.asarray(b.counts)
        depth = np.asarray(proj.depth)
        for t in range(tab.shape[0]):
            d = depth[tab[t, :counts[t]]]
            assert np.all(np.diff(d) >= -1e-4), t   # log-quantized ordering

    def test_more_faithful_than_depth_prefix_when_saturated(self):
        """Render through both selections at a saturating budget and compare
        to the untruncated render: importance must be strictly closer.

        The scene reproduces the trained-SLAM failure regime prof_imp.py
        measured on the real engine state: opaque SURFACE splats sitting
        behind a deep prefix of low-alpha haze. Depth-prefix truncation
        spends the whole budget on the haze and drops the surface; the
        importance select keeps the surface. (On arbitrary random clouds
        the two heuristics can go either way — the engine's bench guards
        the real working set with a measured pixel-diff-vs-4x-budget.)"""
        from vtgaussian_slam_tpu.core.map_cache import (build_kf_cache,
                                                        pack_fields8,
                                                        render_binned)

        params, proj = projected(n=3000, seed=7)
        # front 80% of the depth range: haze (alpha ~ 0.02); the nearest-
        # to-camera 20%... surface = the FARTHEST splats, opaque
        z = params.means3d[:, 2]
        zcut = jnp.quantile(z, 0.8)
        logit = jnp.where(z >= zcut, 3.0, -4.0)[:, None]
        params = params.replace(logit_opacities=logit)
        active = jnp.ones((3000,), bool)
        quat = jnp.array([1.0, 0.0, 0.0, 0.0])
        trans = jnp.zeros((3,))
        f8 = pack_fields8(params)

        def render(mpt, select):
            kfc = build_kf_cache(params, active, quat, trans, CAM,
                                 span_cap=3, max_pairs_per_tile=mpt,
                                 select=select)
            r = render_binned(f8, kfc, CAM, 128)
            return np.asarray(r.im), np.asarray(kfc.counts)

        full, counts_full = render(2048, "depth")
        assert counts_full.max() > 256, "scene not dense enough to saturate"
        im_depth, _ = render(256, "depth")
        im_imp, _ = render(256, "importance")
        err_depth = np.abs(im_depth - full).mean()
        err_imp = np.abs(im_imp - full).mean()
        assert err_imp < 0.5 * err_depth, (err_imp, err_depth)
        # worst-pixel error improves too (the haze is collectively opaque,
        # so NO 256-pair subset is exact — the comparison is relative)
        assert (np.abs(im_imp - full).max()
                < np.abs(im_depth - full).max()), "max err regressed"
