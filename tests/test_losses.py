"""Loss-engine mask/reduction semantics (reference get_loss parity)."""
import numpy as np
import jax
import jax.numpy as jnp

from vtgaussian_slam_tpu.core.losses import (SIL_THRES_CANDIDATES, Frame,
                                             LossConfig, RenderResult,
                                             loss_from_render)


def make_render(H=8, W=8, sil=1.0, depth=2.0, im=0.5):
    return RenderResult(
        im=jnp.full((3, H, W), im),
        depth=jnp.full((1, H, W), depth),
        silhouette=jnp.full((H, W), sil),
        depth_sq=jnp.full((1, H, W), depth * depth),
        radii=jnp.ones((4,)),
    )


def make_frame(H=8, W=8, depth=2.0, im=0.5):
    return Frame(color=jnp.full((3, H, W), im),
                 depth=jnp.full((1, H, W), depth))


def cfg(**kw):
    base = dict(tracking=True, use_sil_for_loss=True,
                ignore_outlier_depth_loss=False, adaptive_sil=False,
                im_weight=1.0,
                depth_weight=1.0, backend_kwargs=())
    base.update(kw)
    return LossConfig(**base)


class TestTrackingMasks:
    def test_perfect_fit_zero_loss(self):
        out = loss_from_render(make_render(), make_frame(), cfg(),
                               jnp.asarray(0.5), jnp.asarray(False))
        assert float(out.loss) == 0.0

    def test_sum_reduction(self):
        r = make_render(depth=2.1, im=0.6)
        out = loss_from_render(r, make_frame(), cfg(),
                               jnp.asarray(0.5), jnp.asarray(False))
        # depth: sum over 64 px of 0.1; im: sum over 3*64 of 0.1
        np.testing.assert_allclose(float(out.depth_loss), 64 * 0.1, rtol=1e-4)
        np.testing.assert_allclose(float(out.im_loss), 192 * 0.1, rtol=1e-4)

    def test_silhouette_mask_excludes(self):
        r = make_render(sil=0.3, depth=2.1)
        out = loss_from_render(r, make_frame(), cfg(),
                               jnp.asarray(0.5), jnp.asarray(False))
        assert float(out.loss) == 0.0  # sil < thres everywhere -> empty mask

    def test_invalid_gt_depth_excluded(self):
        r = make_render(depth=2.1)
        f = make_frame(depth=0.0)  # all invalid
        out = loss_from_render(r, f, cfg(use_sil_for_loss=False),
                               jnp.asarray(0.5), jnp.asarray(False))
        assert float(out.depth_loss) == 0.0
        # without sil/outlier masking the color term is UNMASKED sum (:604-605)
        assert float(out.im_loss) == 0.0  # im identical anyway

    def test_outlier_median_mask(self):
        H = W = 8
        r = make_render(H, W, depth=2.0)
        gt_depth = jnp.full((1, H, W), 2.05).at[0, 0, 0].set(9.0)  # outlier
        f = Frame(color=jnp.full((3, H, W), 0.5), depth=gt_depth)
        out = loss_from_render(
            r, f, cfg(use_sil_for_loss=False, ignore_outlier_depth_loss=True),
            jnp.asarray(0.5), jnp.asarray(False))
        # outlier pixel err=7.0 > 50 * median(0.05): excluded
        np.testing.assert_allclose(float(out.depth_loss), 63 * 0.05, rtol=1e-3)

    def test_aux_mask(self):
        H = W = 8
        r = make_render(H, W, depth=2.1)
        aux = jnp.zeros((H, W), bool).at[:4].set(True)
        out = loss_from_render(r, make_frame(), cfg(),
                               jnp.asarray(0.5), jnp.asarray(False), aux)
        np.testing.assert_allclose(float(out.depth_loss), 32 * 0.1, rtol=1e-4)


class TestAdaptiveSilThreshold:
    def test_picks_min_mse_threshold(self):
        H = W = 8
        # silhouette 0.994 in a region rendered WRONG; 0.9995 where correct.
        sil = jnp.full((H, W), 0.9995).at[:4].set(0.994)
        im = jnp.full((3, H, W), 0.5).at[:, :4].set(0.9)  # wrong region
        r = RenderResult(im=im, depth=jnp.full((1, H, W), 2.0),
                         silhouette=sil, depth_sq=jnp.full((1, H, W), 4.0),
                         radii=jnp.ones((4,)))
        out = loss_from_render(r, make_frame(H, W), cfg(adaptive_sil=True),
                               jnp.asarray(0.99), jnp.asarray(True))
        # thresholds > 0.994 exclude the wrong region -> lower mse -> chosen
        assert float(out.sil_thres_out) >= 0.995
        # and at later iterations the carried threshold is reused
        out2 = loss_from_render(r, make_frame(H, W), cfg(adaptive_sil=True),
                                jnp.asarray(0.993), jnp.asarray(False))
        np.testing.assert_allclose(float(out2.sil_thres_out), 0.993)

    def test_candidates_match_reference(self):
        assert SIL_THRES_CANDIDATES == (0.990, 0.993, 0.995, 0.997, 0.999)


class TestMappingLoss:
    def test_mean_depth_and_ssim_color(self):
        H = W = 32
        r = make_render(H, W, depth=2.2, im=0.5)
        f = make_frame(H, W, depth=2.0, im=0.5)
        out = loss_from_render(r, f, cfg(tracking=False, use_sil_for_loss=False),
                               jnp.asarray(0.5), jnp.asarray(False))
        np.testing.assert_allclose(float(out.depth_loss), 0.2, rtol=1e-4)
        # identical constant images: L1=0 and SSIM=1 -> im term 0
        np.testing.assert_allclose(float(out.im_loss), 0.0, atol=1e-5)

    def test_mapping_color_mix(self):
        H = W = 32
        r = make_render(H, W, im=0.6)
        f = make_frame(H, W, im=0.4)
        out = loss_from_render(r, f, cfg(tracking=False, use_sil_for_loss=False),
                               jnp.asarray(0.5), jnp.asarray(False))
        # 0.8 * L1(0.2) + 0.2 * (1 - ssim); constant fields: ssim ~ luminance
        # term < 1, so loss > 0.8*0.2
        assert float(out.im_loss) >= 0.8 * 0.2 - 1e-5
