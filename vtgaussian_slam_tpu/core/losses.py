"""Loss engine: fused render + masked photometric/depth losses.

TPU redesign of `get_loss` (/root/reference/src/vtgaussian_slam.py:407-689).
Key structural change: the reference renders twice per loss (RGB pass +
depth/silhouette pass) over identical geometry; here ONE 6-channel render
produces (r, g, b, z, 1, z^2), halving rasterizer work (SURVEY.md section 6,
hard part 5). Channels 3..5 blend to (depth, silhouette, E[z^2]) exactly like
the reference's `transformed_params2depthplussilhouette` trick
(/root/reference/utils/slam_helpers.py:217-234).

All data-dependent choices (adaptive silhouette threshold, outlier median)
stay inside jit as tensor ops; no host syncs per iteration.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..models.gaussians import GaussianParams
from ..ops import geometry as geo
from ..ops.camera import Camera
from ..ops.rasterizer import render_tiled
from ..ops.ssim import ssim

# Replica adaptive silhouette-threshold candidates
# (/root/reference/src/vtgaussian_slam.py:476-507)
SIL_THRES_CANDIDATES = (0.990, 0.993, 0.995, 0.997, 0.999)


@struct.dataclass
class Frame:
    """Device-staged RGB-D frame: color (3,H,W) in [0,1], depth (1,H,W)."""
    color: jnp.ndarray
    depth: jnp.ndarray


class LossConfig(NamedTuple):
    """Static (compile-time) loss configuration."""
    tracking: bool
    use_sil_for_loss: bool
    ignore_outlier_depth_loss: bool
    adaptive_sil: bool          # replica tracking: pick threshold at iter 0
    im_weight: float
    depth_weight: float
    backend_kwargs: tuple = ()  # extra kwargs for render_tiled, as sorted items
    # NOTE: visibility/far-depth masks arrive pre-AND'ed via aux_mask and
    # isotropy is carried by the params' shapes — they are deliberately NOT
    # static fields here (every distinct static field value is a separate
    # jit compile of the fused tracking/mapping loops)


class RenderResult(NamedTuple):
    im: jnp.ndarray        # (3, H, W)
    depth: jnp.ndarray     # (1, H, W)
    silhouette: jnp.ndarray  # (H, W)
    depth_sq: jnp.ndarray  # (1, H, W)
    radii: jnp.ndarray     # (N,)


def render_slam(
    params: GaussianParams,
    active: jnp.ndarray,
    cam_quat: jnp.ndarray,   # (4,) unnormalized w2c rotation for this frame
    cam_trans: jnp.ndarray,  # (3,)
    cam: Camera,
    backend_kwargs: dict | None = None,
) -> RenderResult:
    """Fused RGB + depth/silhouette render at a camera pose.

    World->camera transform of means (and of rotations when anisotropic)
    mirrors `transform_to_frame` (/root/reference/utils/slam_helpers.py:323-385);
    gradient routing is by construction: jax differentiates w.r.t. whichever
    of (params, cam_quat, cam_trans) the caller requests.
    """
    q = geo.normalize(cam_quat)
    R = geo.quat_to_rotmat(q)
    means_cam = params.means3d @ R.T + cam_trans

    if params.isotropic:
        quats = params.unnorm_rotations
    else:
        quats = geo.quat_mult(q[None, :], geo.normalize(params.unnorm_rotations))

    z = means_cam[:, 2]
    colors6 = jnp.concatenate(
        [params.rgb_colors, jnp.stack([z, jnp.ones_like(z), z * z], -1)], axis=1)

    # pass raw (N,1)|(N,3) scales: projection takes the isotropic fast path
    # (no rotation math) when scales are (N,1)
    img6, radii = render_tiled(
        means_cam, quats, jnp.exp(params.log_scales), params.opacities(),
        colors6, cam, active, **(backend_kwargs or {}))
    return RenderResult(
        im=img6[:3],
        depth=img6[3:4],
        silhouette=img6[4],
        depth_sq=img6[5:6],
        radii=radii,
    )


class LossOutput(NamedTuple):
    loss: jnp.ndarray
    im_loss: jnp.ndarray
    depth_loss: jnp.ndarray
    sil_thres_out: jnp.ndarray  # chosen/propagated silhouette threshold
    seen: jnp.ndarray           # (N,) radii > 0
    radii: jnp.ndarray


def compute_loss(
    params: GaussianParams,
    active: jnp.ndarray,
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    frame: Frame,
    cam: Camera,
    cfg: LossConfig,
    sil_thres: jnp.ndarray,       # scalar; ignored at adaptive iter 0
    is_first_iter: jnp.ndarray,   # scalar bool (adaptive threshold trigger)
    aux_mask: jnp.ndarray | None = None,  # (H, W) vis/far mask, pre-AND'ed
) -> LossOutput:
    """Weighted masked losses for one frame at one pose (generic renderer)."""
    r = render_slam(params, active, cam_quat, cam_trans, cam,
                    dict(cfg.backend_kwargs))
    return loss_from_render(r, frame, cfg, sil_thres, is_first_iter, aux_mask)


def loss_from_render(
    r: RenderResult,
    frame: Frame,
    cfg: LossConfig,
    sil_thres: jnp.ndarray,
    is_first_iter: jnp.ndarray,
    aux_mask: jnp.ndarray | None = None,
) -> LossOutput:
    """Weighted masked losses given a render.

    Mask semantics (/root/reference/src/vtgaussian_slam.py:472-608):
      valid   = gt depth > 0 (and not NaN)
      outlier = depth_error < 50 * median(depth_error)  [if enabled]
      sil     = silhouette > threshold                  [tracking only]
      aux     = visibility AND far-depth filter         [as precomputed]
    Tracking losses are SUM-reduced; mapping depth is mean L1 and mapping
    color is 0.8*L1 + 0.2*(1 - SSIM).
    """
    gt_im, gt_depth = frame.color, frame.depth

    uncertainty = jax.lax.stop_gradient(r.depth_sq - r.depth * r.depth)
    nan_mask = (~jnp.isnan(r.depth)) & (~jnp.isnan(uncertainty))
    valid = gt_depth > 0

    if cfg.ignore_outlier_depth_loss:
        # where (not *mask): a NaN render pixel excluded by nan_mask must
        # not poison the median/loss (NaN * 0 == NaN)
        depth_error = jnp.where(valid & nan_mask,
                                jnp.abs(gt_depth - r.depth), 0.0)
        # torch.median returns the LOWER middle element for even-sized
        # inputs (H*W is even at every supported resolution); jnp.median
        # would interpolate and shift the 50x threshold
        mask = (depth_error < 50 * jnp.quantile(
            depth_error, 0.5, method="lower")) & valid
    else:
        mask = valid
    mask = mask & nan_mask

    sil_thres_out = sil_thres
    if cfg.tracking and cfg.use_sil_for_loss:
        if cfg.adaptive_sil:
            # try all candidates, keep the min-color-MSE one at iteration 0;
            # under lax.cond the candidate sweep only actually executes on
            # that first iteration
            def pick_thres(_):
                cands = jnp.asarray(SIL_THRES_CANDIDATES, gt_im.dtype)
                sq = jax.lax.stop_gradient((gt_im - r.im) ** 2)  # (3, H, W)
                sil = jax.lax.stop_gradient(r.silhouette)

                def masked_mse(th):
                    m = (sil > th) & (gt_depth[0] > 0)
                    msum = jnp.sum(m) * 3
                    mse = jnp.sum(jnp.where(m[None], sq, 0.0)) / \
                        jnp.maximum(msum, 1)
                    # a threshold covering ZERO pixels must not win the
                    # argmin with its vacuous 0 MSE (it would empty the
                    # presence mask and freeze tracking at the init pose)
                    return jnp.where(msum > 0, mse, jnp.inf)

                mses = jax.vmap(masked_mse)(cands)
                return cands[jnp.argmin(mses)]

            sil_thres_out = jax.lax.cond(
                is_first_iter, pick_thres, lambda _: sil_thres, None)
        presence = r.silhouette > sil_thres_out
        mask = mask & presence[None]

    if aux_mask is not None:
        mask = mask & aux_mask[None]

    mask = jax.lax.stop_gradient(mask)

    # masked diffs go through where BEFORE abs so (a) NaN pixels excluded by
    # nan_mask cannot poison the sum (NaN * 0 == NaN), and (b) the backward
    # stays NaN-free (the double-where pattern: cotangents of masked-out
    # pixels are exactly zero before reaching sign(NaN))
    ddiff = jnp.where(mask, gt_depth - r.depth, 0.0)
    if cfg.tracking:
        depth_loss = jnp.sum(jnp.abs(ddiff))
        if cfg.use_sil_for_loss or cfg.ignore_outlier_depth_loss:
            im_loss = jnp.sum(jnp.abs(jnp.where(mask, gt_im - r.im, 0.0)))
        else:
            im_loss = jnp.sum(jnp.abs(gt_im - r.im))
    else:
        depth_loss = jnp.sum(jnp.abs(ddiff)) / jnp.maximum(
            jnp.sum(mask), 1)
        im_loss = 0.8 * jnp.mean(jnp.abs(r.im - gt_im)) + 0.2 * (
            1.0 - ssim(r.im, gt_im))

    loss = cfg.im_weight * im_loss + cfg.depth_weight * depth_loss
    return LossOutput(
        loss=loss,
        im_loss=im_loss,
        depth_loss=depth_loss,
        sil_thres_out=sil_thres_out,
        seen=r.radii > 0,
        radii=r.radii,
    )
