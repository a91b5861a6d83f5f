"""Sequence evaluation: render each frame from its section, score metrics.

Parity with `eval` (/root/reference/utils/eval_helpers.py:339-602): per
`eval_every` frame pick the frame's section params, render RGB and
depth/silhouette at the estimated pose, compute valid-depth-masked PSNR,
MS-SSIM, LPIPS (optional — see lpips.py), depth L1/RMSE; finally ATE RMSE of
the full trajectory with Horn alignment, metric .txt dumps, and optional
rendered-frame PNG export.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..ops.camera import setup_camera
from ..ops import geometry as geo
from ..ops.ssim import ms_ssim
from ..core.losses import render_slam
from .metrics import calc_psnr, evaluate_ate


def eval_sequence(
    dataset,
    params_ls: list[dict],
    num_frames: int,
    eval_dir: str,
    sil_thres: float = 0.5,
    mapping_iters: int = 1,
    add_new_gaussians: bool = True,
    eval_every: int = 1,
    baseframe_every: int = 40,
    save_frames: bool = False,
    lpips_fn=None,
    backend_kwargs: dict | None = None,
) -> dict:
    os.makedirs(eval_dir, exist_ok=True)
    psnr_list, rmse_list, l1_list, ssim_list, lpips_list = [], [], [], [], []

    sections = []
    traj = None
    for p in params_ls:
        sec, tr = G.section_from_numpy_params(p)
        sections.append(sec)
        traj = tr  # reference uses the LAST section's trajectory (:525-541)

    if backend_kwargs is None:
        # Pallas blend on accelerators, XLA blend on CPU
        backend_kwargs = {"use_pallas": jax.default_backend() != "cpu",
                          "max_pairs_per_tile": 512}
    render_fn = jax.jit(
        lambda prm, act, q, t, cam: render_slam(prm, act, q, t, cam,
                                                backend_kwargs),
        static_argnames=("cam",))

    gt_w2c_list = []
    first_frame_w2c = None
    cam = None
    if save_frames:
        for sub in ("rendered_rgb", "rendered_depth", "rgb", "depth"):
            os.makedirs(os.path.join(eval_dir, sub), exist_ok=True)

    for t in range(num_frames):
        color, depth, intrinsics, pose = dataset[t]
        gt_w2c = np.linalg.inv(np.asarray(pose, np.float64))
        gt_w2c_list.append(gt_w2c)
        if t == 0:
            first_frame_w2c = gt_w2c
            K = np.asarray(intrinsics)[:3, :3]
            cam = setup_camera(color.shape[1], color.shape[0], K)
        if t != 0 and t % eval_every != 0:
            continue

        sec = sections[min(t // baseframe_every, len(sections) - 1)]
        q, tr = traj.quats[t], traj.trans[t]
        r = render_fn(sec.params, sec.active_mask(), q, tr, cam)

        gt_im = np.transpose(color, (2, 0, 1)) / 255.0
        gt_depth = np.transpose(depth, (2, 0, 1))
        valid = (gt_depth > 0)

        im = np.asarray(r.im)
        rastered_depth = np.asarray(r.depth) * valid
        presence = np.asarray(r.silhouette) > sil_thres

        if mapping_iters == 0 and not add_new_gaussians:
            w_im = im * presence * valid
            w_gt = gt_im * presence * valid
        else:
            w_im = im * valid
            w_gt = gt_im * valid
        psnr_list.append(float(calc_psnr(w_im, w_gt).mean()))
        ssim_list.append(float(ms_ssim(jnp.asarray(w_im, jnp.float32),
                                       jnp.asarray(w_gt, jnp.float32))))
        if lpips_fn is not None:
            lpips_list.append(float(lpips_fn(np.clip(w_im, 0, 1),
                                             np.clip(w_gt, 0, 1))))

        diff = rastered_depth - gt_depth
        if mapping_iters == 0 and not add_new_gaussians:
            diff = diff * presence
        vsum = max(valid.sum(), 1)
        rmse_list.append(float((np.sqrt(diff**2) * valid).sum() / vsum))
        l1_list.append(float((np.abs(diff) * valid).sum() / vsum))

        if save_frames:
            _save_frame_pngs(eval_dir, t, im, np.asarray(r.depth), gt_im,
                             gt_depth)

    # trajectory metric
    try:
        T = traj.quats.shape[0]
        est, gts = [first_frame_w2c], [gt_w2c_list[0]]
        for idx in range(1, min(T, len(gt_w2c_list))):
            g = gt_w2c_list[idx]
            if np.isnan(g).any() or np.isinf(g).any():
                continue
            w2c = np.asarray(geo.pose_to_w2c(
                geo.normalize(traj.quats[idx]), traj.trans[idx]))
            est.append(w2c)
            gts.append(g)
        ate_rmse = evaluate_ate([np.linalg.inv(x) for x in gts],
                                [np.linalg.inv(np.asarray(x, np.float64))
                                 for x in est])
    except Exception:
        ate_rmse = 100.0
        print("Failed to evaluate trajectory with alignment.")

    results = {
        "psnr": float(np.mean(psnr_list)) if psnr_list else float("nan"),
        "depth_rmse": float(np.mean(rmse_list)) if rmse_list else float("nan"),
        "depth_l1": float(np.mean(l1_list)) if l1_list else float("nan"),
        "ms_ssim": float(np.mean(ssim_list)) if ssim_list else float("nan"),
        "lpips": float(np.mean(lpips_list)) if lpips_list else float("nan"),
        "ate_rmse": ate_rmse,
    }
    for name, arr in (("psnr", psnr_list), ("rmse", rmse_list),
                      ("l1", l1_list), ("ssim", ssim_list),
                      ("lpips", lpips_list)):
        np.savetxt(os.path.join(eval_dir, f"{name}.txt"), np.array(arr))
    _plot_metrics(eval_dir, psnr_list, l1_list, results["psnr"],
                  results["depth_l1"], ate_rmse)
    print(f"Average PSNR: {results['psnr']:.2f}")
    print(f"Average Depth RMSE: {results['depth_rmse'] * 100:.2f} cm")
    print(f"Average Depth L1: {results['depth_l1'] * 100:.2f} cm")
    print(f"Average MS-SSIM: {results['ms_ssim']:.3f}")
    print(f"Final Average ATE RMSE: {ate_rmse * 100:.2f} cm")
    return results


def _plot_metrics(eval_dir, psnr_list, l1_list, avg_psnr, avg_l1, ate_rmse):
    """PSNR/Depth-L1 line plots -> metrics.png (reference :588-599)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    fig, axs = plt.subplots(1, 2, figsize=(12, 4))
    axs[0].plot(np.arange(len(psnr_list)), psnr_list)
    axs[0].set_title("RGB PSNR")
    axs[0].set_xlabel("Time Step")
    axs[0].set_ylabel("PSNR")
    axs[1].plot(np.arange(len(l1_list)), np.array(l1_list) * 100)
    axs[1].set_title("Depth L1")
    axs[1].set_xlabel("Time Step")
    axs[1].set_ylabel("L1 (cm)")
    fig.suptitle(
        f"Average PSNR: {avg_psnr:.2f}, Average Depth L1: "
        f"{avg_l1 * 100:.2f} cm, ATE RMSE: {ate_rmse * 100:.2f} cm",
        y=1.05, fontsize=16)
    plt.savefig(os.path.join(eval_dir, "metrics.png"), bbox_inches="tight")
    plt.close()


def _save_frame_pngs(eval_dir, t, im, depth, gt_im, gt_depth):
    try:
        import cv2
    except ImportError:
        return
    vmin, vmax = 0, 6

    def depth_png(d):
        norm = np.clip((d[0] - vmin) / (vmax - vmin), 0, 1)
        return cv2.applyColorMap((norm * 255).astype(np.uint8),
                                 cv2.COLORMAP_JET)

    def rgb_png(x):
        arr = np.clip(np.transpose(x, (1, 2, 0)), 0, 1) * 255
        return cv2.cvtColor(arr.astype(np.uint8), cv2.COLOR_RGB2BGR)

    cv2.imwrite(os.path.join(eval_dir, "rendered_rgb", f"gs_{t:04d}.png"),
                rgb_png(im))
    cv2.imwrite(os.path.join(eval_dir, "rendered_depth", f"gs_{t:04d}.png"),
                depth_png(depth))
    cv2.imwrite(os.path.join(eval_dir, "rgb", f"gt_{t:04d}.png"),
                rgb_png(gt_im))
    cv2.imwrite(os.path.join(eval_dir, "depth", f"gt_{t:04d}.png"),
                depth_png(gt_depth))
