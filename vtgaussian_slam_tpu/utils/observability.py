"""Observability: run logging, per-phase loss reports, progress metrics.

Parity with the reference's wandb plumbing (SURVEY.md 2.24/5: wandb.init at
/root/reference/src/vtgaussian_slam.py:1217-1226, `report_loss`
eval_helpers.py:86-112, `report_progress` :166-303, final stats :2846-2867).
wandb is not installed in this image, so `RunLogger` degrades to a JSONL
event stream under the run directory with the same record names — the data
is preserved even when the dashboard is not.
"""
from __future__ import annotations

import json
import os
import time


class RunLogger:
    """wandb-compatible-ish logger: wandb if importable+enabled, else JSONL."""

    def __init__(self, enabled: bool, project: str = "", group: str = "",
                 name: str = "", entity: str = "", config: dict | None = None,
                 out_dir: str = "."):
        self.enabled = enabled
        self._wandb = None
        self._fh = None
        if not enabled:
            return
        try:
            import wandb
            self._wandb = wandb.init(project=project, entity=entity or None,
                                     group=group, name=name, config=config)
        except Exception:
            os.makedirs(out_dir, exist_ok=True)
            self._fh = open(os.path.join(out_dir, "events.jsonl"), "a")
            self._fh.write(json.dumps(
                {"event": "init", "project": project, "group": group,
                 "name": name, "t": time.time()}) + "\n")

    def log(self, data: dict):
        if not self.enabled:
            return
        if self._wandb is not None:
            self._wandb.log(data)
        elif self._fh is not None:
            self._fh.write(json.dumps(
                {**{k: _jsonable(v) for k, v in data.items()},
                 "t": time.time()}) + "\n")
            self._fh.flush()

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
        if self._fh is not None:
            self._fh.close()


def _jsonable(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


def report_loss(losses: dict, logger: RunLogger, step: int,
                tracking: bool = False, mapping: bool = False) -> int:
    """Per-iteration loss records (reference eval_helpers.py:86-112)."""
    prefix = ("Per Iteration Tracking" if tracking
              else "Per Iteration Mapping" if mapping
              else "Per Iteration Current Frame Optimization")
    logger.log({
        f"{prefix}/Loss": losses.get("loss", 0.0),
        f"{prefix}/Image Loss": losses.get("im", 0.0),
        f"{prefix}/Depth Loss": losses.get("depth", 0.0),
        f"{prefix}/step": step,
    })
    return step + 1


def report_progress(logger: RunLogger, time_idx: int, est_w2c, gt_w2c_list,
                    psnr: float | None = None, depth_rmse: float | None = None):
    """Per-frame pose-error / quality record (reference :166-303):
    relative pose error of the latest frame + running ATE."""
    import numpy as np

    rec = {"Tracking/step": time_idx}
    try:
        gt = np.asarray(gt_w2c_list[time_idx], np.float64)
        est = np.asarray(est_w2c, np.float64)
        # reference (eval_helpers.py:209): distance between the w2c
        # TRANSLATION columns directly, not between camera centers
        rec["Tracking/Latest Pose Error"] = float(
            np.linalg.norm(est[:3, 3] - gt[:3, 3]))
    except Exception:
        pass
    if psnr is not None:
        rec["Tracking/PSNR"] = psnr
    if depth_rmse is not None:
        rec["Tracking/Depth RMSE"] = depth_rmse
    logger.log(rec)


def frame_quality(render, frame, sil_thres: float):
    """Per-frame render quality at the tracked pose (the reference's
    report_progress metrics, eval_helpers.py:216-260): presence/valid-masked
    PSNR, depth RMSE and depth L1. `render` is a core.losses.RenderResult,
    `frame` a core.losses.Frame."""
    import numpy as np

    im = np.clip(np.asarray(render.im), 0, 1)
    gt_im = np.asarray(frame.color)
    depth = np.asarray(render.depth)[0]
    gt_depth = np.asarray(frame.depth)[0]
    sil = np.asarray(render.silhouette)
    presence = sil > sil_thres
    valid = gt_depth > 0
    mask = presence & valid

    # reference formulas (eval_helpers.py:249-260 + calc_psnr): PSNR of the
    # presence-masked images with MSE over ALL pixels; depth errors masked
    # by presence but normalized by the VALID-depth count
    mse = float(((im * presence[None] - gt_im * presence[None]) ** 2).mean())
    psnr = float(-10.0 * np.log10(max(mse, 1e-12)))
    nv = max(int(valid.sum()), 1)
    derr = (depth - gt_depth) * presence * valid
    depth_rmse = float(np.abs(derr).sum() / nv)  # elementwise-sqrt quirk
    depth_l1 = float(np.abs(derr).sum() / nv)
    return psnr, depth_rmse, depth_l1, mask


def save_tracking_loss_viz(path: str, render, frame, sil_thres: float,
                           aux_mask=None, im_hist=None, depth_hist=None,
                           title: str = ""):
    """Tracking-loss debug figure (the reference's `visualize_tracking_loss`
    dump, /root/reference/src/vtgaussian_slam.py:616-675). The reference
    saves one figure per tracking ITERATION from its Python loop; the fused
    TPU loop exposes the same information as one per-FRAME figure at the
    final tracked pose plus the full per-iteration loss curves (documented
    deviation — the curves carry the per-iteration signal the reference's
    frame-by-frame stills do)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    im = np.clip(np.asarray(render.im), 0, 1)
    gt_im = np.asarray(frame.color)
    depth = np.asarray(render.depth)[0]
    gt_depth = np.asarray(frame.depth)[0]
    sil = np.asarray(render.silhouette)
    presence = sil > sil_thres
    mask = presence & (gt_depth > 0)
    if aux_mask is not None:
        mask = mask & np.asarray(aux_mask)
    m3 = mask[None]
    w_im = im * m3
    w_gt_im = gt_im * m3
    w_depth = depth * mask
    w_gt_depth = gt_depth * mask
    diff_rgb = np.abs(w_im - w_gt_im).mean(0)
    diff_depth = np.abs(w_depth - w_gt_depth)
    vmax = float(max(gt_depth.max(), 1e-6))

    fig, ax = plt.subplots(2, 5, figsize=(18, 6))
    panels = [
        (0, 0, gt_im.transpose(1, 2, 0), {}, "GT RGB"),
        (1, 0, w_im.transpose(1, 2, 0), {}, "Weighted Rendered RGB"),
        (0, 1, gt_depth, dict(cmap="jet", vmin=0, vmax=vmax), "GT Depth"),
        (1, 1, w_depth, dict(cmap="jet", vmin=0, vmax=vmax),
         "Weighted Rendered Depth"),
        (0, 2, diff_rgb, dict(cmap="jet", vmin=0, vmax=0.8), "Diff RGB"),
        (1, 2, diff_depth, dict(cmap="jet", vmin=0, vmax=0.8), "Diff Depth"),
        (0, 3, presence, dict(cmap="gray"), "Silhouette Mask"),
        (1, 3, mask, dict(cmap="gray"), "Loss Mask"),
    ]
    for r_, c_, img, kw, name in panels:
        ax[r_, c_].imshow(img, **kw)
        ax[r_, c_].set_title(name, fontsize=9)
        ax[r_, c_].axis("off")
    if im_hist is not None:
        ax[0, 4].plot(np.asarray(im_hist))
        ax[0, 4].set_title("im loss / iter", fontsize=9)
    else:
        ax[0, 4].axis("off")
    if depth_hist is not None:
        ax[1, 4].plot(np.asarray(depth_hist))
        ax[1, 4].set_title("depth loss / iter", fontsize=9)
    else:
        ax[1, 4].axis("off")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=90)
    plt.close(fig)


def save_progress_panel(path: str, render, frame, sil_thres: float,
                        title: str = ""):
    """2x4 qualitative panel (reference plot_rgbd_silhouette,
    eval_helpers.py:115-162): GT/rendered RGB + depth, silhouette, presence
    mask, and L1 diff images, saved as one PNG."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    im = np.clip(np.asarray(render.im), 0, 1).transpose(1, 2, 0)
    gt_im = np.asarray(frame.color).transpose(1, 2, 0)
    depth = np.asarray(render.depth)[0]
    gt_depth = np.asarray(frame.depth)[0]
    sil = np.asarray(render.silhouette)
    presence = sil > sil_thres
    vmax = float(max(gt_depth.max(), 1e-6))
    rgb_diff = np.abs(im - gt_im).mean(-1)
    depth_diff = np.abs(depth - gt_depth) * (gt_depth > 0)

    fig, ax = plt.subplots(2, 4, figsize=(14, 6))
    panels = [
        (gt_im, None, "GT RGB"),
        (gt_depth, dict(cmap="jet", vmin=0, vmax=vmax), "GT Depth"),
        (sil, dict(cmap="gray", vmin=0, vmax=1), "Silhouette"),
        (rgb_diff, dict(cmap="jet", vmin=0, vmax=0.2), "RGB L1 Diff"),
        (im, None, "Rendered RGB"),
        (depth, dict(cmap="jet", vmin=0, vmax=vmax), "Rendered Depth"),
        (presence, dict(cmap="gray", vmin=0, vmax=1), "Presence Mask"),
        (depth_diff, dict(cmap="jet", vmin=0, vmax=0.3), "Depth L1 Diff"),
    ]
    for a, (img, kw, name) in zip(ax.ravel(), panels):
        a.imshow(img, **(kw or {}))
        a.set_title(name, fontsize=9)
        a.axis("off")
    if title:
        fig.suptitle(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=90)
    plt.close(fig)
