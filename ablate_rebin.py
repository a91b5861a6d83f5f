"""High-motion tracking-rebin ablation (VERDICT round-2 item 2).

The frozen-binning tracking cache (core/track_cache.py) is exact only near
its build pose; `tpu.track_rebin_every = k` rebins at the current pose every
k fused iterations to bound staleness under large per-frame motion. This
script runs the `medium` synthetic scene at motion_scale 0.2 (~8.6 cm +
~2 deg per frame — 4-8x harsher than Replica/TUM; the known round-1 failure
regime, see ROADMAP.md) with rebinning off vs on and reports ATE RMSE and
mean PSNR for each. Results land in ROADMAP.md's ablation table.

Usage: python ablate_rebin.py [--frames 60] [--rebin 10]
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys
from importlib.machinery import SourceFileLoader

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from vtgaussian_slam_tpu.utils.runtime import setup_jax

setup_jax()

import numpy as np


def run_one(base_config: dict, rebin: int, frames: int) -> dict:
    from vtgaussian_slam_tpu.core.pipeline import rgbd_slam
    from vtgaussian_slam_tpu.eval.evaluate import eval_sequence
    from vtgaussian_slam_tpu.utils.common import seed_everything

    config = copy.deepcopy(base_config)
    config["data"]["synthetic"]["motion_scale"] = 0.2
    config["data"]["synthetic"]["num_frames"] = frames
    config["tpu"]["track_rebin_every"] = rebin
    config["workdir"] = "/tmp/vtgs_ablate"
    config["run_name"] = f"rebin{rebin}"
    seed_everything(config["seed"])

    engine = rgbd_slam(config)
    eval_dir = os.path.join(config["workdir"], config["run_name"], "eval")
    res = eval_sequence(
        engine.dataset, engine.export_params_ls(), engine.num_frames,
        eval_dir, sil_thres=config["mapping"]["sil_thres"],
        mapping_iters=config["mapping"]["num_iters"],
        eval_every=1, baseframe_every=config["baseframe_every"],
        save_frames=False, backend_kwargs=dict(engine.backend_kwargs))
    res["tracking_s_per_frame"] = engine.final_stats()["avg_tracking_frame_s"]
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--rebin", type=int, default=10)
    args = ap.parse_args()

    experiment = SourceFileLoader(
        "medium", os.path.join(_REPO, "configs/synthetic/medium.py")
    ).load_module()
    from vtgaussian_slam_tpu.core.config import prepare_config
    base = prepare_config(experiment.config)

    rows = {}
    for rebin in (0, args.rebin):
        print(f"\n=== track_rebin_every={rebin} ===", flush=True)
        rows[rebin] = run_one(base, rebin, args.frames)
        print(json.dumps({k: (round(float(v), 4) if isinstance(v, (int, float))
                              and np.isfinite(v) else None)
                          for k, v in rows[rebin].items()}), flush=True)

    print("\n| track_rebin_every | ATE RMSE (cm) | PSNR (dB) | "
          "depth L1 (cm) | track s/frame |")
    print("|---|---|---|---|---|")
    for rebin, r in rows.items():
        print(f"| {rebin} | {100 * r.get('ate_rmse', float('nan')):.2f} | "
              f"{r.get('psnr', float('nan')):.2f} | "
              f"{100 * r.get('depth_l1', float('nan')):.2f} | "
              f"{r.get('tracking_s_per_frame', float('nan')):.2f} |")


if __name__ == "__main__":
    main()
