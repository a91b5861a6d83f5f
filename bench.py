"""Benchmark: combined tracking+mapping iterations/sec (BASELINE.json).

North star (/root/repo/BASELINE.json): >= 25 combined track+map iters/sec on
Replica room0 (680x1200, 60 tracking + 100 mapping iters per frame) on one
TPU v5e chip. No Replica data ships in this image, so the bench drives the
REAL pipeline jits (track_frame / map_frame with full iteration loops) on a
procedurally generated scene at Replica room0's exact resolution, iteration
budgets, and representative Gaussian count.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vtgaussian_slam_tpu.utils.runtime import setup_jax

setup_jax()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vtgaussian_slam_tpu.core.losses import Frame, LossConfig
    from vtgaussian_slam_tpu.core.mapping import (KeyframeBuffer,
                                                  MappingConfig)
    from vtgaussian_slam_tpu.core.p2p import make_p2p_target
    from vtgaussian_slam_tpu.core.tracking import (TrackingConfig,
                                                   init_track_state,
                                                   track_frame)
    from vtgaussian_slam_tpu.datasets.synthetic import SyntheticRoomDataset
    from vtgaussian_slam_tpu.models import gaussians as G
    from vtgaussian_slam_tpu.ops.camera import setup_camera

    H, W = 680, 1200              # Replica room0 resolution
    TRACK_ITERS = 60              # configs/replica/room0.py:62
    MAP_ITERS = 100               # configs/replica/room0.py:89
    N_FRAMES = 3                  # timed frames (after compile warmup)
    BASELINE_ITERS_PER_SEC = 25.0

    backend = dict(span_cap=2, max_pairs_per_tile=512, chunk=128,
                   use_pallas=True)
    bk = tuple(sorted(backend.items()))
    bk_map = bk  # mapping keeps the full depth-list budget: truncation
    # below ~512 visibly breaks silhouette convergence on unconverged maps

    ds = SyntheticRoomDataset(num_frames=N_FRAMES + 2, height=H, width=W,
                              seed=0, motion_scale=0.05)
    cam = setup_camera(W, H, ds.scaled_intrinsics()[:3, :3])

    def stage(t):
        color, depth, _, pose = ds[t]
        return (Frame(color=jnp.asarray(np.transpose(color, (2, 0, 1)) / 255.0,
                                        jnp.float32),
                      depth=jnp.asarray(np.transpose(depth, (2, 0, 1)),
                                        jnp.float32)),
                np.linalg.inv(np.asarray(pose, np.float64)))

    # section initialized from frame 0 (real init path: one Gaussian per
    # valid pixel, the reference's working set for early frames)
    frame0, w2c0 = stage(0)
    from vtgaussian_slam_tpu.core.densify import first_frame_pointcloud
    pts, cols, msq, keep = first_frame_pointcloud(frame0, cam)
    n = int(jnp.sum(keep))
    cap = G.round_capacity(n, 1 << 17)
    order = jnp.argsort(~keep)
    sec = G.init_section(pts[order][:cap], cols[order][:cap],
                         msq[order][:cap], n, cap, 0.0, 1.0)
    print(f"[bench] gaussians: {n} (capacity {cap})", file=sys.stderr)

    lcfg_track = LossConfig(
        tracking=True, use_sil_for_loss=True, ignore_outlier_depth_loss=False,
        adaptive_sil=True, use_vis_mask=False, use_far_filter=False,
        im_weight=0.5, depth_weight=0.025, isotropic=True, backend_kwargs=bk)
    lcfg_map = LossConfig(
        tracking=False, use_sil_for_loss=False,
        ignore_outlier_depth_loss=False, adaptive_sil=False,
        use_vis_mask=False, use_far_filter=False, im_weight=1.0,
        depth_weight=1.0, isotropic=True, backend_kwargs=bk_map)
    tcfg = TrackingConfig(num_iters=TRACK_ITERS, lr_quat=4e-4, lr_trans=2e-3,
                          metric="loss", p2p_method="sum", loss_cfg=lcfg_track)
    mcfg = MappingConfig(
        num_iters=MAP_ITERS,
        lrs=(("log_scales", 0.005), ("logit_opacities", 0.05),
             ("means3D", 0.0), ("rgb_colors", 0.0025),
             ("unnorm_rotations", 0.0)),
        loss_cfg=lcfg_map, use_global=False, baseframe_every=40)

    ones = jnp.ones((H, W), bool)
    dummy_p2p = make_p2p_target(jnp.zeros((1, 8, 8), jnp.float32),
                                jnp.eye(3), jnp.eye(4))
    dummy = G.init_section(jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                           jnp.ones((1,)), 0, 1, 0.0, 1.0)
    active = sec.active_mask()
    rng = jax.random.PRNGKey(0)

    def one_frame(t, sec, timed):
        frame, w2c = stage(t)
        from vtgaussian_slam_tpu.ops import geometry as geo
        q, tr = geo.w2c_to_pose(jnp.asarray(w2c, jnp.float32))
        t0 = time.time()
        st = init_track_state(jnp.asarray(q), jnp.asarray(tr), 0.999)
        from vtgaussian_slam_tpu.core.track_cache import build_track_cache
        from vtgaussian_slam_tpu.core.tracking import track_frame_cached
        cache = build_track_cache(sec.params, active, st.quat, st.trans, cam,
                                  span_cap=2, max_pairs_per_tile=512,
                                  chunk=128)
        st, _, _ = track_frame_cached(cache, st, frame, ones, dummy_p2p,
                                      cam, tcfg)
        st.best_quat.block_until_ready()
        t1 = time.time()
        print(f"[bench]   track: {t1 - t0:.2f}s (loss {float(st.min_loss):.1f})",
              file=sys.stderr)
        kf = KeyframeBuffer(colors=frame.color[None], depths=frame.depth[None],
                            quats=st.best_quat[None], trans=st.best_trans[None],
                            frame_ids=jnp.zeros((1,), jnp.int32),
                            count=jnp.asarray(1, jnp.int32))
        from vtgaussian_slam_tpu.core.map_cache import (build_kf_cache,
                                                        dummy_global_cache)
        from vtgaussian_slam_tpu.core.mapping import map_frame_binned
        kfc = jax.tree.map(
            lambda x: x[None],
            build_kf_cache(sec.params, active, st.best_quat, st.best_trans,
                           cam, span_cap=2, max_pairs_per_tile=512))
        new_params, _ = map_frame_binned(
            sec.params, kf, kfc, jnp.zeros((1,), jnp.int32),
            dummy_global_cache(sec.params), jax.random.fold_in(rng, t), cam,
            mcfg)
        new_params.means3d.block_until_ready()
        t2 = time.time()
        print(f"[bench]   map:   {t2 - t1:.2f}s", file=sys.stderr)
        dt = t2 - t0
        return sec.replace(params=new_params), dt

    # warmup (compile)
    sec, dt0 = one_frame(1, sec, timed=False)
    print(f"[bench] warmup frame (incl. compile): {dt0:.1f}s", file=sys.stderr)

    total = 0.0
    for t in range(2, 2 + N_FRAMES):
        sec, dt = one_frame(t, sec, timed=True)
        total += dt
        print(f"[bench] frame {t}: {dt:.2f}s", file=sys.stderr)

    iters_per_frame = TRACK_ITERS + MAP_ITERS
    ips = N_FRAMES * iters_per_frame / total
    print(json.dumps({
        "metric": "replica-room0-proxy combined track+map iters/sec "
                  f"(680x1200, {n} gaussians, 1 chip)",
        "value": round(ips, 2),
        "unit": "iters/sec",
        "vs_baseline": round(ips / BASELINE_ITERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
