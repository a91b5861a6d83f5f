"""Benchmark: combined tracking+mapping iterations/sec (BASELINE.json).

North star (/root/repo/BASELINE.json): >= 25 combined track+map iters/sec on
Replica room0 (680x1200, 60 tracking + 100 mapping iters per frame) on one
TPU v5e chip. No Replica data ships in this image, so the bench drives the
REAL `VTGaussianSLAM` engine end-to-end — tracking with the replica p2p
candidate metric and estimated (const-velocity) pose init, per-frame
densification incl. the 2x-resolution Canny edge stream, keyframe/base-frame
selection, section boundaries, and the frozen-section global-consistency
term — on a procedurally generated scene at Replica room0's exact
resolution, iteration budgets, loss weights, and representative Gaussian
count (~900k/section, one per pixel at init, like the reference's
first-frame seeding).

The only knob that differs from room0 is `baseframe_every=12` (vs 40) so a
short run crosses section boundaries and pays boundary selection, section
spawning, fixed-section global renders, and base-frame draws at a HIGHER
rate than room0 itself would — the proxy errs on the expensive side.

Timing: frames [WARM..END) are timed. Compile attribution is EXACT — a
`jax.monitoring` listener sums XLA backend-compile seconds per frame.
Frames whose measured compile exceeds 0.5 s are re-bucket compiles (a real
room0 run amortizes a handful of those over 2000 frames; a 15-frame window
would over-weight them ~100x) — they are excluded from the steady-state
rate but reported; kept frames have their (small) measured compile seconds
subtracted from their wall time, so the rate is compile-free regardless of
the threshold. Iteration counts are the engine's MEASURED fused-loop
iteration counts, not the configured budgets.

Truncation honesty (the per-tile pair budget can silently drop blend
tails the CUDA reference would composite — SURVEY.md 2.9): after the run,
the last keyframe is rendered through the engine's actual mapping budget
and the JSON carries (a) the count-saturated tile fraction, (b) the
leftover-transmittance error bound from the splat kernel's T_end channel
(|pixel diff| <= T_end on saturated tiles for channels in [0,1]), and
(c) the MEASURED rgb pixel-diff fraction vs a 4x-budget render.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
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

BASELINE_ITERS_PER_SEC = 25.0
NUM_FRAMES = int(os.environ.get("VTGS_BENCH_FRAMES", "40"))
WARM = min(25, NUM_FRAMES * 5 // 8)  # sections 0,1 built; global term live
BFE = 12


def bench_config():
    from configs.common import make_config

    config = make_config("replica", "room0proxy", seed=2,
                         baseframe_every=BFE)
    # the reference's self-reported per-iteration timings bracket only the
    # track/map loops — its wandb/report_progress work is outside the
    # timers — so the bench disables reporting to compare like for like
    config["use_wandb"] = False
    config["workdir"] = "/tmp/vtgs_bench"
    config["data"] = dict(
        dataset_name="synthetic",
        synthetic=dict(num_frames=NUM_FRAMES, height=680, width=1200,
                       seed=0, motion_scale=0.05),
        sequence="room0proxy",
        desired_image_height=680,
        desired_image_width=1200,
        densification_image_height=1360,
        densification_image_width=2400,
        start=0, end=-1, stride=1, num_frames=-1,
    )
    # experiment knob: override the pair-budget floor (importance binning
    # keeps a saturated tile's top-alpha pairs, so smaller budgets stay
    # render-honest — certified by the pixel-diff-vs-4x oracle below)
    mpt = int(os.environ.get("VTGS_BENCH_MPT", "0"))
    if mpt:
        config["tpu"]["max_pairs_per_tile"] = mpt
        config["tpu"]["map_max_pairs_per_tile"] = mpt
    return config


def measure_truncation(engine):
    """Truncation honesty (VERDICT r3 item 3): render the latest section
    through the engine's ACTUAL mapping pair budget and report
      - trunc_tile_frac: fraction of tiles whose pair count saturates mpt;
      - T_bound mean/max: leftover transmittance on saturated tiles — an
        EXACT per-pixel error bound for channels in [0, 1] (the splat
        kernel's channel-6 telemetry, zeroed where the walk terminated);
      - pixel_diff vs a 4x-budget render of the SAME params/pose: measured
        fraction of rgb pixels differing by > 1/255 and the max |diff|.
    The reference's CUDA rasterizer never drops pairs (SURVEY.md 2.9);
    these numbers certify how close the budgeted render is to that.

    When two-class binning is enabled (engine._k_dense > 0) the budgeted
    side renders the REAL two-class operating point (dense tiles at mpt,
    the rest at mpt // sparse_div) — the number certifies what the mapping
    loop actually trains against, not a single-class proxy. The 4x oracle
    stays single-class (every tile at 4*mpt)."""
    import jax
    import jax.numpy as jnp

    from vtgaussian_slam_tpu.core.map_cache import (build_kf_cache,
                                                    build_kf_cache_2c,
                                                    pack_fields8,
                                                    splat_binned,
                                                    splat_binned_2c)
    from vtgaussian_slam_tpu.core.pipeline import _traj_read
    from vtgaussian_slam_tpu.ops.rasterizer.pallas_splat import assemble_image

    sec = engine.sections[-1]
    mpt = dict(engine.map_backend_kwargs)["max_pairs_per_tile"]
    span = dict(engine.map_backend_kwargs)["span_cap"]
    t = int(getattr(engine, "_cur_frame_idx", NUM_FRAMES - 1))
    q, tr = _traj_read(engine.traj.quats, engine.traj.trans, t)
    f8 = pack_fields8(sec.params)
    cam = engine.cam
    n_tiles = (-(-cam.height // 16)) * (-(-cam.width // 16))
    interp = jax.default_backend() == "cpu"
    k_dense = int(getattr(engine, "_k_dense", 0))

    if k_dense > 0:
        mpt_s = max(128, mpt // engine._two_class_div)
        k2 = build_kf_cache_2c(sec.params, sec.active_mask(), q, tr, cam,
                               span_cap=span, max_pairs_per_tile=mpt,
                               mpt_sparse=mpt_s, k_dense=k_dense,
                               select=engine._bin_select)
        accum = splat_binned_2c(
            f8, (k2.tab_d, k2.counts_d, k2.tids_d),
            (k2.tab_s, k2.counts_s, k2.tids_s), k2.merge, k2.inv,
            k2.quat, k2.trans, cam, 128, 128, interp)[:n_tiles]
        # per-tile saturation at the tile's OWN class budget
        sat_rows = jnp.concatenate([
            (k2.counts_d >= mpt).astype(jnp.float32),
            (k2.counts_s >= mpt_s).astype(jnp.float32)])
        sat = sat_rows[k2.merge]
        two_class = {"two_class_k_dense": k_dense, "two_class_mpt_s": mpt_s}
    else:
        kfc = build_kf_cache(sec.params, sec.active_mask(), q, tr, cam,
                             span_cap=span, max_pairs_per_tile=mpt,
                             tile_pad=engine.tile_pad,
                             select=engine._bin_select)
        accum = splat_binned(f8, kfc.tab, kfc.inv, kfc.quat, kfc.trans,
                             kfc.counts, cam, 128, interp)
        sat = (kfc.counts[:n_tiles] >= mpt).astype(jnp.float32)
        two_class = {}

    kfc4 = build_kf_cache(sec.params, sec.active_mask(), q, tr, cam,
                          span_cap=span, max_pairs_per_tile=4 * mpt,
                          tile_pad=engine.tile_pad,
                          select=engine._bin_select)
    accum4 = splat_binned(f8, kfc4.tab, kfc4.inv, kfc4.quat, kfc4.trans,
                          kfc4.counts, cam, 128, interp)
    t_end = accum[:n_tiles, 6, :] * sat[:, None]
    im_s = assemble_image(accum, cam)[:3]
    im_b = assemble_image(accum4, cam)[:3]
    diff = jnp.max(jnp.abs(im_s - im_b), axis=0)
    return {
        "map_mpt": int(mpt),
        **two_class,
        "trunc_tile_frac": round(float(jnp.mean(sat)), 4),
        "trunc_T_bound_mean": round(float(jnp.mean(t_end)), 5),
        "trunc_T_bound_max": round(float(jnp.max(t_end)), 4),
        "pixel_diff_frac_vs_4x": round(float(jnp.mean(diff > 1 / 255)), 5),
        "pixel_diff_max_vs_4x": round(float(jnp.max(diff)), 4),
    }


def main():
    import jax

    from vtgaussian_slam_tpu.core.pipeline import VTGaussianSLAM

    # exact compile attribution: frames are excluded from the steady-state
    # window iff XLA actually backend-compiled during them (re-bucket
    # compiles amortize over a real 2000-frame run and hit the persistent
    # cache on re-runs) — honest vs the old 3x-median wall-time heuristic,
    # which both missed mid-window recompiles and could eat genuine slow
    # frames. Tunnel/host noise stays IN the measurement.
    # Persistent-cache RETRIEVAL counts too: deserializing a ~100 MB cached
    # executable costs 5-15 s on this 1-core host — the same amortizes-away
    # one-time cost as the compile it replaced, and without it the same
    # frame flips between excluded (cold: compile measured) and included
    # (warm: deserialize unmeasured) run to run (measured 24.22 vs 22.37
    # on back-to-back identical runs; round-5 session notes).
    compile_s = [0.0]

    def _on_event(name, dur, **kw):
        if name in ("/jax/core/compile/backend_compile_duration",
                    "/jax/compilation_cache/cache_retrieval_time_sec"):
            compile_s[0] += dur

    jax.monitoring.register_event_duration_secs_listener(_on_event)

    # the engine narrates (auto_pair_budget, warnings) on stdout; the
    # driver contract is ONE JSON line there, so reroute engine prints to
    # stderr for the whole run and restore for the final JSON line
    real_stdout = sys.stdout
    sys.stdout = sys.stderr

    engine = VTGaussianSLAM(bench_config())
    t_setup = time.time()
    engine.process_frame_zero()
    jax.block_until_ready(engine.sections[-1].params.means3d)
    warmup_s = time.time() - t_setup
    print(f"[bench] frame 0 (map compile): {warmup_s:.1f}s", file=sys.stderr)

    BREAK = ("tracking_jit_time_sum", "mapping_jit_time_sum", "t_dataset",
             "t_densify", "t_densify_fetch", "t_densify_host", "t_map_store",
             "t_global_concat", "t_global_cache", "t_track_cache", "t_select",
             "t_stage", "t_track_prep", "t_spawn", "t_sel_pool",
             "t_sel_walk", "t_page", "t_prefetch", "t_map_select")
    rows = []  # (t, dt, track_iters, map_iters, frame_compile_s)
    for t in range(1, NUM_FRAMES):
        s0 = dict(engine.stats)
        c0 = compile_s[0]
        t0 = time.time()
        engine.process_frame(t)
        jax.block_until_ready(engine.traj.quats)
        dt = time.time() - t0
        cs = compile_s[0] - c0
        ti = engine.stats["tracking_jit_iters"] - s0["tracking_jit_iters"]
        mi = engine.stats["mapping_jit_iters"] - s0["mapping_jit_iters"]
        rows.append((t, dt, ti, mi, cs))
        tag = " B" if t % BFE == 0 else ""
        parts = " ".join(
            f"{k.replace('_time_sum', '').replace('t_', '')}:"
            f"{engine.stats[k] - s0[k]:.2f}" for k in BREAK
            if engine.stats[k] - s0[k] > 0.005)
        ctag = f" compile:{cs:.1f}" if cs > 0.1 else ""
        print(f"[bench] frame {t:2d}{tag}: {dt:6.2f}s "
              f"({ti} track + {mi} map iters) [{parts}{ctag}]",
              file=sys.stderr)

    n_total = sum(int(s.n_active) for s in engine.sections)
    window = [r for r in rows if r[0] >= WARM]
    kept = [r for r in window if r[4] <= 0.5]
    skipped = [r for r in window if r[4] > 0.5]
    iters = sum(r[2] + r[3] for r in kept)
    secs = sum(r[1] - r[4] for r in kept)
    if not kept or secs <= 0:
        sys.exit("[bench] steady window is empty (all windowed frames were "
                 "compile-excluded or VTGS_BENCH_FRAMES is too small); "
                 "no honest rate to report")
    ips = iters / secs
    # the axon tunnel injects random 5-15s stalls into host-sync'd stages
    # (ROADMAP round-3 note; they vanish on rerun with zero code change) —
    # report the median per-frame rate alongside the mean so readers can
    # see how much of the gap between the two is tunnel noise
    ips_median = float(np.median([(r[2] + r[3]) / (r[1] - r[4])
                                  for r in kept])) if kept else 0.0
    trunc = measure_truncation(engine)
    print(f"[bench] truncation: {trunc}", file=sys.stderr)
    if skipped:
        print(f"[bench] excluded {len(skipped)} frame(s) with measured XLA "
              f"compiles: {[(r[0], round(r[1], 1), round(r[4], 1)) for r in skipped]}",
              file=sys.stderr)
    print(f"[bench] steady window: {len(kept)} frames, {iters} iters, "
          f"{secs:.1f}s, working-set gaussians {n_total}", file=sys.stderr)
    sys.stdout = real_stdout
    print(json.dumps({
        "metric": "replica-room0-proxy full-engine combined track+map "
                  "iters/sec (680x1200, p2p tracking, densify+selection+"
                  "global term, boundary-heavy bfe=12, 1 chip)",
        "value": round(ips, 2),
        "unit": "iters/sec",
        "vs_baseline": round(ips / BASELINE_ITERS_PER_SEC, 3),
        # measurement window provenance: a reduced VTGS_BENCH_FRAMES shrinks
        # WARM below the point where sections 0/1 and the global term are
        # live, so results at non-default frame counts are NOT comparable to
        # the 40-frame baseline — the counts are carried in the JSON so
        # nobody has to guess
        "num_frames": NUM_FRAMES,
        "warm_frames": WARM,
        # compile-cost telemetry (VERDICT r2 item 7): first-frame warmup,
        # total measured backend-compile seconds over the whole run, and the
        # frames excluded because XLA actually compiled during them
        "ips_median_frame": round(ips_median, 2),
        "warmup_s": round(warmup_s, 1),
        "total_backend_compile_s": round(compile_s[0], 1),
        "compile_frames_excluded": [(r[0], round(r[1], 1)) for r in skipped],
        # truncation honesty (see measure_truncation); probe_diff_max is
        # the worst in-loop measured pixel diff that drove the budget
        # control during the run (map_cache.trunc_probe)
        "trunc_probe_diff_max": round(
            float(engine.stats.get("trunc_probe_diff_max", 0.0)), 5),
        **trunc,
    }))


if __name__ == "__main__":
    main()
