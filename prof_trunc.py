"""Probe: is count-saturation truncation at the steady-state working set
visible in the rendered output?

Runs the bench engine for a few frames (trained scales/opacities), then
renders the latest keyframe through frozen binnings at mpt=512 vs 2048 and
reports image/depth/silhouette deltas. If deltas are ~0, depth-ordered
truncation at 512 is harmless (tiles saturate first) and the pair-budget
feedback should key on silhouette holes, not raw count saturation.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.argv = ["bench.py"]

import bench
from vtgaussian_slam_tpu.utils.runtime import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from vtgaussian_slam_tpu.core.map_cache import (build_kf_cache, pack_fields8,
                                                render_binned)
from vtgaussian_slam_tpu.core.pipeline import VTGaussianSLAM

FRAMES = 6


def main():
    engine = VTGaussianSLAM(bench.bench_config())
    engine.process_frame_zero()
    for t in range(1, FRAMES):
        engine.process_frame(t)
    sec = engine.sections[-1]
    q = engine.traj.quats[FRAMES - 1]
    tr = engine.traj.trans[FRAMES - 1]
    f8 = pack_fields8(sec.params)
    outs = {}
    for mpt in (512, 2048):
        kfc = build_kf_cache(sec.params, sec.active_mask(), q, tr,
                             engine.cam, span_cap=2, max_pairs_per_tile=mpt,
                             tile_pad=engine.tile_pad)
        t0 = time.time()
        r = render_binned(f8, kfc, engine.cam, 128)
        jax.block_until_ready(r.im)
        outs[mpt] = r
        n_tiles = (-(-engine.cam.height // 16)) * (-(-engine.cam.width // 16))
        c = np.asarray(kfc.counts)[:n_tiles]
        print(f"mpt={mpt}: trunc_frac={(c >= mpt).mean():.3f} "
              f"mean_count={c.mean():.0f} render {time.time() - t0:.2f}s")
    a, b = outs[512], outs[2048]
    for name in ("im", "depth", "silhouette"):
        da = np.asarray(getattr(a, name), np.float64)
        db = np.asarray(getattr(b, name), np.float64)
        diff = np.abs(da - db)
        print(f"{name}: max|d|={diff.max():.3e} mean|d|={diff.mean():.3e} "
              f"frac>1e-3={(diff > 1e-3).mean():.4f}")
    sil = np.asarray(b.silhouette)
    print(f"sil(2048): min={sil.min():.4f} frac<0.99={(sil < 0.99).mean():.4f}")


if __name__ == "__main__":
    main()
