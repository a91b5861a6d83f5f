"""Probe: per-tile blend TERMINATION depth at the trained bench working set.

Pairs past the depth where every pixel's transmittance died contribute ZERO
gradient (the kernels early-terminate their walks), but they still occupy
inverse-map entries — every mapping iteration gathers their (all-zero) grad
rows. This probe measures how deep the blend actually reaches per tile, i.e.
how much of the inverse-gather volume (the largest mapping-iteration
component, prof_map) a termination-aware inverse prune would remove.

Method: render the latest keyframe's accum with counts clamped to k for a
ladder of k; a tile is "terminated by k" when its accum matches the
unclamped render. Reports the termination-depth histogram and the predicted
valid-pair reduction.
"""
import os
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

from vtgaussian_slam_tpu.core.map_cache import build_kf_cache, pack_fields8
from vtgaussian_slam_tpu.core.pipeline import VTGaussianSLAM, _traj_read
from vtgaussian_slam_tpu.ops import geometry as geo
from vtgaussian_slam_tpu.ops.rasterizer.pallas_splat import _fwd_call

FRAMES = int(os.environ.get("VTGS_PROF_FRAMES", "8"))


def main():
    engine = VTGaussianSLAM(bench.bench_config())
    engine.process_frame_zero()
    for t in range(1, FRAMES):
        engine.process_frame(t)
    sec = engine.sections[-1]
    mpt = dict(engine.map_backend_kwargs)["max_pairs_per_tile"]
    span = dict(engine.map_backend_kwargs)["span_cap"]
    q, tr = _traj_read(engine.traj.quats, engine.traj.trans, FRAMES - 1)
    cam = engine.cam
    n_tiles = (-(-cam.height // 16)) * (-(-cam.width // 16))

    kfc = build_kf_cache(sec.params, sec.active_mask(), q, tr, cam,
                         span_cap=span, max_pairs_per_tile=mpt,
                         tile_pad=engine.tile_pad)
    from vtgaussian_slam_tpu.ops.rasterizer.binning import gather_channels
    f8 = pack_fields8(sec.params)
    slots = gather_channels(f8, kfc.tab)
    tiles_x = -(-cam.width // 16)
    R9 = geo.quat_to_rotmat(geo.normalize(kfc.quat)).reshape(9)
    zoff = jnp.zeros((), jnp.int32)

    @jax.jit
    def render_clamped(k):
        c = jnp.minimum(kfc.counts, k)
        return _fwd_call(slots, R9, kfc.trans, c, zoff, cam, tiles_x,
                         128, False)

    counts = np.asarray(kfc.counts)[:n_tiles]
    full = np.asarray(render_clamped(jnp.int32(10 ** 9)))[:n_tiles, :6]
    ks = [k for k in (64, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048)
          if k < mpt] + [mpt]
    term = np.full(n_tiles, mpt, np.int32)
    for k in reversed(ks[:-1]):
        acc = np.asarray(render_clamped(jnp.int32(k)))[:n_tiles, :6]
        done = np.abs(acc - full).max(axis=(1, 2)) < 1e-5
        term[done & (counts > k)] = np.minimum(term[done & (counts > k)], k)
        term[counts <= k] = np.minimum(term[counts <= k], counts[counts <= k])
        print(f"k={k:5d}: tiles terminated {done.mean():.3f}")
    # valid-pair volumes
    binned = counts.sum()
    walked = np.minimum(term, counts).sum()
    margin = np.minimum(term + 128, counts).sum()
    print(f"mpt={mpt} tiles={n_tiles} binned_pairs={binned/1e6:.2f}M")
    print(f"termination depth: p50={np.percentile(term,50):.0f} "
          f"p90={np.percentile(term,90):.0f} p99={np.percentile(term,99):.0f} "
          f"max={term.max()}")
    print(f"count distribution: p50={np.percentile(counts,50):.0f} "
          f"p90={np.percentile(counts,90):.0f} mean={counts.mean():.0f} "
          f"sat_frac={(counts>=mpt).mean():.3f}")
    print(f"walked_pairs={walked/1e6:.2f}M ({walked/binned:.2f} of binned); "
          f"with +128 margin {margin/1e6:.2f}M ({margin/binned:.2f})")


if __name__ == "__main__":
    main()
