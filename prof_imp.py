"""Probe: does per-tile IMPORTANCE selection (keep the top-mpt pairs by
max-alpha-over-tile, depth order preserved) close the truncation pixel-diff
gap at the same pair budget?

Depth-prefix truncation (the current binning) drops the ENTIRE tail of a
saturated tile — including its high-alpha surface splats — which is where
the bench's 3.9%-of-pixels diff vs an untruncated render comes from.
Importance selection instead drops the lowest-contribution pairs wherever
they sit in depth, keeping the composite's dominant terms at any budget.

Prints, for the trained bench working set: rgb pixel-diff fraction vs a
4096-budget render for (a) depth-prefix truncation and (b) importance
selection, at mpt in {512, 1024}.
"""
import os
import sys

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
from vtgaussian_slam_tpu.ops.rasterizer.binning import gather_channels
from vtgaussian_slam_tpu.ops.rasterizer.pallas_splat import (_fwd_call,
                                                             assemble_image,
                                                             pad_tiles)
from vtgaussian_slam_tpu.ops.rasterizer.projection import project_gaussians

FRAMES = int(os.environ.get("VTGS_PROF_FRAMES", "14"))
TILE = 16


def main():
    engine = VTGaussianSLAM(bench.bench_config())
    engine.process_frame_zero()
    for t in range(1, FRAMES):
        engine.process_frame(t)
    sec = engine.sections[-1]
    span = dict(engine.map_backend_kwargs)["span_cap"]
    q, tr = _traj_read(engine.traj.quats, engine.traj.trans, FRAMES - 1)
    cam = engine.cam
    tiles_x = -(-cam.width // TILE)
    tiles_y = -(-cam.height // TILE)
    n_tiles = tiles_x * tiles_y

    BIG = 4096
    kfc = build_kf_cache(sec.params, sec.active_mask(), q, tr, cam,
                         span_cap=span, max_pairs_per_tile=BIG,
                         tile_pad=engine.tile_pad)
    f8 = pack_fields8(sec.params)
    slots_big = gather_channels(f8, kfc.tab)
    R9 = geo.quat_to_rotmat(geo.normalize(q)).reshape(9)
    zoff = jnp.zeros((), jnp.int32)

    def render(slots, counts):
        acc = _fwd_call(slots, R9, tr, counts, zoff, cam, tiles_x, 128, False)
        return np.asarray(assemble_image(acc, cam)[:3])

    im_full = render(slots_big, kfc.counts)
    tab = np.asarray(kfc.tab)[:n_tiles]
    counts = np.asarray(kfc.counts)[:n_tiles]
    print(f"BIG={BIG}: sat_frac={(counts >= BIG).mean():.4f} "
          f"mean={counts.mean():.0f} p99={np.percentile(counts, 99):.0f}")

    # per-pair max alpha over the tile (exact conic at the clamped point)
    qn = geo.normalize(q)
    R = geo.quat_to_rotmat(qn)
    means_cam = sec.params.means3d @ R.T + tr
    proj = project_gaussians(means_cam, sec.params.unnorm_rotations,
                             jnp.exp(sec.params.log_scales),
                             sec.params.opacities(), cam, sec.active_mask())
    m2 = np.asarray(proj.mean2d)
    con = np.asarray(proj.conic)
    op = np.asarray(proj.opacity)

    ty, tx = np.divmod(np.arange(n_tiles), tiles_x)
    tx0 = (tx * TILE)[:, None]
    ty0 = (ty * TILE)[:, None]
    g = tab
    px, py = m2[g, 0], m2[g, 1]
    dx = px - np.clip(px, tx0, tx0 + TILE - 1)
    dy = py - np.clip(py, ty0, ty0 + TILE - 1)
    power = -0.5 * (con[g, 0] * dx * dx + con[g, 2] * dy * dy) \
        - con[g, 1] * dx * dy
    imp = op[g] * np.exp(np.minimum(power, 0))
    slot_ix = np.arange(BIG)[None, :]
    imp = np.where(slot_ix < counts[:, None], imp, -1.0)

    for mpt in (512, 1024):
        # (a) depth-prefix truncation
        kfc_s = build_kf_cache(sec.params, sec.active_mask(), q, tr, cam,
                               span_cap=span, max_pairs_per_tile=mpt,
                               tile_pad=engine.tile_pad)
        slots_s = gather_channels(f8, kfc_s.tab)
        im_trunc = render(slots_s, kfc_s.counts)

        # (b) importance selection: top-mpt by imp, then restore depth order
        top = np.argpartition(-imp, mpt - 1, axis=1)[:, :mpt]
        top.sort(axis=1)                      # ascending slot = depth order
        tab_imp = np.take_along_axis(tab, top, axis=1)
        cnt_imp = np.minimum(counts, mpt).astype(np.int32)
        Tp = pad_tiles(n_tiles) if not engine.tile_pad else max(
            pad_tiles(n_tiles), engine.tile_pad)
        tab_j = jnp.asarray(np.pad(tab_imp, ((0, Tp - n_tiles), (0, 0))))
        cnt_j = jnp.asarray(np.pad(cnt_imp, (0, Tp - n_tiles)))
        slots_i = gather_channels(f8, tab_j)
        im_imp = render(slots_i, cnt_j)

        for name, im in (("depth-prefix", im_trunc), ("importance", im_imp)):
            d = np.abs(im - im_full).max(axis=0)
            mse = float(((im - im_full) ** 2).mean())
            psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
            print(f"mpt={mpt} {name:12s}: diff>{1/255:.4f} frac="
                  f"{(d > 1/255).mean():.5f} max={d.max():.4f} "
                  f"PSNR-vs-full={psnr:.1f} dB")


if __name__ == "__main__":
    main()
