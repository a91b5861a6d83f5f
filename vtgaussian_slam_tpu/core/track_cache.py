"""Cached-binning tracking renderer.

Within one tracked frame the camera moves millimeters over 60-200 gradient
iterations, so the tile assignment and per-tile depth order of the Gaussians
are essentially constant — but the reference (and our generic `render_tiled`)
rebuild them from scratch every iteration, and on TPU the pair sort + random
record gather dominate the render.

This module freezes the binning at the frame's initial pose:

- `build_track_cache` runs projection + binning ONCE and gathers ALL
  per-slot fields (world mean, logit opacity, log scale, rgb — everything is
  pose-independent and frozen during tracking) into the fused splat kernel's
  8-row record layout (ops/rasterizer/pallas_splat.py): slots8
  (Tp, 8, mpt), tiles padded to the kernel's BLOCK.
- `render_cached` is then a single `splat_blend` call: the world->camera
  transform, EWA projection and compositing all happen in-kernel, and the
  pose gradient (dR, dt) is contracted IN-KERNEL too ("pose" grad mode), so
  the per-iteration XLA graph contains no per-slot math or buffers at all.

Deviation from the reference: blending order and tile lists are those of the
binning pose; the pipeline rebuilds the cache between tracking phases and on
iteration-doubling (and optionally every `rebin_every` iterations). For
millimeter pose deltas the visual difference is below loss noise, and
gradients stay exact for the *rendered* configuration.

Anisotropic Gaussians would need per-slot quaternions too; the SLAM configs
are all isotropic (configs/replica/room0.py:28), so the cache is
isotropic-only and the pipeline falls back to the generic renderer otherwise.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianParams
from ..ops.camera import Camera
from ..ops.rasterizer.binning import gather_channels
from ..ops.rasterizer.pallas_splat import (assemble_image, pad_tiles,
                                           splat_blend)
from ..ops.rasterizer.projection import project_gaussians
from .losses import RenderResult


class TrackCache(NamedTuple):
    slots8: jnp.ndarray   # (Tp, 8, mpt) [wx wy wz logit_op log_scale r g b]
    counts: jnp.ndarray   # (Tp,)
    radii: jnp.ndarray    # (N,) per-Gaussian radii at the cache pose


class TrackCache2C(NamedTuple):
    """Two-class frozen tracking binning (binning.bin_two_class): the
    k_dense highest-count tiles keep the full pair budget, the rest run a
    smaller one. Same exactness contract as map_cache.KFBinCache2C; the
    pose path needs no inverse map (gradients reduce to (dR, dt)
    in-kernel), so this is just two slot tables + the row merge."""
    slots_d: jnp.ndarray  # (Kp, 8, mpt_d)
    counts_d: jnp.ndarray  # (Kp,)
    tids_d: jnp.ndarray    # (Kp,) global tile id per dense row
    slots_s: jnp.ndarray  # (Sp, 8, mpt_s)
    counts_s: jnp.ndarray  # (Sp,)
    tids_s: jnp.ndarray    # (Sp,)
    merge: jnp.ndarray     # (n_tiles,) row into [accum_d; accum_s]
    radii: jnp.ndarray     # (N,)


def pad_bin_tables(tab: jnp.ndarray, counts: jnp.ndarray,
                   tile_pad: int = 0):
    """Pad (T, mpt) binning tables to the splat kernel's BLOCK multiple —
    or to `tile_pad` (a BLOCK multiple) so a tile-sharded mesh gives every
    device whole kernel blocks (parallel/engine.tile_pad_for). Padded tiles
    carry count 0 and index-0 slots (never rendered)."""
    T = tab.shape[0]
    mult = max(tile_pad, 1)
    Tp = max(pad_tiles(T), -(-T // mult) * mult)
    if Tp == T:
        return tab, counts
    return (jnp.pad(tab, ((0, Tp - T), (0, 0))),
            jnp.pad(counts, (0, Tp - T)))


def fields8(params: GaussianParams) -> jnp.ndarray:
    """(N, 8) field rows [wx wy wz logit_op log_scale r g b]."""
    return jnp.concatenate(
        [params.means3d, params.logit_opacities, params.log_scales,
         params.rgb_colors], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("cam", "tile", "span_cap", "max_pairs_per_tile",
                     "chunk", "tile_pad", "select"))
def build_track_cache(
    params: GaussianParams,
    active: jnp.ndarray,
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    cam: Camera,
    *,
    tile: int = 16,
    span_cap: int = 3,
    max_pairs_per_tile: int = 512,
    chunk: int = 128,
    tile_pad: int = 0,
    select: str = "depth",
) -> TrackCache:
    """Bin once at the initial pose; gather all per-slot fields.

    select="importance" keeps a saturated tile's top-alpha pairs instead of
    its depth prefix (binning.bin_gaussians docstring) — the engine's
    default via tpu.importance_binning."""
    from ..ops import geometry as geo
    from ..ops.rasterizer.binning import bin_gaussians

    H, W = cam.height, cam.width
    tiles_x = -(-W // tile)
    tiles_y = -(-H // tile)
    chunk = max(chunk, 128)
    mpt = -(-max_pairs_per_tile // chunk) * chunk

    q = geo.normalize(cam_quat)
    R = geo.quat_to_rotmat(q)
    means_cam = params.means3d @ R.T + cam_trans
    scales = jnp.exp(params.log_scales)
    # the cache is isotropic-only on the engine path (module docstring),
    # but direct API use with anisotropic params still gets correct EWA:
    # rotate world-frame covariances into the camera frame like render_slam
    quats = (params.unnorm_rotations if params.isotropic else
             geo.quat_mult(q[None, :],
                           geo.normalize(params.unnorm_rotations)))
    proj = project_gaussians(means_cam, quats, scales,
                             params.opacities(), cam, active)

    binned = bin_gaussians(proj, tile, span_cap, tiles_x, tiles_y, mpt,
                           select=select)
    tab, counts = pad_bin_tables(binned.tab, binned.counts, tile_pad)

    slots = gather_channels(fields8(params), tab)          # (Tp, 8, mpt)
    return TrackCache(slots8=slots, counts=counts, radii=proj.radius)


@functools.partial(jax.jit, static_argnames=("cam", "chunk"))
def cached_harm(cache: TrackCache, cam_quat: jnp.ndarray,
                cam_trans: jnp.ndarray, cam: Camera,
                chunk: int = 128) -> jnp.ndarray:
    """Upper-BOUND truncation telemetry for one cached render: pixels whose
    final transmittance stayed >= 1/255 (the splat kernel's channel-6 T_end
    telemetry) on count-SATURATED tiles — pixels where the dropped pair
    tail COULD have rendered. Cheap (~7 ms, one forward render) but loose:
    it cannot distinguish dropped mass from genuinely non-opaque content or
    a not-yet-trained map (measured 10-24% here vs 0.035% real pixel diff),
    so the engine's budget control uses the measured-diff probe instead
    (map_cache.trunc_probe). Kept as diagnostics: a LOW value proves
    truncation-harm-free rendering without paying the probe's 4x render."""
    from ..ops import geometry as geo

    tiles_x = -(-cam.width // 16)
    tiles_y = -(-cam.height // 16)
    n_tiles = tiles_x * tiles_y
    mpt = cache.slots8.shape[-1]
    q = geo.normalize(cam_quat)
    R = geo.quat_to_rotmat(q)
    accum = splat_blend(cache.slots8, R.reshape(9), cam_trans,
                        cache.counts, jnp.zeros((), jnp.int32), cam, tiles_x,
                        max(chunk, 128), jax.default_backend() == "cpu",
                        "pose")
    sat = (cache.counts[:n_tiles] >= mpt)[:, None]
    harmed = (accum[:n_tiles, 6, :] >= 1.0 / 255.0) & sat
    return jnp.mean(harmed.astype(jnp.float32))


def render_cached(
    cache: TrackCache,
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    cam: Camera,
    chunk: int = 128,
    tile: int = 16,
) -> RenderResult:
    """Render at a (slightly moved) pose from the frozen binning — one fused
    kernel call; (dR, dt) gradients are reduced inside the backward kernel."""
    from ..ops import geometry as geo

    tiles_x = -(-cam.width // tile)
    q = geo.normalize(cam_quat)
    R = geo.quat_to_rotmat(q)
    accum = splat_blend(cache.slots8, R.reshape(9), cam_trans,
                        cache.counts, jnp.zeros((), jnp.int32), cam, tiles_x,
                        max(chunk, 128), jax.default_backend() == "cpu",
                        "pose")
    img = assemble_image(accum, cam, tile)
    return RenderResult(im=img[:3], depth=img[3:4], silhouette=img[4],
                        depth_sq=img[5:6], radii=cache.radii)


@functools.partial(
    jax.jit, static_argnames=("cam", "tile", "span_cap", "max_pairs_per_tile",
                              "mpt_sparse", "k_dense", "select"))
def build_track_cache_2c(
    params: GaussianParams,
    active: jnp.ndarray,
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    cam: Camera,
    *,
    tile: int = 16,
    span_cap: int = 3,
    max_pairs_per_tile: int = 512,
    mpt_sparse: int = 128,
    k_dense: int = 64,
    select: str = "depth",
) -> TrackCache2C:
    """build_track_cache with two-class binning (binning.bin_two_class).

    Both classes window the same fused-key sort, so a dense tile's slots
    are bit-identical to single-class binning at max_pairs_per_tile and a
    sparse tile's to single-class at mpt_sparse. Tile-sharded meshes are
    not supported on this path (the engine keeps single-class binning when
    a mesh is configured)."""
    from ..ops import geometry as geo
    from ..ops.rasterizer.binning import bin_two_class
    from ..ops.rasterizer.pallas_splat import BLOCK

    tiles_x = -(-cam.width // tile)
    tiles_y = -(-cam.height // tile)
    mpt = -(-max_pairs_per_tile // 128) * 128
    mpt_s = -(-mpt_sparse // 128) * 128

    q = geo.normalize(cam_quat)
    R = geo.quat_to_rotmat(q)
    means_cam = params.means3d @ R.T + cam_trans
    quats = (params.unnorm_rotations if params.isotropic else
             geo.quat_mult(q[None, :],
                           geo.normalize(params.unnorm_rotations)))
    proj = project_gaussians(means_cam, quats, jnp.exp(params.log_scales),
                             params.opacities(), cam, active)
    b = bin_two_class(proj, tile, span_cap, tiles_x, tiles_y, mpt, mpt_s,
                      k_dense, BLOCK, with_inverse=False, select=select)
    f8 = fields8(params)
    return TrackCache2C(slots_d=gather_channels(f8, b.tab_d),
                        counts_d=b.counts_d, tids_d=b.tids_d,
                        slots_s=gather_channels(f8, b.tab_s),
                        counts_s=b.counts_s, tids_s=b.tids_s,
                        merge=b.merge, radii=proj.radius)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def splat_pose_2c(slots_d, counts_d, tids_d, slots_s, counts_s, tids_s,
                  merge, R9, trans, cam: Camera, chunk_d: int, chunk_s: int,
                  interpret: bool):
    """splat_blend("pose") over a two-class binning: two disjoint kernel
    invocations — dense tiles at the full pair budget, sparse tiles at the
    small one — merged to (n_tiles, NCH, TPX) by one row gather.

    The per-class `tids` rows feed the kernels' tile-id operand AND the
    backward's cotangent split (g[tids]) from the SAME residual tuple, so
    forward and backward cannot disagree (the contract flagged at
    pallas_splat.splat_blend). Gradients: (dR, dt) only, each class's
    in-kernel 12-float reduction summed; slot cotangents are zeros like
    splat_blend's "pose" mode."""
    return _pose_2c_fwd(slots_d, counts_d, tids_d, slots_s, counts_s,
                        tids_s, merge, R9, trans, cam, chunk_d, chunk_s,
                        interpret)[0]


def _pose_2c_fwd(slots_d, counts_d, tids_d, slots_s, counts_s, tids_s,
                 merge, R9, trans, cam, chunk_d, chunk_s, interpret):
    from ..ops.rasterizer.pallas_splat import _fwd_call

    tiles_x = -(-cam.width // 16)
    zoff = jnp.zeros((), jnp.int32)
    accum_d = _fwd_call(slots_d, R9, trans, counts_d, zoff, cam, tiles_x,
                        chunk_d, interpret, tids=tids_d)
    accum_s = _fwd_call(slots_s, R9, trans, counts_s, zoff, cam, tiles_x,
                        chunk_s, interpret, tids=tids_s)
    accum = jnp.concatenate([accum_d, accum_s], axis=0)[merge]
    res = (slots_d, counts_d, tids_d, slots_s, counts_s, tids_s, merge,
           R9, trans, accum_d, accum_s)
    return accum, res


def _pose_2c_bwd(cam, chunk_d, chunk_s, interpret, res, g):
    import numpy as np

    from ..ops.rasterizer.pallas_splat import _bwd_call

    (slots_d, counts_d, tids_d, slots_s, counts_s, tids_s, merge,
     R9, trans, accum_d, accum_s) = res
    tiles_x = -(-cam.width // 16)
    zoff = jnp.zeros((), jnp.int32)
    # transpose of the merge gather: injective over real rows; padded rows
    # (count 0) contribute nothing inside the kernels
    grad_d = _bwd_call(slots_d, R9, trans, counts_d, zoff, accum_d,
                       g[tids_d], cam, tiles_x, chunk_d, interpret, "pose",
                       tids=tids_d)
    grad_s = _bwd_call(slots_s, R9, trans, counts_s, zoff, accum_s,
                       g[tids_s], cam, tiles_x, chunk_s, interpret, "pose",
                       tids=tids_s)
    g_R = (jnp.sum(grad_d[:, 0, 0:9], axis=0)
           + jnp.sum(grad_s[:, 0, 0:9], axis=0))
    g_t = (jnp.sum(grad_d[:, 0, 9:12], axis=0)
           + jnp.sum(grad_s[:, 0, 9:12], axis=0))
    f0 = jax.dtypes.float0
    return (jnp.zeros_like(slots_d), np.zeros(counts_d.shape, f0),
            np.zeros(tids_d.shape, f0),
            jnp.zeros_like(slots_s), np.zeros(counts_s.shape, f0),
            np.zeros(tids_s.shape, f0),
            np.zeros(merge.shape, f0), g_R, g_t)


splat_pose_2c.defvjp(_pose_2c_fwd, _pose_2c_bwd)


def render_cached_2c(
    cache: TrackCache2C,
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    cam: Camera,
    chunk_d: int = 128,
    chunk_s: int = 128,
    tile: int = 16,
) -> RenderResult:
    """render_cached over a two-class cache (TrackCache2C)."""
    from ..ops import geometry as geo

    q = geo.normalize(cam_quat)
    R = geo.quat_to_rotmat(q)
    accum = splat_pose_2c(cache.slots_d, cache.counts_d, cache.tids_d,
                          cache.slots_s, cache.counts_s, cache.tids_s,
                          cache.merge, R.reshape(9), cam_trans, cam,
                          max(chunk_d, 128), max(chunk_s, 128),
                          jax.default_backend() == "cpu")
    img = assemble_image(accum, cam, tile)
    return RenderResult(im=img[:3], depth=img[3:4], silhouette=img[4],
                        depth_sq=img[5:6], radii=cache.radii)
