"""Cached-binning tracking renderer.

Within one tracked frame the camera moves millimeters over 60-200 gradient
iterations, so the tile assignment and per-tile depth order of the Gaussians
are essentially constant — but the reference (and our generic `render_tiled`)
rebuild them from scratch every iteration, and on TPU the pair sort + random
record gather dominate the render (profiled at ~160 ms of a ~220 ms
iteration at 917k Gaussians).

This module freezes the binning at the frame's initial pose:

- `build_track_cache` runs projection + binning ONCE and gathers the
  pose-INDEPENDENT per-slot fields (world mean, scale, opacity, rgb) into
  per-tile table layout.
- `render_cached` re-derives the pose-DEPENDENT quantities (camera-frame
  mean, screen mean, isotropic EWA conic, depth channels) per slot with pure
  elementwise math — no sort, no gather — and feeds the Pallas blend kernel
  directly in its transposed record layout.

Deviation from the reference: blending order and tile lists are those of the
iteration-0 pose (refreshable via `rebin_every` by rebuilding the cache);
for millimeter pose deltas the visual difference is below loss noise, and
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
from ..ops.rasterizer.pallas_blend import blend_tiles
from ..ops.rasterizer.projection import (COV2D_DILATION, NEAR_CULL,
                                         project_gaussians)
from .losses import RenderResult


class TrackCache(NamedTuple):
    mean3d: jnp.ndarray   # (T, mpt, 3) world-frame means
    scale: jnp.ndarray    # (T, mpt) isotropic stddev (post-exp)
    opac: jnp.ndarray     # (T, mpt)
    rgb: jnp.ndarray      # (T, mpt, 3)
    counts: jnp.ndarray   # (T,)
    radii: jnp.ndarray    # (N,) per-Gaussian radii at the cache pose


@functools.partial(
    jax.jit,
    static_argnames=("cam", "tile", "span_cap", "max_pairs_per_tile", "chunk"))
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
) -> TrackCache:
    """Bin once at the initial pose; gather static per-slot fields."""
    from ..ops import geometry as geo

    N = params.means3d.shape[0]
    H, W = cam.height, cam.width
    tiles_x = -(-W // tile)
    tiles_y = -(-H // tile)
    n_tiles = tiles_x * tiles_y
    chunk = max(chunk, 128)
    mpt = -(-max_pairs_per_tile // chunk) * chunk
    p_max = N * span_cap * span_cap

    q = geo.normalize(cam_quat)
    R = geo.quat_to_rotmat(q)
    means_cam = params.means3d @ R.T + cam_trans
    scales = jnp.exp(params.log_scales)
    proj = project_gaussians(means_cam, params.unnorm_rotations, scales,
                             params.opacities(), cam, active)

    # tile rects (same construction as render_tiled)
    px, py = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = proj.radius
    rx0 = jnp.clip(jnp.floor((px - r) / tile), 0, tiles_x).astype(jnp.int32)
    ry0 = jnp.clip(jnp.floor((py - r) / tile), 0, tiles_y).astype(jnp.int32)
    rx1 = jnp.clip(jnp.floor((px + r) / tile) + 1, 0, tiles_x).astype(jnp.int32)
    ry1 = jnp.clip(jnp.floor((py + r) / tile) + 1, 0, tiles_y).astype(jnp.int32)
    ctx = jnp.clip(jnp.floor(px / tile), 0, tiles_x - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(py / tile), 0, tiles_y - 1).astype(jnp.int32)
    rx0 = jnp.where(rx1 - rx0 > span_cap,
                    jnp.clip(ctx - span_cap // 2, rx0, rx1 - span_cap), rx0)
    ry0 = jnp.where(ry1 - ry0 > span_cap,
                    jnp.clip(cty - span_cap // 2, ry0, ry1 - span_cap), ry0)
    span_x = jnp.minimum(rx1 - rx0, span_cap)
    span_y = jnp.minimum(ry1 - ry0, span_cap)
    valid = proj.valid & (span_x > 0) & (span_y > 0)

    sentinel = jnp.int32(n_tiles)
    gidx = jnp.arange(N, dtype=jnp.int32)
    depth_key = jnp.where(jnp.isfinite(proj.depth), proj.depth, 3.4e38)
    slot_tiles = []
    for s in range(span_cap * span_cap):
        dy, dx = s // span_cap, s % span_cap
        ok = valid & (dy < span_y) & (dx < span_x)
        slot_tiles.append(jnp.where(ok, (ry0 + dy) * tiles_x + rx0 + dx,
                                    sentinel))
    pair_tile = jnp.stack(slot_tiles).reshape(-1)
    pair_depth = jnp.broadcast_to(depth_key, (span_cap**2, N)).reshape(-1)
    pair_gauss = jnp.broadcast_to(gidx, (span_cap**2, N)).reshape(-1)
    s_tile, _, s_gauss = jax.lax.sort((pair_tile, pair_depth, pair_gauss),
                                      num_keys=2)
    tid = jnp.arange(n_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(s_tile, tid, side="left").astype(jnp.int32)
    end = jnp.searchsorted(s_tile, tid, side="right").astype(jnp.int32)
    counts = jnp.minimum(end - start, mpt)
    j = jnp.arange(mpt, dtype=jnp.int32)
    flat = jnp.minimum(start[:, None] + j[None, :], p_max - 1)
    tab = s_gauss[flat]                                    # (T, mpt)

    return TrackCache(
        mean3d=params.means3d[tab],
        scale=scales[:, 0][tab],
        opac=params.opacities()[tab],
        rgb=params.rgb_colors[tab],
        counts=counts,
        radii=proj.radius,
    )


def render_cached(
    cache: TrackCache,
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    cam: Camera,
    chunk: int = 128,
    tile: int = 16,
) -> RenderResult:
    """Render at a (slightly moved) pose from the frozen binning."""
    from ..ops import geometry as geo

    n_tiles, mpt, _ = cache.mean3d.shape
    H, W = cam.height, cam.width
    tiles_x = -(-W // tile)
    tiles_y = -(-H // tile)
    f32 = cache.mean3d.dtype

    q = geo.normalize(cam_quat)
    R = geo.quat_to_rotmat(q)
    pc = cache.mean3d @ R.T + cam_trans                    # (T, mpt, 3)
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    ok = z > NEAR_CULL
    z_safe = jnp.where(ok, z, 1.0)
    inv_z = 1.0 / z_safe
    limx, limy = 1.3 * cam.tanfovx, 1.3 * cam.tanfovy
    tx = jnp.clip(x * inv_z, -limx, limx) * z_safe
    ty = jnp.clip(y * inv_z, -limy, limy) * z_safe
    inv_z2 = inv_z * inv_z
    j00 = cam.fx * inv_z
    j02 = -cam.fx * tx * inv_z2
    j11 = cam.fy * inv_z
    j12 = -cam.fy * ty * inv_z2
    s2 = cache.scale * cache.scale
    v00 = s2 * (j00 * j00 + j02 * j02) + COV2D_DILATION
    v01 = s2 * (j02 * j12)
    v11 = s2 * (j11 * j11 + j12 * j12) + COV2D_DILATION
    det = v00 * v11 - v01 * v01
    ok = ok & (det > 0)
    inv_det = 1.0 / jnp.where(det > 0, det, 1.0)
    ca = v11 * inv_det
    cb = -v01 * inv_det
    cc = v00 * inv_det
    m2x = cam.fx * x * inv_z + cam.cx - 0.5
    m2y = cam.fy * y * inv_z + cam.cy - 0.5
    m2x = jnp.where(ok, m2x, -1e6)
    opac = jnp.where(ok, cache.opac, 0.0)

    ones = jnp.ones_like(z)
    recs = jnp.stack(
        [m2x, m2y, ca, cb, cc, opac,
         cache.rgb[..., 0], cache.rgb[..., 1], cache.rgb[..., 2],
         z, ones, z * z, jnp.zeros_like(z), jnp.zeros_like(z),
         jnp.zeros_like(z), jnp.zeros_like(z)],
        axis=1)                                            # (T, RECW, mpt)

    accum = blend_tiles(recs, cache.counts, tiles_x, chunk, 8,
                        jax.default_backend() == "cpu")[..., :6]
    img = accum.reshape(tiles_y, tiles_x, tile, tile, 6)
    img = img.transpose(4, 0, 2, 1, 3).reshape(6, tiles_y * tile,
                                               tiles_x * tile)
    img = img[:, :H, :W]
    return RenderResult(im=img[:3], depth=img[3:4], silhouette=img[4],
                        depth_sq=img[5:6], radii=cache.radii)
