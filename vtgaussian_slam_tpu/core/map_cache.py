"""Frozen-binning mapping renderer with inverse-map gradients.

The mapping loop optimizes ONLY rgb_colors / logit_opacities / log_scales —
mapping lrs for means3D and unnorm_rotations are 0 in every reference config
(/root/reference/configs/replica/room0.py:99-107 and the tum/scannet/
scannetpp configs), and keyframe poses are fixed once tracked. So for a given
keyframe, WHICH gaussians land in which tile, and their depth order, are
constant across the whole mapping phase — and stay valid across later phases
too, except for gaussians appended by densification after the cache was
built (the pipeline refreshes stale caches round-robin; see
core/pipeline.py).

Per keyframe this module freezes:
  - the per-tile gather table + counts (binning.bin_gaussians), padded to
    the splat kernel's BLOCK tile multiple,
  - the inverse map for scatter-free gradients (binning.slots8_gather).

Per mapping iteration ONE row gather rebuilds the (Tp, 8, mpt) slot records
from the (N, 8) field table (means frozen + 5 trainable columns — row
gathers are row-count-bound so the extra frozen columns are free, which is
why no per-keyframe means_w copy is cached); everything else (world->camera
transform, EWA projection, activations, compositing) runs inside the fused
splat kernel (ops/rasterizer/pallas_splat.py), and its "vals" backward
skips the mean/Jacobian chain entirely. Replaces the reference's
per-iteration full CUDA re-binning
(/root/reference/src/vtgaussian_slam.py:2516-2780) at equal math for frozen
means.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianParams
from ..ops.camera import Camera
from ..ops.rasterizer.binning import (SlotInv, apply_slot_inverse,
                                      bin_gaussians, bin_two_class,
                                      gather_channels, slot_inverse)
from ..ops.rasterizer.pallas_splat import (_bwd_call, _fwd_call,
                                           assemble_image, splat_blend)
from ..ops.rasterizer.projection import project_gaussians
from .losses import RenderResult
from .track_cache import pad_bin_tables


class KFBinCache(NamedTuple):
    """Per-keyframe frozen binning (stack these along a leading B axis)."""
    tab: jnp.ndarray        # (Tp, mpt) int32
    counts: jnp.ndarray     # (Tp,) int32
    inv: SlotInv            # sorted inverse map (binning.slot_inverse)
    quat: jnp.ndarray       # (4,) keyframe w2c rotation (unnormalized)
    trans: jnp.ndarray      # (3,)


class KFBinCache2C(NamedTuple):
    """Two-class per-keyframe frozen binning (binning.bin_two_class): the
    k_dense highest-count tiles keep the full pair budget, the rest run a
    smaller one — the kernels' slot DMA / gather / backward-buffer volume
    drops to Kp*mpt_d + Sp*mpt_s rows without changing any dense tile's
    render (see bin_two_class exactness note)."""
    tab_d: jnp.ndarray      # (Kp, mpt_d) int32
    counts_d: jnp.ndarray   # (Kp,)
    tids_d: jnp.ndarray     # (Kp,) global tile ids
    tab_s: jnp.ndarray      # (Sp, mpt_s)
    counts_s: jnp.ndarray   # (Sp,)
    tids_s: jnp.ndarray     # (Sp,)
    merge: jnp.ndarray      # (n_tiles,) row into [accum_d; accum_s]
    inv: SlotInv            # inverse over the flat two-block layout
    quat: jnp.ndarray       # (4,)
    trans: jnp.ndarray      # (3,)


class GlobalBinCache(NamedTuple):
    """Binning of [frozen global prefix + trainable section] at the base
    keyframe's pose, for the global-consistency term
    (/root/reference/src/vtgaussian_slam.py:2485-2510,2595-2603)."""
    tab: jnp.ndarray         # (Tp, mpt) int32 indices into the concat
    counts: jnp.ndarray      # (Tp,)
    inv: SlotInv             # sorted inverse of TRAINABLE gaussians
    quat: jnp.ndarray        # (4,) base keyframe w2c rotation
    trans: jnp.ndarray       # (3,)
    fixed_fields8: jnp.ndarray  # (n_fixed, 8) frozen field rows


def pack_fields8(params: GaussianParams) -> jnp.ndarray:
    """The full (N, 8) field table [means3d, logit_op, log_scale, rgb].
    The mapping loop carries THIS as its Adam state (zero lrs on the mean
    columns, whose gradients the kernel zeroes by construction) so no
    per-iteration concat or column slice touches the (N, .) buffers."""
    from .track_cache import fields8
    return fields8(params)


def unpack_fields8(params: GaussianParams, f8: jnp.ndarray) -> GaussianParams:
    return params.replace(
        logit_opacities=f8[:, 3:4],
        log_scales=f8[:, 4:5],
        rgb_colors=f8[:, 5:8],
    )


@functools.partial(
    jax.jit, static_argnames=("cam", "tile", "span_cap", "max_pairs_per_tile",
                              "tile_pad", "select"))
def build_kf_cache(
    params: GaussianParams,
    active: jnp.ndarray,
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    cam: Camera,
    *,
    tile: int = 16,
    span_cap: int = 2,
    max_pairs_per_tile: int = 512,
    tile_pad: int = 0,
    select: str = "depth",
) -> KFBinCache:
    from ..ops import geometry as geo

    tiles_x = -(-cam.width // tile)
    tiles_y = -(-cam.height // tile)
    mpt = -(-max_pairs_per_tile // 128) * 128

    q = geo.normalize(cam_quat)
    R = geo.quat_to_rotmat(q)
    means_cam = params.means3d @ R.T + cam_trans
    # anisotropic covariances live in WORLD frame: rotate into camera frame
    # like render_slam does (isotropic quats are rotation-invariant)
    quats = (params.unnorm_rotations if params.isotropic else
             geo.quat_mult(q[None, :],
                           geo.normalize(params.unnorm_rotations)))
    proj = project_gaussians(means_cam, quats,
                             jnp.exp(params.log_scales), params.opacities(),
                             cam, active)
    b = bin_gaussians(proj, tile, span_cap, tiles_x, tiles_y, mpt,
                      with_inverse=True, select=select)
    tab, counts = pad_bin_tables(b.tab, b.counts, tile_pad)
    inv = slot_inverse(b.inv_pos)
    return KFBinCache(tab=tab, counts=counts, inv=inv,
                      quat=cam_quat, trans=cam_trans)


@functools.partial(
    jax.jit, static_argnames=("cam", "tile", "span_cap", "max_pairs_per_tile",
                              "mpt_sparse", "k_dense", "select"))
def build_kf_cache_2c(
    params: GaussianParams,
    active: jnp.ndarray,
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    cam: Camera,
    *,
    tile: int = 16,
    span_cap: int = 2,
    max_pairs_per_tile: int = 512,
    mpt_sparse: int = 128,
    k_dense: int = 64,
    select: str = "depth",
) -> KFBinCache2C:
    """build_kf_cache with two-class binning (binning.bin_two_class).

    k_dense is rounded up to the kernel BLOCK internally; tile-sharded
    meshes are not supported on this path (the engine keeps single-class
    binning when a mesh is configured)."""
    from ..ops import geometry as geo
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
    proj = project_gaussians(means_cam, quats,
                             jnp.exp(params.log_scales), params.opacities(),
                             cam, active)
    b = bin_two_class(proj, tile, span_cap, tiles_x, tiles_y, mpt, mpt_s,
                      k_dense, BLOCK, with_inverse=True, select=select)
    return KFBinCache2C(tab_d=b.tab_d, counts_d=b.counts_d, tids_d=b.tids_d,
                        tab_s=b.tab_s, counts_s=b.counts_s, tids_s=b.tids_s,
                        merge=b.merge, inv=slot_inverse(b.inv_pos),
                        quat=cam_quat, trans=cam_trans)


@functools.partial(
    jax.jit, static_argnames=("cam", "span_cap", "mpt", "tile_pad",
                              "select", "chunk", "k_dense", "sparse_div"))
def trunc_probe(params: GaussianParams, active: jnp.ndarray,
                quat: jnp.ndarray, trans: jnp.ndarray, cam: Camera,
                span_cap: int = 2, mpt: int = 512, tile_pad: int = 0,
                select: str = "importance",
                chunk: int = 128, k_dense: int = 0,
                sparse_div: int = 4) -> jnp.ndarray:
    """MEASURED truncation harm at one pose: the fraction of rgb pixels
    differing by > 1/255 between renders at the engine's pair budget and
    at 4x that budget — the same oracle bench.measure_truncation reports.

    This drives the closed-loop pair-budget boost
    (pipeline._update_pair_budget). The cheaper per-frame proxies are both
    WRONG for control: tile-count saturation fires on benign tiles whose
    blend saturates first, and leftover-transmittance (T_end telemetry)
    fires permanently on genuinely non-opaque content (sky/far regions) and
    on not-yet-trained maps — measured 10-24% "harm" while this oracle
    read 0.035% at the same budget, which oscillated the budget between
    buckets and paid a recompile per flip. The probe costs one extra
    binning + two renders (~0.2 s), dispatched asynchronously every
    tpu.trunc_probe_every frames (default 10, plus the first frames after
    any budget change), so its amortized cost is ~20 ms/frame.

    When k_dense > 0 the harm side renders the REAL two-class operating
    point (dense top-k_dense tiles at mpt, rest at mpt//sparse_div); the
    oracle side stays single-class 4x."""
    from ..ops.rasterizer.pallas_splat import assemble_image

    f8 = pack_fields8(params)
    interp = jax.default_backend() == "cpu"
    if k_dense > 0:
        k2 = build_kf_cache_2c(params, active, quat, trans, cam,
                               span_cap=span_cap, max_pairs_per_tile=mpt,
                               mpt_sparse=max(128, mpt // sparse_div),
                               k_dense=k_dense, select=select)
        im0 = _accum_to_result(splat_binned_2c(
            f8, (k2.tab_d, k2.counts_d, k2.tids_d),
            (k2.tab_s, k2.counts_s, k2.tids_s), k2.merge, k2.inv,
            k2.quat, k2.trans, cam, max(chunk, 128), 128, interp),
            cam).im
    else:
        kfc = build_kf_cache(params, active, quat, trans, cam,
                             span_cap=span_cap, max_pairs_per_tile=mpt,
                             tile_pad=tile_pad, select=select)
        # kernel chunk contract: the walk chunk must be a multiple of the
        # 128-lane cumsum block (pallas_splat._cumsum_lanes)
        accum = splat_binned(f8, kfc.tab, kfc.inv, kfc.quat, kfc.trans,
                             kfc.counts, cam, max(chunk, 128), interp)
        im0 = assemble_image(accum, cam)[:3]
    kfc4 = build_kf_cache(params, active, quat, trans, cam,
                          span_cap=span_cap, max_pairs_per_tile=4 * mpt,
                          tile_pad=tile_pad, select=select)
    accum4 = splat_binned(f8, kfc4.tab, kfc4.inv, kfc4.quat, kfc4.trans,
                          kfc4.counts, cam, max(chunk, 128), interp)
    im4 = assemble_image(accum4, cam)[:3]
    diff = jnp.max(jnp.abs(im0 - im4), axis=0)
    return jnp.mean((diff > 1.0 / 255.0).astype(jnp.float32))


@functools.partial(
    jax.jit, static_argnames=("cam", "tile", "span_cap", "max_pairs_per_tile",
                              "tile_pad", "select"))
def build_global_cache(
    fixed_params: GaussianParams,
    fixed_active: jnp.ndarray,
    params: GaussianParams,
    active: jnp.ndarray,
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    cam: Camera,
    *,
    tile: int = 16,
    span_cap: int = 2,
    max_pairs_per_tile: int = 512,
    tile_pad: int = 0,
    select: str = "depth",
) -> GlobalBinCache:
    from ..ops import geometry as geo

    tiles_x = -(-cam.width // tile)
    tiles_y = -(-cam.height // tile)
    mpt = -(-max_pairs_per_tile // 128) * 128
    n_fixed = fixed_params.means3d.shape[0]

    means = jnp.concatenate([fixed_params.means3d, params.means3d])
    log_scales = jnp.concatenate([fixed_params.log_scales, params.log_scales])
    logit_op = jnp.concatenate(
        [fixed_params.logit_opacities, params.logit_opacities])
    quats = jnp.concatenate(
        [fixed_params.unnorm_rotations, params.unnorm_rotations])
    act = jnp.concatenate([fixed_active, active])

    q = geo.normalize(cam_quat)
    R = geo.quat_to_rotmat(q)
    means_cam = means @ R.T + cam_trans
    if log_scales.shape[1] == 3:   # anisotropic: world -> camera frame
        quats = geo.quat_mult(q[None, :], geo.normalize(quats))
    proj = project_gaussians(means_cam, quats, jnp.exp(log_scales),
                             jax.nn.sigmoid(logit_op[:, 0]), cam, act)
    b = bin_gaussians(proj, tile, span_cap, tiles_x, tiles_y, mpt,
                      with_inverse=True, select=select)
    tab, counts = pad_bin_tables(b.tab, b.counts, tile_pad)
    inv = slot_inverse(b.inv_pos[n_fixed:])
    from .track_cache import fields8
    return GlobalBinCache(tab=tab, counts=counts, inv=inv,
                          quat=cam_quat, trans=cam_trans,
                          fixed_fields8=fields8(fixed_params))


def _accum_to_result(accum, cam: Camera, tile: int = 16) -> RenderResult:
    img = assemble_image(accum, cam, tile)
    return RenderResult(im=img[:3], depth=img[3:4], silhouette=img[4],
                        depth_sq=img[5:6], radii=jnp.zeros((1,), img.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def splat_binned(fields8, tab, inv, quat, trans, counts,
                 cam: Camera, chunk: int, interpret: bool):
    """Fused differentiable binned render for the mapping loop:
    fields8 (M, 8) -> slot gather (frozen tab) -> fused splat kernel ->
    accum (Tp, NCH, TPX).

    One custom VJP spans the gather AND the blend so the backward can use
    the kernel's ROW-major "vals_rows" gradient layout directly: the flat
    (P, 8) view reads one 32-byte sector per gathered row, where chaining
    two custom VJPs would force the (Tp, 8, mpt) cotangent layout whose
    per-row reads stride 8 HBM transactions (measured 25.5 -> ~9 ms at the
    Replica working set). `inv` is the pre-clipped sorted inverse map
    (binning.SlotInv); only the LAST Ng rows of fields8 (those it
    covers) receive gradients; pose cotangents are zero (mapping never
    differentiates pose — lrs 1e-8/1e-7 are the reference's no-op)."""
    return _splat_binned_fwd(fields8, tab, inv, quat, trans, counts, cam,
                             chunk, interpret)[0]


def _splat_binned_fwd(fields8, tab, inv, quat, trans, counts, cam, chunk,
                      interpret):
    from ..ops import geometry as geo

    tiles_x = -(-cam.width // 16)
    q = geo.normalize(quat)
    R9 = geo.quat_to_rotmat(q).reshape(9)
    slots = gather_channels(fields8, tab)                  # (Tp, 8, mpt)
    accum = _fwd_call(slots, R9, trans, counts, jnp.zeros((), jnp.int32),
                      cam, tiles_x, chunk, interpret)
    res = (slots, R9, trans, counts, accum, inv, fields8.shape[0])
    return accum, res


def _splat_binned_bwd(cam, chunk, interpret, res, g):
    import numpy as np
    slots, R9, trans, counts, accum, inv, M = res
    tiles_x = -(-cam.width // 16)
    Tp, _, mpt = slots.shape
    P = Tp * mpt
    grad_rows = _bwd_call(slots, R9, trans, counts, jnp.zeros((), jnp.int32),
                          accum, g, cam, tiles_x, chunk, interpret,
                          "vals_rows")                     # (Tp, mpt, 8)
    flat = grad_rows.reshape(P, 8)
    g_tail = apply_slot_inverse(flat, inv)                 # (Ng, 8)
    Ng = inv.pos.shape[0]
    if Ng < M:
        g_tail = jnp.concatenate(
            [jnp.zeros((M - Ng, 8), flat.dtype), g_tail], axis=0)
    f0 = jax.dtypes.float0
    g_tab = np.zeros((Tp, mpt), f0)
    g_inv = jax.tree_util.tree_map(
        lambda a: np.zeros(jnp.shape(a), f0), inv)
    return (g_tail, g_tab, g_inv,
            jnp.zeros((4,), flat.dtype), jnp.zeros((3,), flat.dtype),
            np.zeros(counts.shape, f0))


splat_binned.defvjp(_splat_binned_fwd, _splat_binned_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def splat_binned_2c(fields8, kd, ks, merge, inv, quat, trans,
                    cam: Camera, chunk_d: int, chunk_s: int,
                    interpret: bool):
    """splat_binned over a two-class binning (KFBinCache2C): two disjoint
    kernel invocations — dense tiles at the full budget, sparse tiles at
    the small one — merged to (n_tiles, NCH, TPX) by one row gather.

    kd/ks: (tab, counts, tids) triples per class. The per-class `tids`
    rows feed the kernels' tile-id operand AND the backward's cotangent
    split (g[tids]) from the SAME residual tuple, so forward and backward
    cannot disagree (the contract flagged at pallas_splat.splat_blend).
    Gradient layout: the flat cotangent buffer is [dense block rows;
    sparse block rows] and `inv` indexes exactly that
    (binning.bin_two_class with_inverse). Like splat_binned, only the LAST
    Ng rows of fields8 (those `inv` covers) receive gradients; pose
    cotangents are zero."""
    return _splat_2c_fwd(fields8, kd, ks, merge, inv, quat, trans,
                         cam, chunk_d, chunk_s, interpret)[0]


def _splat_2c_fwd(fields8, kd, ks, merge, inv, quat, trans,
                  cam, chunk_d, chunk_s, interpret):
    from ..ops import geometry as geo

    tiles_x = -(-cam.width // 16)
    q = geo.normalize(quat)
    R9 = geo.quat_to_rotmat(q).reshape(9)
    zoff = jnp.zeros((), jnp.int32)
    tab_d, counts_d, tids_d = kd
    tab_s, counts_s, tids_s = ks
    slots_d = gather_channels(fields8, tab_d)            # (Kp, 8, mpt_d)
    slots_s = gather_channels(fields8, tab_s)            # (Sp, 8, mpt_s)
    accum_d = _fwd_call(slots_d, R9, trans, counts_d, zoff, cam, tiles_x,
                        chunk_d, interpret, tids=tids_d)
    accum_s = _fwd_call(slots_s, R9, trans, counts_s, zoff, cam, tiles_x,
                        chunk_s, interpret, tids=tids_s)
    accum = jnp.concatenate([accum_d, accum_s], axis=0)[merge]
    res = (slots_d, slots_s, R9, trans, counts_d, tids_d, counts_s, tids_s,
           accum_d, accum_s, inv, merge.shape[0], fields8.shape[0])
    return accum, res


def _splat_2c_bwd(cam, chunk_d, chunk_s, interpret, res, g):
    import numpy as np
    (slots_d, slots_s, R9, trans, counts_d, tids_d, counts_s, tids_s,
     accum_d, accum_s, inv, n_tiles, M) = res
    tiles_x = -(-cam.width // 16)
    zoff = jnp.zeros((), jnp.int32)
    Kp, _, mpt_d = slots_d.shape
    Sp, _, mpt_s = slots_s.shape
    # transpose of the merge gather: the map is injective over real rows,
    # and padded rows (count 0) write nothing in the kernels
    g_d = g[tids_d]
    g_s = g[tids_s]
    rows_d = _bwd_call(slots_d, R9, trans, counts_d, zoff, accum_d, g_d,
                       cam, tiles_x, chunk_d, interpret, "vals_rows",
                       tids=tids_d)                      # (Kp, mpt_d, 8)
    rows_s = _bwd_call(slots_s, R9, trans, counts_s, zoff, accum_s, g_s,
                       cam, tiles_x, chunk_s, interpret, "vals_rows",
                       tids=tids_s)
    flat = jnp.concatenate(
        [rows_d.reshape(Kp * mpt_d, 8), rows_s.reshape(Sp * mpt_s, 8)])
    g_tail = apply_slot_inverse(flat, inv)               # (Ng, 8)
    Ng = inv.pos.shape[0]
    if Ng < M:
        g_tail = jnp.concatenate(
            [jnp.zeros((M - Ng, 8), flat.dtype), g_tail], axis=0)
    f0 = jax.dtypes.float0
    zt = lambda *shapes: tuple(np.zeros(s, f0) for s in shapes)
    return (g_tail,
            zt((Kp, mpt_d), (Kp,), (Kp,)),               # kd
            zt((Sp, mpt_s), (Sp,), (Sp,)),               # ks
            np.zeros((n_tiles,), f0),                    # merge
            jax.tree_util.tree_map(
                lambda a: np.zeros(jnp.shape(a), f0), inv),
            jnp.zeros((4,), flat.dtype), jnp.zeros((3,), flat.dtype))


splat_binned_2c.defvjp(_splat_2c_fwd, _splat_2c_bwd)


def render_binned_2c(fields8: jnp.ndarray, kfc: KFBinCache2C, cam: Camera,
                     chunk_d: int = 128, chunk_s: int = 128) -> RenderResult:
    """render_binned over a two-class cache (KFBinCache2C)."""
    accum = splat_binned_2c(
        fields8,
        (kfc.tab_d, kfc.counts_d, kfc.tids_d),
        (kfc.tab_s, kfc.counts_s, kfc.tids_s),
        kfc.merge, kfc.inv, kfc.quat, kfc.trans,
        cam, max(chunk_d, 128), max(chunk_s, 128),
        jax.default_backend() == "cpu")
    return _accum_to_result(accum, cam)


def render_binned(fields8: jnp.ndarray, kfc: KFBinCache, cam: Camera,
                  chunk: int = 128) -> RenderResult:
    """Render the trainable section through one keyframe's frozen binning.

    fields8: (N, 8) rows [means3d (frozen; zero grads by kernel
    construction), logit_op, log_scale, rgb] (track_cache.fields8)."""
    accum = splat_binned(fields8, kfc.tab, kfc.inv, kfc.quat, kfc.trans,
                         kfc.counts, cam, max(chunk, 128),
                         jax.default_backend() == "cpu")
    return _accum_to_result(accum, cam)


def render_binned_global(fields8: jnp.ndarray, gc: GlobalBinCache,
                         cam: Camera, chunk: int = 128) -> RenderResult:
    """Render [frozen prefix + trainable] through the global binning.

    The table indexes the concat [frozen prefix; trainable section]; the
    backward covers only the trainable tail (the compact inverse maps those
    rows), so gradients stay scatter-free and flow to the trainable section
    only."""
    cat = jnp.concatenate(
        [jax.lax.stop_gradient(gc.fixed_fields8), fields8], axis=0)
    accum = splat_binned(cat, gc.tab, gc.inv, gc.quat, gc.trans,
                         gc.counts, cam, max(chunk, 128),
                         jax.default_backend() == "cpu")
    return _accum_to_result(accum, cam)


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_slot(stack_leaf: jnp.ndarray, i, val: jnp.ndarray) -> jnp.ndarray:
    """In-place (donated) write of one cache slot into the stacked buffer."""
    return stack_leaf.at[i].set(val)


class MapCacheStore:
    """Host-side manager of the stacked per-keyframe bin caches for the
    CURRENT section.

    Policy (the TPU-side analogue of the reference's per-iteration full
    rebinning, /root/reference/src/vtgaussian_slam.py:2516-2780):
      - the just-tracked frame's cache is built fresh every mapping phase;
      - per phase, the `refresh` stalest other slots are rebuilt — stale =
        built when the section had fewer gaussians than now, OR built more
        than `stale_age` phases ago (trained log_scales drift the tile
        membership even at constant n_active) — so densified/grown gaussians
        become visible from older keyframes within ~count/refresh frames;
      - gaussians added after a slot's build simply receive no gradient from
        that keyframe until its refresh (inv_pos rows of then-inactive
        gaussians are -1 by construction);
      - when capacity or the pair budget re-buckets (shape change), every
        known slot is rebuilt in one burst (rare: a handful per section).

    Slots are stacked device buffers (W, ...) written in place via donation;
    W is fixed at section start so `map_frame_binned` compiles once per
    shape key. When bfe exceeds `max_slots` (memory budget), the base frame
    (ring 0) is pinned and the most recent window is kept — sampling then
    covers base + window instead of all section frames (documented
    deviation; never triggered by replica/tum/scannet budgets).
    """

    def __init__(self, max_slots: int = 64, refresh: int = 1,
                 tile_pad: int = 0, stale_age: int = 12,
                 select: str = "depth", k_dense: int = 0,
                 sparse_div: int = 4):
        self.max_slots = max_slots
        self.refresh = refresh
        self.tile_pad = tile_pad
        self.select = select
        # two-class binning (bin_two_class): k_dense > 0 builds KFBinCache2C
        # slots — the k_dense highest-count tiles keep the full mpt budget,
        # the rest run max(128, mpt // sparse_div), which tracks pair-budget
        # boosts automatically. 0 = single-class (required when a
        # tile-sharded mesh supplies tile_pad).
        self.k_dense = k_dense
        self.sparse_div = sparse_div
        # binning also depends on exp(log_scales), which train every
        # iteration — a slot untouched by densification still goes stale as
        # splats grow past their build-time radii, so slots older than
        # `stale_age` phases refresh even at constant n_active
        self.stale_age = stale_age
        self.reset()

    def reset(self):
        self.stack = None          # KFBinCache with leading (W,) axis
        self.key = None            # (capacity, mpt, H, W_img, W)
        self.ring_of_slot = []     # cache slot -> ring index
        self.built_n = []          # n_active at build time per slot
        self.built_tick = []       # update() counter at build time per slot
        self.tick = 0
        self.poses = {}            # ring index -> (quat np, trans np)

    def slot_ids_array(self, W: int):
        ids = list(self.ring_of_slot) + [0] * (W - len(self.ring_of_slot))
        return jnp.asarray(ids, jnp.int32), len(self.ring_of_slot)

    def _build(self, params, active, ring_idx, cam, span_cap, mpt):
        quat, trans = self.poses[ring_idx]
        if self.k_dense > 0:
            built = build_kf_cache_2c(
                params, active, jnp.asarray(quat), jnp.asarray(trans), cam,
                span_cap=span_cap, max_pairs_per_tile=mpt,
                mpt_sparse=max(128, mpt // self.sparse_div),
                k_dense=self.k_dense, select=self.select)
        else:
            built = build_kf_cache(params, active, jnp.asarray(quat),
                                   jnp.asarray(trans), cam,
                                   span_cap=span_cap,
                                   max_pairs_per_tile=mpt,
                                   tile_pad=self.tile_pad,
                                   select=self.select)
        import os
        if os.environ.get("VTGS_DUMP_COUNTS"):
            import numpy as np
            n_tiles = (-(-cam.height // 16)) * (-(-cam.width // 16))
            if self.k_dense > 0:
                c = np.concatenate([np.asarray(built.counts_d),
                                    np.asarray(built.counts_s)])
            else:
                c = np.asarray(built.counts)[:n_tiles]
            print(f"[counts:map] mpt={mpt} max={c.max()} "
                  f"p99={np.percentile(c, 99):.0f} "
                  f"p90={np.percentile(c, 90):.0f} "
                  f"p50={np.percentile(c, 50):.0f} "
                  f"p10={np.percentile(c, 10):.0f} mean={c.mean():.0f}")
        return built

    def _write(self, slot, kfc_one):
        self.stack = jax.tree.map(
            lambda st, v: _set_slot(st, slot, v), self.stack, kfc_one)

    def update(self, params, active, n_active: int, ring_idx: int,
               quat, trans, cam, span_cap: int, mpt: int, W: int):
        """Ensure caches exist for every registered section keyframe (the
        just-tracked frame plus any re-seeded after resume/re-bucket) and
        refresh stale slots. Returns (stack, slot_ids, count)."""
        self.poses[ring_idx] = (quat, trans)
        self.tick += 1
        key = (params.means3d.shape[0], mpt, cam.height, cam.width, W,
               self.k_dense, self.sparse_div)
        if self.key != key:
            # shape re-bucket: drop the stack, keep poses; every registered
            # keyframe is re-admitted below (rare burst)
            self.stack = None
            self.ring_of_slot = []
            self.built_n = []
            self.built_tick = []
            self.key = key

        missing = [r for r in sorted(self.poses)
                   if r not in self.ring_of_slot]
        for r in missing:
            built = self._build(params, active, r, cam, span_cap, mpt)
            if self.stack is None:
                self.stack = jax.tree.map(
                    lambda v: jnp.zeros((W,) + v.shape, v.dtype), built)
            self._admit_slot(r, built, n_active, W)

        # refresh the stalest slots: missed densifications, or builds old
        # enough that trained log_scales have drifted the tile membership
        for _ in range(self.refresh):
            stale = [i for i, b in enumerate(self.built_n)
                     if (b < n_active
                         or self.tick - self.built_tick[i] >= self.stale_age)
                     and self.ring_of_slot[i] != ring_idx]
            if not stale:
                break
            slot = min(stale, key=lambda i: (self.built_n[i],
                                             self.built_tick[i]))
            self._write(slot, self._build(
                params, active, self.ring_of_slot[slot], cam, span_cap, mpt))
            self.built_n[slot] = n_active
            self.built_tick[slot] = self.tick

        slot_ids, count = self.slot_ids_array(W)
        return self.stack, slot_ids, count

    def _admit_slot(self, ring_idx, built, n_active, W):
        if len(self.ring_of_slot) < W:
            slot = len(self.ring_of_slot)
            self.ring_of_slot.append(ring_idx)
            self.built_n.append(n_active)
            self.built_tick.append(self.tick)
        else:
            # evict the oldest non-base slot (ring 0 pinned: the global term
            # and reference sampling both want the base frame available)
            candidates = [i for i, r in enumerate(self.ring_of_slot)
                          if r != 0] or list(range(len(self.ring_of_slot)))
            slot = min(candidates, key=lambda i: self.ring_of_slot[i])
            self.poses.pop(self.ring_of_slot[slot], None)
            self.ring_of_slot[slot] = ring_idx
            self.built_n[slot] = n_active
            self.built_tick[slot] = self.tick
        self._write(slot, built)


def dummy_global_cache(params: GaussianParams) -> GlobalBinCache:
    """Tiny placeholder passed to map_frame_binned when use_global is False
    (the static flag prunes the branch; shapes only key the jit cache)."""
    from ..ops.rasterizer.pallas_splat import BLOCK
    f32 = params.means3d.dtype
    return GlobalBinCache(
        tab=jnp.zeros((BLOCK, 128), jnp.int32),
        counts=jnp.zeros((BLOCK,), jnp.int32),
        inv=SlotInv(
            pos=jnp.zeros((params.means3d.shape[0], 4), jnp.int32),
            w=jnp.zeros((params.means3d.shape[0], 4), jnp.float32)),
        quat=jnp.asarray([1.0, 0.0, 0.0, 0.0], f32),
        trans=jnp.zeros((3,), f32),
        fixed_fields8=jnp.zeros((1, 8), f32),
    )
