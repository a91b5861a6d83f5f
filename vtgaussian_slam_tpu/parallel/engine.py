"""Multi-chip sharding of the REAL SLAM fused loops.

The reference is strictly single-GPU (SURVEY.md 2.9b) — this is a new
TPU-native design: the rasterization workload (the dominant cost,
O(tiles x pairs x pixels)) is sharded OVER IMAGE TILES across a 1-D
`jax.sharding.Mesh` axis, with the Gaussian state replicated. Per fused
optimization iteration:

  - each device runs the Pallas splat kernel on its tile shard (the kernel's
    `tile_offset` scalar gives it global pixel coordinates);
  - the per-shard accumulators are `all_gather`ed (26 MB at 1200x680 —
    a fraction of a millisecond over ICI) so the LOSS — masks, medians,
    adaptive silhouette thresholds, SSIM windows — runs on the full image
    with exactly the single-chip code (core/losses.loss_from_render);
  - the backward is spelled out manually (custom VJPs whose fwd and bwd are
    each their own `shard_map` — no reliance on shard_map transpose rules):
    the image cotangent slices back to tile shards, each device runs its
    backward kernel, and parameter / pose gradients are `psum`med over ICI.

Tracking communicates 12 floats of pose gradient per iteration (the pose
backward reduces in-kernel); mapping psums the (N, 8) field-table gradient
(~29 MB at 1M capacity). Both loops keep full Adam and the full mask stack:
these are the PRODUCT loops (core/tracking.track_loop,
core/mapping.map_binned_loop) run on sharded renderers, not simplified
replicas — `tests/test_parallel.py` asserts numerical agreement with the
single-device path, and `__graft_entry__.dryrun_multichip` drives the whole
`VTGaussianSLAM` engine on the mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.losses import RenderResult
from ..core.mapping import KeyframeBuffer, MappingConfig, map_binned_loop
from ..core.tracking import TrackingConfig, TrackState, track_loop
from ..ops.camera import Camera
from ..ops.rasterizer.pallas_splat import (BLOCK, _bwd_call, _fwd_call,
                                           assemble_image)

AXIS = "px"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def tile_pad_for(mesh: Mesh | None) -> int:
    """Tile-count multiple the cache builders must pad to so each shard
    holds a whole number of kernel BLOCKs."""
    if mesh is None:
        return BLOCK
    return BLOCK * mesh.shape[AXIS]


def _interp() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# tracking: frozen cache slots sharded over tiles; pose grads reduced
# in-kernel per shard, psum'd in the manual backward
# ---------------------------------------------------------------------------


def _make_splat_cached_sharded(mesh: Mesh, cam: Camera, tiles_x: int,
                               chunk: int, tiles_local: int):
    interp = _interp()

    @jax.custom_vjp
    def splat(slots8, counts, R9, trans):
        return fwd(slots8, counts, R9, trans)[0]

    def fwd(slots8, counts, R9, trans):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(), P()),
            out_specs=(P(), P(AXIS)),
            check_rep=False)
        def run(slots_sh, counts_sh, R9_, trans_):
            off = jax.lax.axis_index(AXIS) * tiles_local
            acc = _fwd_call(slots_sh, R9_, trans_, counts_sh, off, cam,
                            tiles_x, chunk, interp)
            return jax.lax.all_gather(acc, AXIS, axis=0, tiled=True), acc

        accum, acc_local = run(slots8, counts, R9, trans)
        return accum, (slots8, counts, R9, trans, acc_local)

    def bwd(res, g):
        slots8, counts, R9, trans, acc_local = res

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(), P(), P(AXIS), P()),
            out_specs=(P(), P()),
            check_rep=False)
        def run(slots_sh, counts_sh, R9_, trans_, acc_sh, g_):
            idx0 = jax.lax.axis_index(AXIS) * tiles_local
            g_local = jax.lax.dynamic_slice_in_dim(g_, idx0, tiles_local, 0)
            grad = _bwd_call(slots_sh, R9_, trans_, counts_sh, idx0, acc_sh,
                             g_local, cam, tiles_x, chunk, interp, "pose")
            g_R = jax.lax.psum(jnp.sum(grad[:, 0, 0:9], axis=0), AXIS)
            g_t = jax.lax.psum(jnp.sum(grad[:, 0, 9:12], axis=0), AXIS)
            return g_R, g_t

        g_R, g_t = run(slots8, counts, R9, trans, acc_local, g)
        f0 = jax.dtypes.float0
        return (jnp.zeros_like(slots8), np.zeros(counts.shape, f0), g_R, g_t)

    splat.defvjp(fwd, bwd)
    return splat


def make_track_frame_cached_sharded(mesh: Mesh):
    """Mesh-sharded twin of core.tracking.track_frame_cached: the REAL
    fused tracking loop (full mask stack, Adam, candidate metric) over a
    tile-sharded renderer. Caches must be built with
    tile_pad=tile_pad_for(mesh)."""
    n_dev = mesh.shape[AXIS]

    @functools.partial(jax.jit, static_argnames=("cam", "cfg"))
    def run(cache, state: TrackState, frame, aux_mask, p2p_target,
            cam: Camera, cfg: TrackingConfig):
        from ..ops import geometry as geo

        from ..ops.rasterizer.pallas_splat import pick_walk_chunk
        chunk = pick_walk_chunk(cache.slots8.shape[2])
        Tp = cache.slots8.shape[0]
        assert Tp % (n_dev * BLOCK) == 0, (Tp, n_dev)
        tiles_x = -(-cam.width // 16)
        splat = _make_splat_cached_sharded(mesh, cam, tiles_x, chunk,
                                           Tp // n_dev)

        def render_fn(quat, trans):
            q = geo.normalize(quat)
            R9 = geo.quat_to_rotmat(q).reshape(9)
            accum = splat(cache.slots8, cache.counts, R9, trans)
            img = assemble_image(accum, cam, 16)
            return RenderResult(im=img[:3], depth=img[3:4],
                                silhouette=img[4], depth_sq=img[5:6],
                                radii=cache.radii)

        return track_loop(render_fn, state, frame, aux_mask, p2p_target,
                          cam, cfg)

    return run


# ---------------------------------------------------------------------------
# mapping: per-keyframe bin tables sharded over tiles; field-table grads
# via shard-local compact-inverse gathers + psum
# ---------------------------------------------------------------------------


def _make_splat_binned_sharded(mesh: Mesh, cam: Camera, tiles_x: int,
                               chunk: int, tiles_local: int):
    from ..ops.rasterizer.binning import gather_channels, weighted_inverse

    interp = _interp()

    @jax.custom_vjp
    def splat(f8, tab, counts, inv, R9, trans):
        return fwd(f8, tab, counts, inv, R9, trans)[0]

    def fwd(f8, tab, counts, inv, R9, trans):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(AXIS), P(AXIS), P(), P()),
            out_specs=(P(), P(AXIS), P(AXIS)),
            check_rep=False)
        def run(f8_, tab_sh, counts_sh, R9_, trans_):
            off = jax.lax.axis_index(AXIS) * tiles_local
            slots = gather_channels(f8_, tab_sh)
            acc = _fwd_call(slots, R9_, trans_, counts_sh, off, cam,
                            tiles_x, chunk, interp)
            return (jax.lax.all_gather(acc, AXIS, axis=0, tiled=True),
                    slots, acc)

        accum, slots, acc_local = run(f8, tab, counts, R9, trans)
        return accum, (slots, counts, inv, R9, trans, acc_local,
                       f8.shape[0])

    def bwd(res, g):
        slots, counts, inv, R9, trans, acc_local, M = res

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(), P(), P(), P(AXIS), P()),
            out_specs=P(),
            check_rep=False)
        def run(slots_sh, counts_sh, inv_, R9_, trans_, acc_sh, g_):
            Tl, _, mpt = slots_sh.shape
            Pl = Tl * mpt
            idx0 = jax.lax.axis_index(AXIS) * tiles_local
            g_local = jax.lax.dynamic_slice_in_dim(g_, idx0, Tl, 0)
            grad_rows = _bwd_call(slots_sh, R9_, trans_, counts_sh, idx0,
                                  acc_sh, g_local, cam, tiles_x, chunk,
                                  interp, "vals_rows")   # (Tl, mpt, 8)
            flat = grad_rows.reshape(Pl, 8)
            # inverse positions are GLOBAL (valid-first, pre-clipped); each
            # device reduces the subset living on its shard, partials psum
            # over the mesh
            lo = idx0 * mpt
            lp = inv_.pos - lo
            w = inv_.w * ((lp >= 0) & (lp < Pl)).astype(flat.dtype)
            idx = jnp.clip(lp, 0, Pl - 1)
            g_f8 = weighted_inverse(flat, idx, w)
            return jax.lax.psum(g_f8, AXIS)

        g_tail = run(slots, counts, inv, R9, trans, acc_local, g)
        Ng = inv.pos.shape[0]
        if Ng < M:
            g_tail = jnp.concatenate(
                [jnp.zeros((M - Ng, 8), g_tail.dtype), g_tail], axis=0)
        f0 = jax.dtypes.float0
        g_inv = jax.tree_util.tree_map(
            lambda a: np.zeros(jnp.shape(a), f0), inv)
        return (g_tail, np.zeros((slots.shape[0], slots.shape[2]), f0),
                np.zeros(counts.shape, f0), g_inv,
                jnp.zeros((9,), g_tail.dtype), jnp.zeros((3,), g_tail.dtype))

    splat.defvjp(fwd, bwd)
    return splat


def make_map_frame_binned_sharded(mesh: Mesh):
    """Mesh-sharded twin of core.mapping.map_frame_binned: the REAL fused
    mapping loop (full loss incl. SSIM + global term, Adam) over
    tile-sharded binned renderers. Caches must be built with
    tile_pad=tile_pad_for(mesh)."""
    from ..core.map_cache import _accum_to_result

    n_dev = mesh.shape[AXIS]

    @functools.partial(jax.jit, static_argnames=("cam", "cfg"))
    def run(params, kf: KeyframeBuffer, kfc, slot_ids, gc, rng,
            cam: Camera, cfg: MappingConfig):
        from ..ops import geometry as geo

        from ..ops.rasterizer.pallas_splat import pick_walk_chunk
        chunk = pick_walk_chunk(
            kfc.tab.shape[-1],
            *([gc.tab.shape[-1]] if cfg.use_global else []))
        tiles_x = -(-cam.width // 16)
        Tp = kfc.tab.shape[1]
        assert Tp % (n_dev * BLOCK) == 0, (Tp, n_dev)
        splat = _make_splat_binned_sharded(mesh, cam, tiles_x, chunk,
                                           Tp // n_dev)
        Tg = gc.tab.shape[0]
        splat_g = (_make_splat_binned_sharded(mesh, cam, tiles_x, chunk,
                                              Tg // n_dev)
                   if cfg.use_global else None)

        def render_local(v8, k):
            q = geo.normalize(k.quat)
            R9 = geo.quat_to_rotmat(q).reshape(9)
            accum = splat(v8, k.tab, k.counts, k.inv, R9, k.trans)
            return _accum_to_result(accum, cam)

        def render_global(v8):
            q = geo.normalize(gc.quat)
            R9 = geo.quat_to_rotmat(q).reshape(9)
            cat = jnp.concatenate(
                [jax.lax.stop_gradient(gc.fixed_fields8), v8], axis=0)
            accum = splat_g(cat, gc.tab, gc.counts, gc.inv, R9, gc.trans)
            return _accum_to_result(accum, cam)

        return map_binned_loop(render_local, render_global, params, kf, kfc,
                               slot_ids, rng, cam, cfg)

    return run
