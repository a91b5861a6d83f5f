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
from ..ops.rasterizer.binning import bin_gaussians, slots8_gather
from ..ops.rasterizer.pallas_splat import assemble_image, splat_blend
from ..ops.rasterizer.projection import project_gaussians
from .losses import RenderResult
from .track_cache import pad_bin_tables


class KFBinCache(NamedTuple):
    """Per-keyframe frozen binning (stack these along a leading B axis)."""
    tab: jnp.ndarray        # (Tp, mpt) int32
    counts: jnp.ndarray     # (Tp,) int32
    inv_pos: jnp.ndarray    # (N, s2) int32, -1 = culled/truncated
    quat: jnp.ndarray       # (4,) keyframe w2c rotation (unnormalized)
    trans: jnp.ndarray      # (3,)


class GlobalBinCache(NamedTuple):
    """Binning of [frozen global prefix + trainable section] at the base
    keyframe's pose, for the global-consistency term
    (/root/reference/src/vtgaussian_slam.py:2485-2510,2595-2603)."""
    tab: jnp.ndarray         # (Tp, mpt) int32 indices into the concat
    counts: jnp.ndarray      # (Tp,)
    inv_pos: jnp.ndarray     # (N, s2) positions of TRAINABLE gaussians
    quat: jnp.ndarray        # (4,) base keyframe w2c rotation
    trans: jnp.ndarray       # (3,)
    fixed_fields8: jnp.ndarray  # (n_fixed, 8) frozen field rows


def pack_vals5(params: GaussianParams) -> jnp.ndarray:
    """The mapping-trainable channels as one (N, 5) buffer, in the fused
    splat kernel's row order: [logit_op, log_scale, r, g, b]."""
    return jnp.concatenate(
        [params.logit_opacities, params.log_scales, params.rgb_colors],
        axis=1)


def unpack_vals5(params: GaussianParams, vals5: jnp.ndarray) -> GaussianParams:
    return params.replace(
        logit_opacities=vals5[:, 0:1],
        log_scales=vals5[:, 1:2],
        rgb_colors=vals5[:, 2:5],
    )


@functools.partial(
    jax.jit, static_argnames=("cam", "tile", "span_cap", "max_pairs_per_tile"))
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
) -> KFBinCache:
    from ..ops import geometry as geo

    tiles_x = -(-cam.width // tile)
    tiles_y = -(-cam.height // tile)
    mpt = -(-max_pairs_per_tile // 128) * 128

    q = geo.normalize(cam_quat)
    R = geo.quat_to_rotmat(q)
    means_cam = params.means3d @ R.T + cam_trans
    proj = project_gaussians(means_cam, params.unnorm_rotations,
                             jnp.exp(params.log_scales), params.opacities(),
                             cam, active)
    b = bin_gaussians(proj, tile, span_cap, tiles_x, tiles_y, mpt,
                      with_inverse=True)
    tab, counts = pad_bin_tables(b.tab, b.counts)
    return KFBinCache(tab=tab, counts=counts, inv_pos=b.inv_pos,
                      quat=cam_quat, trans=cam_trans)


@functools.partial(
    jax.jit, static_argnames=("cam", "tile", "span_cap", "max_pairs_per_tile"))
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
    proj = project_gaussians(means_cam, quats, jnp.exp(log_scales),
                             jax.nn.sigmoid(logit_op[:, 0]), cam, act)
    b = bin_gaussians(proj, tile, span_cap, tiles_x, tiles_y, mpt,
                      with_inverse=True)
    tab, counts = pad_bin_tables(b.tab, b.counts)
    from .track_cache import fields8
    return GlobalBinCache(tab=tab, counts=counts,
                          inv_pos=b.inv_pos[n_fixed:],
                          quat=cam_quat, trans=cam_trans,
                          fixed_fields8=fields8(fixed_params))


def _splat(slots8, quat, trans, counts, cam: Camera, chunk: int,
           tile: int = 16) -> RenderResult:
    from ..ops import geometry as geo

    q = geo.normalize(quat)
    R = geo.quat_to_rotmat(q)
    tiles_x = -(-cam.width // tile)
    accum = splat_blend(slots8, R.reshape(9), trans, counts,
                        jnp.zeros((), jnp.int32), cam, tiles_x,
                        max(chunk, 128), jax.default_backend() == "cpu",
                        "vals")
    img = assemble_image(accum, cam, tile)
    return RenderResult(im=img[:3], depth=img[3:4], silhouette=img[4],
                        depth_sq=img[5:6], radii=jnp.zeros((1,), img.dtype))


def render_binned(vals5: jnp.ndarray, means3d: jnp.ndarray,
                  kfc: KFBinCache, cam: Camera,
                  chunk: int = 128) -> RenderResult:
    """Render the trainable section through one keyframe's frozen binning.

    vals5: (N, 5) trainable rows (pack_vals5); means3d: (N, 3) frozen."""
    f8 = jnp.concatenate([jax.lax.stop_gradient(means3d), vals5], axis=1)
    slots = slots8_gather(f8, kfc.tab, kfc.inv_pos)        # (Tp, 8, mpt)
    return _splat(slots, kfc.quat, kfc.trans, kfc.counts, cam, chunk)


def render_binned_global(vals5: jnp.ndarray, means3d: jnp.ndarray,
                         gc: GlobalBinCache, cam: Camera,
                         chunk: int = 128) -> RenderResult:
    """Render [frozen prefix + trainable] through the global binning.

    The table indexes the concat [frozen prefix; trainable section]; the
    backward of slots8_gather returns zeros for the prefix rows (inv_pos
    covers only the trainable tail), so gradients stay scatter-free and
    flow to the trainable section only."""
    f8 = jnp.concatenate([
        jax.lax.stop_gradient(gc.fixed_fields8),
        jnp.concatenate([jax.lax.stop_gradient(means3d), vals5], axis=1),
    ], axis=0)
    slots = slots8_gather(f8, gc.tab, gc.inv_pos)
    return _splat(slots, gc.quat, gc.trans, gc.counts, cam, chunk)


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
      - per phase, the `refresh` stalest other slots (built when the section
        had fewer gaussians than now) are rebuilt, so densified gaussians
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

    def __init__(self, max_slots: int = 64, refresh: int = 1):
        self.max_slots = max_slots
        self.refresh = refresh
        self.reset()

    def reset(self):
        self.stack = None          # KFBinCache with leading (W,) axis
        self.key = None            # (capacity, mpt, H, W_img, W)
        self.ring_of_slot = []     # cache slot -> ring index
        self.built_n = []          # n_active at build time per slot
        self.poses = {}            # ring index -> (quat np, trans np)

    def slot_ids_array(self, W: int):
        ids = list(self.ring_of_slot) + [0] * (W - len(self.ring_of_slot))
        return jnp.asarray(ids, jnp.int32), len(self.ring_of_slot)

    def _build(self, params, active, ring_idx, cam, span_cap, mpt):
        quat, trans = self.poses[ring_idx]
        return build_kf_cache(params, active, jnp.asarray(quat),
                              jnp.asarray(trans), cam, span_cap=span_cap,
                              max_pairs_per_tile=mpt)

    def _write(self, slot, kfc_one):
        self.stack = jax.tree.map(
            lambda st, v: _set_slot(st, slot, v), self.stack, kfc_one)

    def update(self, params, active, n_active: int, ring_idx: int,
               quat, trans, cam, span_cap: int, mpt: int, W: int):
        """Ensure caches exist for every registered section keyframe (the
        just-tracked frame plus any re-seeded after resume/re-bucket) and
        refresh stale slots. Returns (stack, slot_ids, count)."""
        self.poses[ring_idx] = (quat, trans)
        key = (params.means3d.shape[0], mpt, cam.height, cam.width, W)
        if self.key != key:
            # shape re-bucket: drop the stack, keep poses; every registered
            # keyframe is re-admitted below (rare burst)
            self.stack = None
            self.ring_of_slot = []
            self.built_n = []
            self.key = key

        missing = [r for r in sorted(self.poses)
                   if r not in self.ring_of_slot]
        for r in missing:
            built = self._build(params, active, r, cam, span_cap, mpt)
            if self.stack is None:
                self.stack = jax.tree.map(
                    lambda v: jnp.zeros((W,) + v.shape, v.dtype), built)
            self._admit_slot(r, built, n_active, W)

        # refresh the stalest slots (missed densifications)
        for _ in range(self.refresh):
            stale = [i for i, b in enumerate(self.built_n)
                     if b < n_active and self.ring_of_slot[i] != ring_idx]
            if not stale:
                break
            slot = min(stale, key=lambda i: self.built_n[i])
            self._write(slot, self._build(
                params, active, self.ring_of_slot[slot], cam, span_cap, mpt))
            self.built_n[slot] = n_active

        slot_ids, count = self.slot_ids_array(W)
        return self.stack, slot_ids, count

    def _admit_slot(self, ring_idx, built, n_active, W):
        if len(self.ring_of_slot) < W:
            slot = len(self.ring_of_slot)
            self.ring_of_slot.append(ring_idx)
            self.built_n.append(n_active)
        else:
            # evict the oldest non-base slot (ring 0 pinned: the global term
            # and reference sampling both want the base frame available)
            candidates = [i for i, r in enumerate(self.ring_of_slot)
                          if r != 0] or list(range(len(self.ring_of_slot)))
            slot = min(candidates, key=lambda i: self.ring_of_slot[i])
            self.poses.pop(self.ring_of_slot[slot], None)
            self.ring_of_slot[slot] = ring_idx
            self.built_n[slot] = n_active
        self._write(slot, built)


def dummy_global_cache(params: GaussianParams) -> GlobalBinCache:
    """Tiny placeholder passed to map_frame_binned when use_global is False
    (the static flag prunes the branch; shapes only key the jit cache)."""
    from ..ops.rasterizer.pallas_splat import BLOCK
    f32 = params.means3d.dtype
    return GlobalBinCache(
        tab=jnp.zeros((BLOCK, 128), jnp.int32),
        counts=jnp.zeros((BLOCK,), jnp.int32),
        inv_pos=jnp.full((params.means3d.shape[0], 1), -1, jnp.int32),
        quat=jnp.asarray([1.0, 0.0, 0.0, 0.0], f32),
        trans=jnp.zeros((3,), f32),
        fixed_fields8=jnp.zeros((1, 8), f32),
    )
