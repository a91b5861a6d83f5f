"""View-tied Gaussian section state as fixed-capacity pytrees.

TPU-native redesign of the reference's per-section `params`/`variables` dicts
(/root/reference/src/vtgaussian_slam.py:132-177, SURVEY.md 2.6/2.15):

- The reference grows tensors dynamically on densification
  (`torch.cat`, :801-808). XLA wants static shapes, so each section is a
  capacity-padded buffer with an `n_active` count; densification scatters new
  Gaussians into the padded tail inside jit, and the host re-buckets (pads to
  the next capacity quantum) only when a buffer would overflow — recompiles
  stay rare.
- The camera trajectory lives once per SLAM run as (T, 4)+(T, 3) arrays
  (the reference stores `[1, 4, T]` copies inside every section and syncs
  them; we materialize per-section copies only for `params_ls.npy` export).

Parameter semantics match the reference exactly:
  means3D (N,3); rgb_colors (N,3); unnorm_rotations (N,4) wxyz, init identity;
  logit_opacities (N,1), init 0 (sigmoid -> 0.5); log_scales (N,1|3), init
  log(sqrt(mean3_sq_dist)) (:146-148).
"""
from __future__ import annotations

import functools as _functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

DEFAULT_CAPACITY_QUANTUM = 1 << 15  # 32768


@struct.dataclass
class GaussianParams:
    means3d: jnp.ndarray           # (cap, 3)
    rgb_colors: jnp.ndarray        # (cap, 3)
    unnorm_rotations: jnp.ndarray  # (cap, 4)
    logit_opacities: jnp.ndarray   # (cap, 1)
    log_scales: jnp.ndarray        # (cap, 1) isotropic | (cap, 3) anisotropic

    @property
    def capacity(self) -> int:
        return self.means3d.shape[0]

    @property
    def isotropic(self) -> bool:
        return self.log_scales.shape[1] == 1

    def scales3(self) -> jnp.ndarray:
        """Post-exp scales broadcast to 3 axes (isotropic tiling,
        parity: /root/reference/utils/slam_helpers.py:129-132)."""
        s = jnp.exp(self.log_scales)
        return jnp.broadcast_to(s, (s.shape[0], 3)) if s.shape[1] == 1 else s

    def opacities(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.logit_opacities[:, 0])


@struct.dataclass
class GaussianVars:
    """Side-state mirroring the reference `variables` dict (:172-175)."""
    max_2d_radius: jnp.ndarray       # (cap,)
    means2d_grad_accum: jnp.ndarray  # (cap,)
    denom: jnp.ndarray               # (cap,)
    timestep: jnp.ndarray            # (cap,)
    scene_radius: jnp.ndarray        # scalar


@struct.dataclass
class Section:
    params: GaussianParams
    vars: GaussianVars
    n_active: jnp.ndarray  # scalar int32

    @property
    def capacity(self) -> int:
        return self.params.capacity

    def active_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.n_active


@struct.dataclass
class CameraTrajectory:
    quats: jnp.ndarray   # (T, 4) unnormalized wxyz; w2c rotation
    trans: jnp.ndarray   # (T, 3) w2c translation

    @classmethod
    def create(cls, num_frames: int, dtype=jnp.float32) -> "CameraTrajectory":
        q = jnp.zeros((num_frames, 4), dtype).at[:, 0].set(1.0)
        return cls(quats=q, trans=jnp.zeros((num_frames, 3), dtype))

    def w2c(self, t) -> jnp.ndarray:
        from ..ops import geometry as geo
        return geo.pose_to_w2c(geo.normalize(self.quats[t]), self.trans[t])


def round_capacity(n: int, quantum: int = DEFAULT_CAPACITY_QUANTUM) -> int:
    """Capacity bucket for n gaussians: a GEOMETRIC ladder (x1.25 steps,
    quantum-aligned) rather than the next quantum multiple.

    Every distinct capacity is a fresh XLA shape, and the binning builders
    (core/map_cache.build_kf_cache / build_global_cache) cost ~45-60 s of
    compile each at the Replica room0 working set — additive 32k steps made
    nearly every section boundary a novel shape (measured ~130 s of
    recompiles per boundary). The ladder bounds the distinct capacities a
    run can see to ~log1.25(N/quantum) values shared by ALL sections (and by
    the fixed-section concats), so compiles amortize across sections and
    across runs via the persistent cache. Worst-case padding waste is 25%;
    padded rows cost only row-bound gather/Adam time, far below the compile
    tax they replace."""
    cap = quantum
    while cap < n:
        cap = -(-int(cap * 1.25) // quantum) * quantum
    return cap


def init_section(
    points: jnp.ndarray,          # (M, 3) world-frame back-projected points
    colors: jnp.ndarray,          # (M, 3) in [0, 1]
    mean3_sq_dist: jnp.ndarray,   # (M,)
    n_valid,                      # scalar or int: first n_valid rows are real
    capacity: int,
    timestep: float,
    scene_radius,
    isotropic: bool = True,
) -> Section:
    """Build a capacity-padded Section from a (possibly padded) point cloud.

    Parity: `initialize_params` (/root/reference/src/vtgaussian_slam.py:132-177)
    + timestep stamping (:807) + scene radius (:259).
    """
    M = points.shape[0]
    assert capacity >= M, (capacity, M)
    f32 = points.dtype
    pad = capacity - M

    def padded(x, value=0.0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=value)

    log_scales = 0.5 * jnp.log(jnp.maximum(mean3_sq_dist, 1e-20))[:, None]
    if not isotropic:
        log_scales = jnp.tile(log_scales, (1, 3))
    params = GaussianParams(
        means3d=padded(points),
        rgb_colors=padded(colors),
        unnorm_rotations=padded(
            jnp.tile(jnp.array([[1.0, 0, 0, 0]], f32), (M, 1))),
        logit_opacities=padded(jnp.zeros((M, 1), f32)),
        log_scales=padded(log_scales),
    )
    zeros = jnp.zeros((capacity,), f32)
    vars_ = GaussianVars(
        max_2d_radius=zeros,
        means2d_grad_accum=zeros,
        denom=zeros,
        timestep=padded(jnp.full((M,), timestep, f32)),
        scene_radius=jnp.asarray(scene_radius, f32),
    )
    return Section(params=params, vars=vars_,
                   n_active=jnp.asarray(n_valid, jnp.int32))


def repad_section(section: Section, new_capacity: int) -> Section:
    """Grow (or shrink to >= n_active) a section's capacity. Host-side."""
    cap = section.capacity
    assert new_capacity >= int(section.n_active), (
        "repad below n_active would silently truncate live gaussians")
    if new_capacity == cap:
        return section

    def repad(x):
        if x.ndim == 0 or x.shape[0] != cap:
            return x
        if new_capacity > cap:
            return jnp.pad(x, ((0, new_capacity - cap),) + ((0, 0),) * (x.ndim - 1))
        return x[:new_capacity]

    return Section(
        params=jax.tree.map(repad, section.params),
        vars=jax.tree.map(repad, section.vars),
        n_active=section.n_active,
    )


@_functools.partial(jax.jit, static_argnames=("capacity",))
def _concat_active(parts: tuple, sizes: jnp.ndarray, capacity: int):
    """Concatenate the ACTIVE prefixes of ladder-capacity buffers into one
    (capacity, ...) buffer, zero-padded past the total — with shapes that
    depend only on the capacity ladder, never on exact active counts.

    The naive `concatenate([p[:size] ...])` bakes every active count into
    an op shape, so each section boundary compiled ~10 novel eager ops
    forever (measured ~15 compiles / ~0.5 s per boundary on the TPU). Here
    each full-capacity buffer is DMA'd at its dynamic offset; later writes
    overwrite the previous section's inactive tail, and a final iota mask
    zeroes everything past the dynamic total. The scratch buffer length
    guarantees no dynamic_update_slice start ever clamps: the last write
    starts at total - sizes[-1] <= sum(caps[:-1])."""
    scratch = max(sum(p.shape[0] for p in parts), capacity)
    buf = jnp.zeros((scratch,) + parts[0].shape[1:], parts[0].dtype)
    off = jnp.zeros((), jnp.int32)
    for i, p in enumerate(parts):
        buf = jax.lax.dynamic_update_slice(
            buf, p.astype(buf.dtype), (off,) + (0,) * (p.ndim - 1))
        off = off + sizes[i]
    out = buf[:capacity]
    j = jnp.arange(capacity, dtype=jnp.int32)
    keep = (j < off).reshape((capacity,) + (1,) * (out.ndim - 1))
    return jnp.where(keep, out, 0)


def concat_sections(sections: Sequence[Section], capacity: int | None = None,
                    quantum: int = DEFAULT_CAPACITY_QUANTUM) -> tuple[Section, list[int]]:
    """Fuse sections into one trainable buffer (active parts, back to back).

    Parity: `concat_keyframes_params_base_frame`
    (/root/reference/src/vtgaussian_slam.py:900-941). Returns the fused
    Section and per-section active sizes (for splitting back). `scene_radius`
    comes from the LAST section (:939). Host-side (shapes change).
    """
    sizes = [int(s.n_active) for s in sections]
    total = sum(sizes)
    if capacity is None:
        capacity = round_capacity(total, quantum)

    sizes_dev = jnp.asarray(sizes, jnp.int32)

    def cat(field_fn):
        return _concat_active(
            tuple(field_fn(s) for s in sections), sizes_dev, capacity)

    params = GaussianParams(
        means3d=cat(lambda s: s.params.means3d),
        rgb_colors=cat(lambda s: s.params.rgb_colors),
        unnorm_rotations=cat(lambda s: s.params.unnorm_rotations),
        logit_opacities=cat(lambda s: s.params.logit_opacities),
        log_scales=cat(lambda s: s.params.log_scales),
    )
    vars_ = GaussianVars(
        max_2d_radius=cat(lambda s: s.vars.max_2d_radius),
        means2d_grad_accum=cat(lambda s: s.vars.means2d_grad_accum),
        denom=cat(lambda s: s.vars.denom),
        timestep=cat(lambda s: s.vars.timestep),
        scene_radius=sections[-1].vars.scene_radius,
    )
    fused = Section(params=params, vars=vars_,
                    n_active=jnp.asarray(total, jnp.int32))
    return fused, sizes


def split_section(fused: Section, sizes: Sequence[int],
                  originals: Sequence[Section]) -> list[Section]:
    """Split an optimized fused buffer back into the per-section stores.

    Parity: `update_params_ls`/`update_variables_ls`
    (/root/reference/src/vtgaussian_slam.py:980-1020). Each original keeps its
    own capacity; only the active slice is overwritten.
    """
    out = []
    off = 0
    for size, orig in zip(sizes, originals):
        cap = orig.capacity

        def take(fx, ox):
            sl = jax.lax.dynamic_slice_in_dim(fx, off, size, axis=0)
            return jax.lax.dynamic_update_slice_in_dim(ox, sl, 0, axis=0)

        params = GaussianParams(
            means3d=take(fused.params.means3d, orig.params.means3d),
            rgb_colors=take(fused.params.rgb_colors, orig.params.rgb_colors),
            unnorm_rotations=take(fused.params.unnorm_rotations,
                                  orig.params.unnorm_rotations),
            logit_opacities=take(fused.params.logit_opacities,
                                 orig.params.logit_opacities),
            log_scales=take(fused.params.log_scales, orig.params.log_scales),
        )
        vars_ = GaussianVars(
            max_2d_radius=take(fused.vars.max_2d_radius, orig.vars.max_2d_radius),
            means2d_grad_accum=take(fused.vars.means2d_grad_accum,
                                    orig.vars.means2d_grad_accum),
            denom=take(fused.vars.denom, orig.vars.denom),
            timestep=take(fused.vars.timestep, orig.vars.timestep),
            scene_radius=orig.vars.scene_radius,
        )
        out.append(Section(params=params, vars=vars_, n_active=orig.n_active))
        off += size
    return out


@_functools.partial(jax.jit, donate_argnums=(0,))
def append_gaussians(
    section: Section,
    new_points: jnp.ndarray,       # (M, 3) padded candidate points
    new_colors: jnp.ndarray,       # (M, 3)
    new_mean3_sq_dist: jnp.ndarray,  # (M,)
    keep: jnp.ndarray,             # (M,) bool — which candidates are real
    timestep,
) -> Section:
    """Scatter-append new Gaussians into the padded tail, as ONE jit with
    the section buffers DONATED — eager dispatch re-allocated every (cap, .)
    buffer per densify call (~100 MB of copies per frame at room0 scale);
    donation lets XLA scatter in place. Callers rebind the returned Section
    and must not reuse the argument.

    Parity: densification insert (/root/reference/src/vtgaussian_slam.py:798-808)
    including the stat resets: `means2D_gradient_accum`, `denom`,
    `max_2D_radius` are zeroed for ALL Gaussians on insert (:804-806).
    The caller guarantees n_active + sum(keep) <= capacity (host re-buckets
    beforehand using the candidate count).
    """
    cap = section.capacity
    n0 = section.n_active
    # destination slot for each kept candidate
    dest = n0 + jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, dest, cap)  # dropped -> out-of-bounds (XLA drops)
    n_new = jnp.sum(keep.astype(jnp.int32))

    def scat(buf, val):
        return buf.at[dest].set(val, mode="drop")

    f32 = new_points.dtype
    M = new_points.shape[0]
    log_scales = 0.5 * jnp.log(jnp.maximum(new_mean3_sq_dist, 1e-20))[:, None]
    if section.params.log_scales.shape[1] == 3:
        log_scales = jnp.tile(log_scales, (1, 3))
    params = GaussianParams(
        means3d=scat(section.params.means3d, new_points),
        rgb_colors=scat(section.params.rgb_colors, new_colors),
        unnorm_rotations=scat(section.params.unnorm_rotations,
                              jnp.tile(jnp.array([[1.0, 0, 0, 0]], f32), (M, 1))),
        logit_opacities=scat(section.params.logit_opacities, jnp.zeros((M, 1), f32)),
        log_scales=scat(section.params.log_scales, log_scales),
    )
    zeros = jnp.zeros((cap,), f32)
    vars_ = GaussianVars(
        max_2d_radius=zeros,
        means2d_grad_accum=zeros,
        denom=zeros,
        timestep=scat(section.vars.timestep, jnp.full((M,), timestep, f32)),
        scene_radius=section.vars.scene_radius,
    )
    return Section(params=params, vars=vars_, n_active=n0 + n_new)


def section_to_numpy_params(section: Section, traj: CameraTrajectory) -> dict:
    """Export one section as a reference-format params dict for params_ls.npy
    (/root/reference/src/vtgaussian_slam.py:2870-2876): per-Gaussian arrays
    cropped to n_active, camera trajectory as [1, 4, T]/[1, 3, T]."""
    n = int(section.n_active)
    return {
        "means3D": np.asarray(section.params.means3d[:n]),
        "rgb_colors": np.asarray(section.params.rgb_colors[:n]),
        "unnorm_rotations": np.asarray(section.params.unnorm_rotations[:n]),
        "logit_opacities": np.asarray(section.params.logit_opacities[:n]),
        "log_scales": np.asarray(section.params.log_scales[:n]),
        "cam_unnorm_rots": np.asarray(traj.quats).T[None],  # (1, 4, T)
        "cam_trans": np.asarray(traj.trans).T[None],        # (1, 3, T)
    }


def section_from_numpy_params(p: dict, quantum: int = DEFAULT_CAPACITY_QUANTUM,
                              timestep: float = 0.0) -> tuple[Section, CameraTrajectory]:
    """Load a reference-format params dict back into a Section (eval_mode)."""
    n = p["means3D"].shape[0]
    cap = round_capacity(n, quantum)
    pad = cap - n

    def pp(x):
        x = jnp.asarray(np.asarray(x), jnp.float32)
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    params = GaussianParams(
        means3d=pp(p["means3D"]),
        rgb_colors=pp(p["rgb_colors"]),
        unnorm_rotations=pp(p["unnorm_rotations"]),
        logit_opacities=pp(p["logit_opacities"]),
        log_scales=pp(p["log_scales"]),
    )
    zeros = jnp.zeros((cap,), jnp.float32)
    vars_ = GaussianVars(
        max_2d_radius=zeros, means2d_grad_accum=zeros, denom=zeros,
        timestep=jnp.full((cap,), timestep, jnp.float32),
        scene_radius=jnp.asarray(1.0, jnp.float32),
    )
    traj = CameraTrajectory(
        quats=jnp.asarray(np.asarray(p["cam_unnorm_rots"])[0].T, jnp.float32),
        trans=jnp.asarray(np.asarray(p["cam_trans"])[0].T, jnp.float32),
    )
    return Section(params=params, vars=vars_,
                   n_active=jnp.asarray(n, jnp.int32)), traj
