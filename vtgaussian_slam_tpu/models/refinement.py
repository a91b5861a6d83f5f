"""Gaussian-splatting refinement: opacity pruning and split/clone densify.

Functional reimplementation of the reference's optimizer-surgery machinery
(/root/reference/utils/slam_external.py:100-243): `prune_gaussians`,
`densify` (clone + split), opacity reset, and the screen-gradient statistics
that drive them. These paths are DISABLED in every shipped config
(prune_gaussians=False, use_gaussian_splatting_densification=False,
configs/replica/room0.py:117,128) but are part of the public surface.

TPU redesign: the reference mutates torch.optim.Adam state in place
(cat/remove rows). Here a Section is a fixed-capacity padded buffer, so
"removal" is a stable compaction permutation applied to both the parameters
and the matching AdamState rows, and "insertion" scatters into the padded
tail with zeroed moments — shapes never change under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import quat_to_rotmat
from .gaussians import GaussianParams, GaussianVars, Section
from .optimizer import AdamState


def _inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def _compact(section: Section, opt: AdamState | None, keep: jnp.ndarray):
    """Move kept Gaussians to the buffer front (stable), update n_active.

    Parity: `remove_points` (slam_external.py:139-160) — dropped rows vanish
    from params, optimizer moments, and per-Gaussian variables.
    """
    cap = section.capacity
    keep = keep & section.active_mask()
    perm = jnp.argsort(~keep)  # stable: kept (in order) first
    n_new = jnp.sum(keep.astype(jnp.int32))
    live = jnp.arange(cap) < n_new

    def reorder(x):
        if x.ndim == 0 or x.shape[0] != cap:
            return x
        y = x[perm]
        return jnp.where(live.reshape((-1,) + (1,) * (y.ndim - 1)), y, 0)

    params = jax.tree.map(reorder, section.params)
    vars_ = jax.tree.map(reorder, section.vars)
    vars_ = vars_.replace(scene_radius=section.vars.scene_radius)
    new_sec = Section(params=params, vars=vars_, n_active=n_new)
    if opt is not None:
        opt = AdamState(mu=jax.tree.map(reorder, opt.mu),
                        nu=jax.tree.map(reorder, opt.nu), count=opt.count)
    return new_sec, opt


def prune_gaussians(section: Section, opt: AdamState | None, it: int,
                    prune_dict: dict):
    """Remove low-opacity (and optionally oversized) Gaussians; periodically
    reset opacities. Parity: slam_external.py:167-188."""
    if it > prune_dict["stop_after"]:
        return section, opt
    if it >= prune_dict["start_after"] and it % prune_dict["prune_every"] == 0:
        thresh = (prune_dict["final_removal_opacity_threshold"]
                  if it == prune_dict["stop_after"]
                  else prune_dict["removal_opacity_threshold"])
        to_remove = jax.nn.sigmoid(section.params.logit_opacities[:, 0]) < thresh
        if it >= prune_dict["remove_big_after"]:
            big = jnp.max(jnp.exp(section.params.log_scales), axis=1) > \
                0.1 * section.vars.scene_radius
            to_remove = to_remove | big
        section, opt = _compact(section, opt, ~to_remove)
    if (it > 0 and prune_dict.get("reset_opacities")
            and it % prune_dict["reset_opacities_every"] == 0):
        new_logit = jnp.full_like(section.params.logit_opacities,
                                  _inverse_sigmoid(0.01))
        new_logit = jnp.where(section.active_mask()[:, None], new_logit,
                              section.params.logit_opacities)
        section = section.replace(
            params=section.params.replace(logit_opacities=new_logit))
        if opt is not None:
            # reference zeroes the moments of the reset leaf (:112-113)
            opt = AdamState(
                mu=opt.mu.replace(
                    logit_opacities=jnp.zeros_like(opt.mu.logit_opacities)),
                nu=opt.nu.replace(
                    logit_opacities=jnp.zeros_like(opt.nu.logit_opacities)),
                count=opt.count)
    return section, opt


def accumulate_mean2d_gradient(vars_: GaussianVars, mean2d_grad: jnp.ndarray,
                               seen: jnp.ndarray) -> GaussianVars:
    """Accumulate screen-space positional gradient norms over seen Gaussians.
    Parity: slam_external.py:100-104."""
    norm = jnp.linalg.norm(mean2d_grad[:, :2], axis=-1)
    return vars_.replace(
        means2d_grad_accum=vars_.means2d_grad_accum + jnp.where(seen, norm, 0.0),
        denom=vars_.denom + seen.astype(vars_.denom.dtype),
    )


def densify_split_clone(section: Section, opt: AdamState | None, it: int,
                        densify_dict: dict, rng: jnp.ndarray):
    """Clone small high-gradient Gaussians; split large ones into
    `num_to_split_into` samples with scales shrunk by 1/(0.8 n); then prune
    low-opacity. Parity: slam_external.py:191-243.

    The caller guarantees capacity headroom (grow the bucket before calling:
    worst case n_active * (1 + n) new rows).
    """
    if it > densify_dict["stop_after"]:
        return section, opt
    if not (it >= densify_dict["start_after"]
            and it % densify_dict["densify_every"] == 0):
        return section, opt

    p = section.params
    v = section.vars
    cap = section.capacity
    active = section.active_mask()
    grads = jnp.where(v.denom > 0, v.means2d_grad_accum / v.denom, 0.0)
    thresh = densify_dict["grad_thresh"]
    max_scale = jnp.max(jnp.exp(p.log_scales), axis=1)
    small = max_scale <= 0.01 * v.scene_radius

    to_clone = active & (grads >= thresh) & small
    to_split = active & (grads >= thresh) & (~small)
    n = densify_dict["num_to_split_into"]

    # --- clones: exact copies appended to the tail
    def append(sec_params, ts_buf, src_mask, new_means, new_log_scales,
               n_active):
        dest = n_active + jnp.cumsum(src_mask.astype(jnp.int32)) - 1
        dest = jnp.where(src_mask, dest, cap)

        def scat(buf, val):
            return buf.at[dest].set(val, mode="drop")

        # clamp: rows the capacity-overflow scatter dropped must not be
        # counted active (zero-filled slots would render as live blobs)
        n_new = jnp.minimum(n_active + jnp.sum(src_mask.astype(jnp.int32)),
                            cap)
        return GaussianParams(
            means3d=scat(sec_params.means3d, new_means),
            rgb_colors=scat(sec_params.rgb_colors, p.rgb_colors),
            unnorm_rotations=scat(sec_params.unnorm_rotations,
                                  p.unnorm_rotations),
            logit_opacities=scat(sec_params.logit_opacities, p.logit_opacities),
            log_scales=scat(sec_params.log_scales, new_log_scales),
        ), scat(ts_buf, v.timestep), n_new

    params, timestep, n_active = append(p, v.timestep, to_clone, p.means3d,
                                        p.log_scales, section.n_active)

    # --- splits: n jittered samples from each split Gaussian
    split_log_scales = p.log_scales - jnp.log(0.8 * n)
    R = quat_to_rotmat(p.unnorm_rotations)
    scales3 = jnp.exp(p.log_scales)
    scales3 = jnp.broadcast_to(scales3, (cap, 3)) if scales3.shape[1] == 1 \
        else scales3
    for k in range(n):
        eps = jax.random.normal(jax.random.fold_in(rng, k), (cap, 3))
        offset = jnp.einsum("nij,nj->ni", R, eps * scales3)
        params, timestep, n_active = append(
            params, timestep, to_split, p.means3d + offset,
            split_log_scales, n_active)

    zeros = jnp.zeros((cap,), p.means3d.dtype)
    vars_ = GaussianVars(max_2d_radius=zeros, means2d_grad_accum=zeros,
                         denom=zeros, timestep=timestep,
                         scene_radius=v.scene_radius)
    section = Section(params=params, vars=vars_, n_active=n_active)
    # appended rows keep ZERO Adam moments — the invariant comes from
    # adam_init/_compact zeroing tail slots, not from anything here
    # (cat_params_to_optimizer semantics, slam_external.py:120-140)

    # remove split originals + low-opacity
    thresh_op = (densify_dict["final_removal_opacity_threshold"]
                 if it == densify_dict["stop_after"]
                 else densify_dict["removal_opacity_threshold"])
    low_op = jax.nn.sigmoid(section.params.logit_opacities[:, 0]) < thresh_op
    to_remove = to_split | low_op
    if it >= densify_dict["remove_big_after"]:
        big = jnp.max(jnp.exp(section.params.log_scales), axis=1) > \
            0.1 * section.vars.scene_radius
        to_remove = to_remove | big
    section, opt = _compact(section, opt, ~to_remove)
    return section, opt
