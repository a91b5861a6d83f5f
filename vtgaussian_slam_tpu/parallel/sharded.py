"""Multi-chip scale-out of the render/optimize path.

The reference is strictly single-GPU (SURVEY.md 2.9b: no torch.distributed /
NCCL anywhere) — this module is a NEW design, not a port. Work is laid out
over a 1-D `jax.sharding.Mesh` axis "px":

  - The alpha-compositing stage — the dominant cost, O(tiles x pairs x
    pixels) — is SHARDED OVER IMAGE TILES via GSPMD sharding constraints
    inside the single-chip `render_tiled` (ops/rasterizer/tiled.py,
    `tile_sharding=`). Each device blends its tile shard; numerics are
    bit-identical to single-chip because it IS the single-chip code.
  - Projection + binning (O(N) and an O(N log N) sort over small int/float
    records) stay replicated — they are bandwidth-trivial next to the blend.
  - Loss reductions over the sharded image and gradient flow back to the
    replicated Gaussian parameters are partitioned by XLA; the backward
    scatter-add over Gaussians becomes a reduce over ICI (the TPU analogue
    of the CUDA kernel's atomics).

Collectives ride the mesh axis (ICI on a pod slice); nothing here touches
DCN. See tests/test_parallel.py for 8-virtual-device equivalence checks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..models.gaussians import GaussianParams
from ..ops import geometry as geo
from ..ops.camera import Camera
from ..ops.rasterizer import render_tiled

AXIS = "px"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def sharded_render(
    means_cam: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    cam: Camera,
    mesh: Mesh,
    active: jnp.ndarray | None = None,
    **raster_kwargs,
) -> jnp.ndarray:
    """Render with the compositing stage sharded over `mesh`. Returns the
    full (C, H, W) image (replicated)."""
    img, _ = render_tiled(means_cam, quats, scales, opacities, colors, cam,
                          active, tile_sharding=(mesh, AXIS), **raster_kwargs)
    return img


def _render6(params: GaussianParams, active, quat, trans, cam, mesh,
             raster_kwargs):
    q = geo.normalize(quat)
    R = geo.quat_to_rotmat(q)
    means_c = params.means3d @ R.T + trans
    z = means_c[:, 2]
    colors6 = jnp.concatenate(
        [params.rgb_colors, jnp.stack([z, jnp.ones_like(z), z * z], -1)], 1)
    img, _ = render_tiled(means_c, params.unnorm_rotations, params.scales3(),
                          params.opacities(), colors6, cam, active,
                          tile_sharding=(mesh, AXIS), **dict(raster_kwargs))
    return img


@functools.partial(
    jax.jit, static_argnames=("cam", "mesh", "raster_kwargs", "lr_quat",
                              "lr_trans"))
def sharded_tracking_step(
    params: GaussianParams,
    active: jnp.ndarray,
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    gt_color: jnp.ndarray,
    gt_depth: jnp.ndarray,
    cam: Camera,
    mesh: Mesh,
    raster_kwargs: tuple = (),
    lr_quat: float = 4e-4,
    lr_trans: float = 2e-3,
):
    """One sharded tracking SGD step (silhouette-masked sum losses)."""

    def loss_fn(quat, trans):
        img = _render6(params, active, quat, trans, cam, mesh, raster_kwargs)
        im, depth, sil = img[:3], img[3:4], img[4]
        m = (gt_depth > 0) & (sil > 0.5)[None]
        return (0.5 * jnp.sum(jnp.abs(gt_color - im) * m)
                + 0.025 * jnp.sum(jnp.abs(gt_depth - depth) * m))

    loss, (gq, gt_) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        cam_quat, cam_trans)
    return loss, cam_quat - lr_quat * gq, cam_trans - lr_trans * gt_


@functools.partial(
    jax.jit, static_argnames=("cam", "mesh", "raster_kwargs", "lr"))
def sharded_mapping_step(
    params: GaussianParams,
    active: jnp.ndarray,
    cam_quat: jnp.ndarray,
    cam_trans: jnp.ndarray,
    gt_color: jnp.ndarray,
    gt_depth: jnp.ndarray,
    cam: Camera,
    mesh: Mesh,
    raster_kwargs: tuple = (),
    lr: float = 1e-3,
):
    """One sharded mapping SGD step on Gaussian attributes; gradients w.r.t.
    the replicated parameters reduce over the mesh automatically."""

    def loss_fn(rgb, logit_op, log_sc):
        p = GaussianParams(
            means3d=params.means3d, rgb_colors=rgb,
            unnorm_rotations=params.unnorm_rotations,
            logit_opacities=logit_op, log_scales=log_sc)
        img = _render6(p, active, cam_quat, cam_trans, cam, mesh,
                       raster_kwargs)
        im, depth = img[:3], img[3:4]
        m = gt_depth > 0
        n = jnp.maximum(jnp.sum(m), 1)
        return (jnp.sum(jnp.abs(gt_color - im) * m)
                + jnp.sum(jnp.abs(gt_depth - depth) * m)) / n

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
        params.rgb_colors, params.logit_opacities, params.log_scales)
    new = GaussianParams(
        means3d=params.means3d,
        rgb_colors=params.rgb_colors - lr * grads[0],
        unnorm_rotations=params.unnorm_rotations,
        logit_opacities=params.logit_opacities - lr * grads[1],
        log_scales=params.log_scales - lr * grads[2],
    )
    return loss, new
