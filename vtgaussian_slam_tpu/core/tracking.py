"""Camera tracking: the whole per-frame optimization loop as ONE jit.

TPU redesign of the reference tracking loop
(/root/reference/src/vtgaussian_slam.py:1666-2277). The reference runs a
Python while-loop doing per-iteration CUDA renders, host-side `.item()`
syncs, and (at section boundaries) Open3D CPU round-trips. Here the full
`num_iters` loop — loss+grad through the rasterizer, a fresh per-frame Adam
on (cam quat, cam trans), per-iteration candidate selection by loss or the
jit-resident point-to-plane metric — runs inside a single `lax.fori_loop`
with zero host syncs.

Reference semantics kept:
- fresh Adam per frame, only camera lrs nonzero (:180-187, :1678)
- candidate pose = post-step pose; metric is the PRE-step loss on
  non-boundary frames, the post-step overlap point-to-plane distance on
  boundary frames (:1893-1970, :2117-2199)
- replica adaptive silhouette threshold chosen at iteration 0 and reused
  (:472-510), carried through the loop as a traced scalar
- final (im, depth) losses returned for the `use_depth_loss_thres`
  iteration-doubling decision, made on host between jit calls (:2218-2229)
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..models.gaussians import GaussianParams
from ..ops.camera import Camera
from .losses import Frame, LossConfig, compute_loss
from .p2p import P2PTarget, point2plane_metric


class TrackingConfig(NamedTuple):
    """Static per-phase tracking configuration."""
    num_iters: int
    lr_quat: float
    lr_trans: float
    metric: str            # "loss" | "p2p"
    p2p_method: str        # "sum" | "max" | "max100"
    loss_cfg: LossConfig   # tracking=True inside


@struct.dataclass
class TrackState:
    quat: jnp.ndarray
    trans: jnp.ndarray
    m: jnp.ndarray         # Adam first moment, (7,) = [quat, trans]
    v: jnp.ndarray         # Adam second moment
    count: jnp.ndarray
    best_quat: jnp.ndarray
    best_trans: jnp.ndarray
    min_metric: jnp.ndarray
    min_loss: jnp.ndarray      # min over iterations of the raw loss
    sil_thres: jnp.ndarray
    im_loss: jnp.ndarray       # last-iteration losses
    depth_loss: jnp.ndarray


def init_track_state(quat: jnp.ndarray, trans: jnp.ndarray,
                     sil_thres: float) -> TrackState:
    f32 = quat.dtype
    z7 = jnp.zeros((7,), f32)
    big = jnp.asarray(1e20, f32)
    return TrackState(
        quat=quat, trans=trans, m=z7, v=z7,
        count=jnp.zeros((), jnp.int32),
        best_quat=quat, best_trans=trans,
        min_metric=big, min_loss=big,
        sil_thres=jnp.asarray(sil_thres, f32),
        im_loss=jnp.zeros((), f32), depth_loss=jnp.zeros((), f32),
    )


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def track_frame(
    params: GaussianParams,
    active: jnp.ndarray,
    state: TrackState,
    frame: Frame,
    aux_mask: jnp.ndarray,        # (H, W) bool; all-True when unused
    p2p_target: P2PTarget,
    cam: Camera,
    cfg: TrackingConfig,
) -> tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """Returns (state, im_loss_history, depth_loss_history) — the per-
    iteration loss streams the reference logs to wandb (report_loss).
    The generic (non-cached) path: `track_loop` over `render_slam`."""
    from .losses import render_slam

    def render_fn(quat, trans):
        return render_slam(params, active, quat, trans, cam,
                           dict(cfg.loss_cfg.backend_kwargs))

    return track_loop(render_fn, state, frame, aux_mask, p2p_target, cam, cfg)


def track_loop(render_fn, state: TrackState, frame: Frame,
               aux_mask: jnp.ndarray, p2p_target: P2PTarget, cam: Camera,
               cfg: TrackingConfig):
    """The fused tracking optimization loop over an arbitrary pose-
    differentiable renderer `render_fn(quat, trans) -> RenderResult`.
    Shared by the single-chip cached path (track_frame_cached) and the
    tile-sharded multi-chip path (parallel/engine.py)."""
    from .losses import loss_from_render

    b1, b2, eps = 0.9, 0.999, 1e-8
    lr = jnp.concatenate([
        jnp.full((4,), cfg.lr_quat), jnp.full((3,), cfg.lr_trans)
    ]).astype(state.quat.dtype)

    def loss_fn(quat, trans, sil_thres, is_first):
        r = render_fn(quat, trans)
        out = loss_from_render(r, frame, cfg.loss_cfg, sil_thres, is_first,
                               aux_mask)
        return out.loss, out

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    def body(i, carry):
        s, im_h, d_h = carry
        # the adaptive sil threshold is picked exactly once per FRAME
        # (reference tracking_iteration == 0, :472-510) — s.count carries
        # across continuation calls (rebin segments, iteration doubling),
        # where the loop index i would wrongly re-pick
        (loss, out), (gq, gt) = grad_fn(s.quat, s.trans, s.sil_thres,
                                        s.count == 0)
        g = jnp.concatenate([gq, gt])
        count = s.count + 1
        t = count.astype(loss.dtype)
        m = b1 * s.m + (1 - b1) * g
        v = b2 * s.v + (1 - b2) * g * g
        upd = lr * (m / (1 - b1**t)) / (jnp.sqrt(v / (1 - b2**t)) + eps)
        pose = jnp.concatenate([s.quat, s.trans]) - upd
        new_quat, new_trans = pose[:4], pose[4:]

        if cfg.metric == "loss":
            metric = loss
        else:
            from ..ops import geometry as geo
            w2c = geo.pose_to_w2c(geo.normalize(new_quat), new_trans)
            metric = point2plane_metric(
                p2p_target, frame.depth, jnp.asarray(cam.intrinsics), w2c,
                method=cfg.p2p_method)

        # `better` (not jnp.minimum) so a NaN iteration neither becomes the
        # best candidate nor freezes the minima at NaN forever (the
        # reference's Python `if metric < min:` skips NaN the same way)
        better = metric < s.min_metric
        lower = loss < s.min_loss
        new_state = TrackState(
            quat=new_quat, trans=new_trans, m=m, v=v, count=count,
            best_quat=jnp.where(better, new_quat, s.best_quat),
            best_trans=jnp.where(better, new_trans, s.best_trans),
            min_metric=jnp.where(better, metric, s.min_metric),
            min_loss=jnp.where(lower, loss, s.min_loss),
            sil_thres=out.sil_thres_out,
            im_loss=out.im_loss, depth_loss=out.depth_loss,
        )
        return new_state, im_h.at[i].set(out.im_loss), \
            d_h.at[i].set(out.depth_loss)

    zeros = jnp.zeros((cfg.num_iters,), state.quat.dtype)
    return jax.lax.fori_loop(0, cfg.num_iters, body, (state, zeros, zeros))


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def track_frame_cached(
    cache,                        # core.track_cache.TrackCache
    state: TrackState,
    frame: Frame,
    aux_mask: jnp.ndarray,
    p2p_target: P2PTarget,
    cam: Camera,
    cfg: TrackingConfig,
) -> TrackState:
    """`track_frame` over the frozen-binning renderer (core/track_cache.py):
    per-iteration cost drops to elementwise reprojection + the Pallas blend —
    no pair sort, no record gather."""
    from .track_cache import TrackCache2C, render_cached, render_cached_2c

    from ..ops.rasterizer.pallas_splat import pick_walk_chunk
    if isinstance(cache, TrackCache2C):
        # two-class cache: each class renders as its own kernel call with
        # its own walk chunk (the chunk contract is per pallas_call)
        chunk_d = pick_walk_chunk(cache.slots_d.shape[2])
        chunk_s = pick_walk_chunk(cache.slots_s.shape[2])

        def render_fn(quat, trans):
            return render_cached_2c(cache, quat, trans, cam,
                                    chunk_d=chunk_d, chunk_s=chunk_s)
    else:
        chunk = pick_walk_chunk(cache.slots8.shape[2])

        def render_fn(quat, trans):
            return render_cached(cache, quat, trans, cam, chunk=chunk)

    return track_loop(render_fn, state, frame, aux_mask, p2p_target, cam, cfg)


def probe_loss(params, active, quat, trans, frame, cam, cfg: LossConfig,
               sil_thres: float, aux_mask):
    """Single loss evaluation (no step) — the scannetpp initial-error probe
    (/root/reference/src/vtgaussian_slam.py:1467-1484)."""
    out = compute_loss(params, active, jnp.asarray(quat), jnp.asarray(trans),
                       frame, cam, cfg, jnp.asarray(sil_thres, jnp.float32),
                       jnp.asarray(True), aux_mask)
    return out.im_loss, out.depth_loss
