"""Profile the tracking-iteration component costs on the real chip.

Breakdown of one fused tracking iteration (~23 ms at round-3 bench):
  cached fwd render, fwd+loss, value_and_grad (fwd+loss+pose bwd),
  p2p candidate metric, full track_loop body amortized.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vtgaussian_slam_tpu.utils.runtime import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from vtgaussian_slam_tpu.core.losses import Frame, LossConfig, loss_from_render
from vtgaussian_slam_tpu.core.p2p import make_p2p_target, point2plane_metric
from vtgaussian_slam_tpu.core.track_cache import build_track_cache, render_cached
from vtgaussian_slam_tpu.core.tracking import (TrackingConfig, init_track_state,
                                               track_loop)
from vtgaussian_slam_tpu.datasets.synthetic import SyntheticRoomDataset
from vtgaussian_slam_tpu.models import gaussians as G
from vtgaussian_slam_tpu.ops import geometry as geo
from vtgaussian_slam_tpu.ops.camera import setup_camera
from vtgaussian_slam_tpu.ops.rasterizer.pallas_splat import pick_walk_chunk


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1e3


def main():
    H, W = 680, 1200
    ds = SyntheticRoomDataset(num_frames=3, height=H, width=W, seed=0,
                              motion_scale=0.05)
    cam = setup_camera(W, H, ds.scaled_intrinsics()[:3, :3])
    color, depth, _, pose = ds[0]
    frame0 = Frame(color=jnp.asarray(np.transpose(color, (2, 0, 1)) / 255.0,
                                     jnp.float32),
                   depth=jnp.asarray(np.transpose(depth, (2, 0, 1)),
                                     jnp.float32))
    w2c0 = np.linalg.inv(np.asarray(pose, np.float64))
    from vtgaussian_slam_tpu.core.densify import first_frame_pointcloud
    pts, cols, msq, keep = first_frame_pointcloud(frame0, cam)
    n = int(jnp.sum(keep))
    cap = G.round_capacity(n, 1 << 17)
    order = jnp.argsort(~keep)
    sec = G.init_section(pts[order][:cap], cols[order][:cap],
                         msq[order][:cap], n, cap, 0.0, 1.0)
    active = sec.active_mask()
    q, tr = geo.w2c_to_pose(jnp.asarray(w2c0, jnp.float32))
    q = jnp.asarray(q); tr = jnp.asarray(tr)

    cache = build_track_cache(sec.params, active, q, tr, cam, span_cap=2,
                              max_pairs_per_tile=512)
    chunk = pick_walk_chunk(cache.slots8.shape[2])
    Tp, _, mpt = cache.slots8.shape
    print(f"N={n} cap={cap} Tp={Tp} mpt={mpt} chunk={chunk}")

    f1 = jax.jit(lambda q, t: render_cached(cache, q, t, cam, chunk=chunk))
    r = f1(q, tr)
    print(f"cached fwd render:   {timeit(f1, q, tr):7.2f} ms")

    lcfg = LossConfig(tracking=True, use_sil_for_loss=True,
                      ignore_outlier_depth_loss=True, adaptive_sil=True,
                      im_weight=0.5, depth_weight=1.0,
                      backend_kwargs=tuple(sorted(dict(
                          span_cap=2, max_pairs_per_tile=512, chunk=chunk,
                          use_pallas=True).items())))
    sil = jnp.asarray(0.5, jnp.float32)
    first = jnp.asarray(True)
    aux = jnp.ones((1, H, W), bool)

    def loss_fn(q, t):
        rr = render_cached(cache, q, t, cam, chunk=chunk)
        return loss_from_render(rr, frame0, lcfg, sil, first, aux).loss

    f2 = jax.jit(loss_fn)
    print(f"fwd + loss:          {timeit(f2, q, tr):7.2f} ms")

    f3 = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    print(f"value_and_grad:      {timeit(f3, q, tr):7.2f} ms")

    p2p = make_p2p_target(frame0.depth, jnp.asarray(cam.intrinsics,
                                                    jnp.float32),
                          jnp.asarray(w2c0, jnp.float32))
    w2c = jnp.asarray(w2c0, jnp.float32)
    f4 = jax.jit(lambda w2c: point2plane_metric(
        p2p, frame0.depth, jnp.asarray(cam.intrinsics, jnp.float32), w2c,
        method="sum"))
    print(f"p2p metric:          {timeit(f4, w2c):7.2f} ms")

    tcfg = TrackingConfig(num_iters=20, lr_quat=4e-4, lr_trans=2e-3,
                          loss_cfg=lcfg, metric="p2p", p2p_method="sum")
    state = init_track_state(q, tr, jnp.asarray(0.5, jnp.float32))

    def loop(state):
        return track_loop(
            lambda qq, tt: render_cached(cache, qq, tt, cam, chunk=chunk),
            state, frame0, aux, p2p, cam, tcfg)

    f5 = jax.jit(loop)
    ms = timeit(f5, state, n=5, warmup=2)
    print(f"track_loop 20 iters: {ms:7.2f} ms  ({ms / 20:.2f} ms/iter)")


if __name__ == "__main__":
    main()
