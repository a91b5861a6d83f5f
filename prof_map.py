"""Profile the mapping-iteration component costs on the real chip.

Breakdown targets (one mapping iteration ~55 ms at round-2 end):
  gather_channels (slot gather), fwd kernel, bwd kernel (vals_rows),
  inverse-map gathers, loss computation, Adam.
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

from vtgaussian_slam_tpu.core.losses import Frame, LossConfig
from vtgaussian_slam_tpu.core.map_cache import (build_kf_cache, pack_fields8,
                                                render_binned, splat_binned)
from vtgaussian_slam_tpu.core.mapping import KeyframeBuffer, MappingConfig
from vtgaussian_slam_tpu.datasets.synthetic import SyntheticRoomDataset
from vtgaussian_slam_tpu.models import gaussians as G
from vtgaussian_slam_tpu.ops.camera import setup_camera
from vtgaussian_slam_tpu.ops.rasterizer.binning import gather_channels
from vtgaussian_slam_tpu.ops.rasterizer.pallas_splat import (_bwd_call,
                                                             _fwd_call)


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
    from vtgaussian_slam_tpu.ops import geometry as geo
    pts, cols, msq, keep = first_frame_pointcloud(frame0, cam)
    n = int(jnp.sum(keep))
    cap = G.round_capacity(n, 1 << 17)
    order = jnp.argsort(~keep)
    sec = G.init_section(pts[order][:cap], cols[order][:cap],
                         msq[order][:cap], n, cap, 0.0, 1.0)
    active = sec.active_mask()
    q, tr = geo.w2c_to_pose(jnp.asarray(w2c0, jnp.float32))
    q = jnp.asarray(q); tr = jnp.asarray(tr)

    kfc = build_kf_cache(sec.params, active, q, tr, cam, span_cap=2,
                         max_pairs_per_tile=512)
    f8 = pack_fields8(sec.params)
    Tp, mpt = kfc.tab.shape
    print(f"N={n} cap={cap} Tp={Tp} mpt={mpt} P={Tp*mpt}")

    from vtgaussian_slam_tpu.ops.rasterizer.pallas_splat import pick_walk_chunk
    chunk = pick_walk_chunk(mpt)   # = map_frame_binned's choice
    print(f"walk chunk = {chunk}")
    tiles_x = -(-cam.width // 16)

    # 1. slot gather
    g1 = jax.jit(lambda f8: gather_channels(f8, kfc.tab))
    print(f"gather_channels:     {timeit(g1, f8):7.2f} ms")

    slots = g1(f8)
    R9 = geo.quat_to_rotmat(geo.normalize(q)).reshape(9)

    # 2. fwd kernel
    f2 = jax.jit(lambda s: _fwd_call(s, R9, tr, kfc.counts,
                                     jnp.zeros((), jnp.int32), cam, tiles_x,
                                     chunk, False))
    print(f"fwd kernel:          {timeit(f2, slots):7.2f} ms")
    accum = f2(slots)

    # 3. bwd kernel vals_rows
    g = jnp.ones_like(accum)
    f3 = jax.jit(lambda s: _bwd_call(s, R9, tr, kfc.counts,
                                     jnp.zeros((), jnp.int32), accum, g, cam,
                                     tiles_x, chunk, False, "vals_rows"))
    print(f"bwd kernel (rows):   {timeit(f3, slots):7.2f} ms")
    grad_rows = f3(slots)

    # 4. inverse-map gathers
    from vtgaussian_slam_tpu.ops.rasterizer.binning import apply_slot_inverse
    inv = kfc.inv
    def inv_gather(grad_rows):
        return apply_slot_inverse(grad_rows.reshape(Tp * mpt, 8), inv)
    f4 = jax.jit(inv_gather)
    print(f"inverse gathers:     {timeit(f4, grad_rows):7.2f} ms")

    # 5. full fwd render + loss value_and_grad (the real iteration minus Adam)
    cfg = LossConfig(tracking=False, use_sil_for_loss=False,
                     ignore_outlier_depth_loss=False, adaptive_sil=False,
                     im_weight=1.0,
                     depth_weight=1.0,
                     backend_kwargs=tuple(sorted(dict(
                         span_cap=2, max_pairs_per_tile=512, chunk=128,
                         use_pallas=True).items())))
    from vtgaussian_slam_tpu.core.losses import loss_from_render

    def loss_fn(f8):
        r = render_binned(f8, kfc, cam, chunk)
        return loss_from_render(r, frame0, cfg, jnp.asarray(0.5, f8.dtype),
                                jnp.asarray(False)).loss
    f5 = jax.jit(jax.value_and_grad(loss_fn))
    print(f"full iter (vg):      {timeit(f5, f8):7.2f} ms")

    # 6. fwd only loss
    f6 = jax.jit(loss_fn)
    print(f"fwd+loss only:       {timeit(f6, f8):7.2f} ms")

    # 7. adam step
    from vtgaussian_slam_tpu.models.optimizer import adam_init, adam_step
    opt = adam_init(f8)
    lrs8 = jnp.full((1, 8), 0.001, f8.dtype)
    _, grads = f5(f8)
    f7 = jax.jit(lambda f8, gr, opt: adam_step(f8, gr, opt, lrs8, eps=1e-15))
    print(f"adam step:           {timeit(f7, f8, grads, opt):7.2f} ms")


if __name__ == "__main__":
    main()
