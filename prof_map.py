"""Profile the mapping-iteration component costs on the real chip.

The axon tunnel lies to naive timers: `block_until_ready` can return
before execution drains and a host sync costs ~30 ms RTT, so per-call
timing is garbage. This profiler runs each component K times inside ONE
jit (lax.scan with a data dependence threaded through the carry so
nothing folds away), host-syncs once, and reports (total - overhead)/K.

Breakdown targets (one mapping iteration, see core/map_cache.py):
  gather_channels (slot gather), fwd kernel, bwd kernel (vals_rows),
  inverse-map gathers, full iteration (value_and_grad + Adam).
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
                                                render_binned)
from vtgaussian_slam_tpu.datasets.synthetic import SyntheticRoomDataset
from vtgaussian_slam_tpu.models import gaussians as G
from vtgaussian_slam_tpu.ops.camera import setup_camera
from vtgaussian_slam_tpu.ops.rasterizer.binning import (apply_slot_inverse,
                                                        gather_channels)
from vtgaussian_slam_tpu.ops.rasterizer.pallas_splat import (_bwd_call,
                                                             _fwd_call,
                                                             pick_walk_chunk)

K = int(os.environ.get("VTGS_PROF_K", "50"))


def scan_time(step, init, label, k=K):
    """Run `step` k times inside one jit; return ms/call net of overhead."""
    @jax.jit
    def run(init):
        def body(c, _):
            return step(c), 0
        c, _ = jax.lax.scan(body, init, None, length=k)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), c, 0.0)

    s = run(init)
    float(s)                      # warm + sync
    t0 = time.time()
    s = run(init)
    float(s)
    total = time.time() - t0

    @jax.jit
    def empty(init):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), init, 0.0)
    e = empty(init); float(e)
    t0 = time.time()
    e = empty(init); float(e)
    over = time.time() - t0
    ms = (total - over) / k * 1e3
    print(f"{label:28s}: {ms:7.2f} ms/call   (sync overhead {over*1e3:.1f} ms)")
    return ms


def main():
    H, W = 680, 1200
    mpt = int(os.environ.get("VTGS_PROF_MPT", "512"))
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
                         max_pairs_per_tile=mpt)
    f8 = pack_fields8(sec.params)
    Tp, mpt = kfc.tab.shape
    print(f"N={n} cap={cap} Tp={Tp} mpt={mpt} P={Tp*mpt}")
    chunk = pick_walk_chunk(mpt)   # = map_frame_binned's choice
    print(f"walk chunk = {chunk}, K = {K}")
    tiles_x = -(-cam.width // 16)

    R9 = geo.quat_to_rotmat(geo.normalize(q)).reshape(9)
    zoff = jnp.zeros((), jnp.int32)

    # 1. slot gather (perturb f8 through the carry so scan can't hoist)
    def g_step(f8):
        s = gather_channels(f8, kfc.tab)
        return f8 + s[0, :, 0][None, :] * 1e-12
    scan_time(g_step, f8, "gather_channels")

    slots = gather_channels(f8, kfc.tab)

    # 2. fwd kernel
    def f_step(slots):
        acc = _fwd_call(slots, R9, tr, kfc.counts, zoff, cam, tiles_x,
                        chunk, False)
        return slots + acc[:, 0:1, 0:1] * 1e-12
    scan_time(f_step, slots, "fwd kernel")

    accum = _fwd_call(slots, R9, tr, kfc.counts, zoff, cam, tiles_x,
                      chunk, False)
    gct = jnp.ones_like(accum)

    # 3. bwd kernel vals_rows
    def b_step(slots):
        gr = _bwd_call(slots, R9, tr, kfc.counts, zoff, accum, gct, cam,
                       tiles_x, chunk, False, "vals_rows")
        return slots + gr[:, 0:1, 0:8].transpose(0, 2, 1) * 1e-12
    scan_time(b_step, slots, "bwd kernel (rows)")

    grad_rows = _bwd_call(slots, R9, tr, kfc.counts, zoff, accum, gct, cam,
                          tiles_x, chunk, False, "vals_rows")
    flat0 = grad_rows.reshape(Tp * mpt, 8)

    # 4. inverse-map gathers
    def i_step(flat):
        g = apply_slot_inverse(flat, kfc.inv)
        return flat + g[0][None, :] * 1e-12
    scan_time(i_step, flat0, "inverse gathers")

    # 5. full iteration: value_and_grad + Adam
    cfg = LossConfig(tracking=False, use_sil_for_loss=False,
                     ignore_outlier_depth_loss=False, adaptive_sil=False,
                     im_weight=1.0, depth_weight=1.0,
                     backend_kwargs=tuple(sorted(dict(
                         span_cap=2, max_pairs_per_tile=mpt, chunk=128,
                         use_pallas=True).items())))
    from vtgaussian_slam_tpu.core.losses import loss_from_render
    from vtgaussian_slam_tpu.models.optimizer import adam_init, adam_step

    def loss_fn(f8):
        r = render_binned(f8, kfc, cam, chunk)
        return loss_from_render(r, frame0, cfg, jnp.asarray(0.5, f8.dtype),
                                jnp.asarray(False)).loss

    lrs8 = jnp.full((1, 8), 0.001, jnp.float32)
    opt0 = adam_init(f8)

    def full_step(carry):
        f8, opt = carry
        _, grads = jax.value_and_grad(loss_fn)(f8)
        f8n, optn = adam_step(f8, grads, opt, lrs8, eps=1e-15)
        return (f8n, optn)
    scan_time(full_step, (f8, opt0), "full iter (vg + adam)")

    # 6. fwd+loss only
    def fl_step(f8):
        l = loss_fn(f8)
        return f8 + l * 1e-12
    scan_time(fl_step, f8, "fwd+loss only")

    # 7. vg WITHOUT adam (isolate optimizer + carry-aliasing cost)
    def vg_step(f8):
        _, grads = jax.value_and_grad(loss_fn)(f8)
        return f8 + grads * 1e-12
    scan_time(vg_step, f8, "vg only (no adam)")

    # 8. vg of the raw render (no loss pixel math)
    def render_sum(f8):
        r = render_binned(f8, kfc, cam, chunk)
        return jnp.sum(r.im) + jnp.sum(r.depth)
    def vgr_step(f8):
        _, grads = jax.value_and_grad(render_sum)(f8)
        return f8 + grads * 1e-12
    scan_time(vgr_step, f8, "vg render-only")

    # 9. vg of the raw ACCUM (no assemble_image / no tile->image relayout)
    from vtgaussian_slam_tpu.core.map_cache import splat_binned
    def accum_sum(f8):
        a = splat_binned(f8, kfc.tab, kfc.inv, kfc.quat, kfc.trans,
                         kfc.counts, cam, chunk, False)
        return jnp.sum(a[:, :6, :])
    def vga_step(f8):
        _, grads = jax.value_and_grad(accum_sum)(f8)
        return f8 + grads * 1e-12
    scan_time(vga_step, f8, "vg accum-only (no assemble)")

    # 10. assemble_image fwd alone
    from vtgaussian_slam_tpu.ops.rasterizer.pallas_splat import assemble_image
    acc0 = splat_binned(f8, kfc.tab, kfc.inv, kfc.quat, kfc.trans,
                        kfc.counts, cam, chunk, False)
    def asm_step(a):
        img = assemble_image(a, cam)
        return a + img[0, 0, 0] * 1e-12
    scan_time(asm_step, acc0, "assemble_image fwd")

    # 11. composed bwd chain: bwd kernel -> reshape -> inverse (one jit)
    def chain_step(slots):
        gr = _bwd_call(slots, R9, tr, kfc.counts, zoff, accum, gct, cam,
                       tiles_x, chunk, False, "vals_rows")
        g = apply_slot_inverse(gr.reshape(Tp * mpt, 8), kfc.inv)
        return slots + g[0][None, :, None] * 1e-12
    scan_time(chain_step, slots, "bwd+reshape+inverse (fused)")

    # 12. the custom-vjp pullback alone (exactly what vg runs backward)
    _, pullback = jax.vjp(
        lambda v8: splat_binned(v8, kfc.tab, kfc.inv, kfc.quat, kfc.trans,
                                kfc.counts, cam, chunk, False), f8)
    def pb_step(g):
        (gt,) = pullback(g)
        return g + gt[0, 0] * 1e-12
    scan_time(pb_step, jnp.ones_like(acc0), "vjp pullback only")

    # 12b/12c. bisect the vg: truncated backwards isolate which edge pays
    def make_vg(mode):
        @jax.custom_vjp
        def f(v8):
            return _splat_fwd_probe(v8)[0]
        def fwd(v8):
            return _splat_fwd_probe(v8)
        def bwd(res, g):
            slots_r, accum_r = res
            if mode == "zero":
                return (jnp.zeros((cap, 8), jnp.float32),)
            gr = _bwd_call(slots_r, R9, tr, kfc.counts, zoff, accum_r, g,
                           cam, tiles_x, chunk, False, "vals_rows")
            if mode == "kernel_only":
                return (jnp.zeros((cap, 8), jnp.float32)
                        + gr[0, 0, 0] * 1e-12,)
            if mode == "full3d":
                # 2D (tile, slot) indexed gathers straight off the pallas
                # output - no (P, 8) repack copy
                inv = kfc.inv
                w = inv.w
                ti = inv.pos // mpt
                si = inv.pos % mpt
                g = gr[ti[:, 0], si[:, 0]] * w[:, 0:1]
                for k in range(1, inv.pos.shape[1]):
                    g = g + gr[ti[:, k], si[:, k]] * w[:, k:k + 1]
                return (g,)
            if mode == "packed":
                # 128-wide packed-row gathers: reshape groups 16 slots x 8
                # channels per row; select the slot's 8 lanes by a
                # comparison one-hot (no table gather)
                inv = kfc.inv
                w = inv.w
                rows = gr.reshape(Tp * mpt // 16, 128)
                pr = inv.pos >> 4
                pg = inv.pos & 15
                i16 = jnp.arange(16, dtype=jnp.int32)
                g = jnp.zeros((cap, 8), jnp.float32)
                for k in range(inv.pos.shape[1]):
                    r = rows[pr[:, k]].reshape(cap, 16, 8)
                    sel = (i16[None, :] == pg[:, k:k + 1]).astype(jnp.float32)
                    g = g + jnp.einsum("ngc,ng->nc", r, sel) * w[:, k:k + 1]
                return (g,)
            return (apply_slot_inverse(gr.reshape(Tp * mpt, 8), kfc.inv),)
        def _splat_fwd_probe(v8):
            s = gather_channels(v8, kfc.tab)
            a = _fwd_call(s, R9, tr, kfc.counts, zoff, cam, tiles_x,
                          chunk, False)
            return a, (s, a)
        f.defvjp(fwd, bwd)
        def step(v8):
            _, g = jax.value_and_grad(lambda v: jnp.sum(f(v)))(v8)
            return v8 + g * 1e-12
        return step
    scan_time(make_vg("zero"), f8, "vg bisect: fwd only, zero bwd")
    scan_time(make_vg("kernel_only"), f8, "vg bisect: fwd + bwd kernel")
    scan_time(make_vg("full"), f8, "vg bisect: fwd + bwd + inverse")
    scan_time(make_vg("full3d"), f8, "vg bisect: fwd + bwd + 3d inverse")
    scan_time(make_vg("packed"), f8, "vg bisect: fwd + bwd + packed")

    # 13. fwd custom-vjp (gather+kernel with residual saving)
    def fwd_vjp_step(f8):
        out, _ = jax.vjp(
            lambda v8: splat_binned(v8, kfc.tab, kfc.inv, kfc.quat,
                                    kfc.trans, kfc.counts, cam, chunk,
                                    False), f8)
        return f8 + out[0, 0, 0] * 1e-12
    scan_time(fwd_vjp_step, f8, "fwd (vjp residual mode)")


if __name__ == "__main__":
    main()
