"""Fused Pallas TPU kernel: world-space slots + pose -> composited image.

Second-generation render kernel (see pallas_blend.py for the record-space
blend it supersedes on the SLAM hot paths). The CUDA rasterizer the reference
depends on fuses preprocess (projection) and render into one launch per pass
(/root/reference/utils/recon_helpers.py:2-27); this kernel goes further and
also fuses the world->camera transform, so the per-iteration XLA graph of the
tracking/mapping loops contains NO per-slot elementwise math at all:

    slots8 [n_tiles, 8, mpt]  (depth-ordered per tile, from binning.py)
      rows: 0..2 world mean xyz | 3 logit_opacity | 4 log_scale | 5..7 rgb
    + pose (R flat, t) and camera intrinsics as scalar-prefetch operands
    -> image accum [n_tiles, TPX, 8]  channels (r, g, b, z, 1, z*z, 0, 0)

Inside the kernel, per chunk of 128 slots: world->camera transform, isotropic
EWA projection (projection.py math), sigmoid/exp activations — all on
(1, chunk) lane rows, ~100 VPU ops total — then the (TPX, chunk) alpha
compositing of pallas_blend.py (cumprod transmittance, sticky early
termination, MXU color accumulation).

The backward replays the walk and chains every pixel-level gradient back to
the 8 input rows in-kernel, emitting one [n_tiles, 8, mpt] gradient:
  rows 0..2: d/d mean_CAM (the XLA-level wrapper turns these into d/d world
             mean = R^T g, d/dR = sum g (x) w, d/dt = sum g — whichever of
             those the caller actually uses survives XLA dead-code
             elimination: tracking keeps only (dR, dt), mapping keeps only
             rows 3..7 through the inverse-map table gather)
  rows 3..7: d/d logit_opacity, log_scale, rgb

An 8-row f32 record is exactly one sublane tile, halving record DMA vs the
16-row layout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera import Camera
from .blend import ALPHA_MAX, ALPHA_MIN, T_TERMINATE
from .pallas_blend import _cumprod_lanes, _cumsum_lanes, _shift_in_ones
from .projection import COV2D_DILATION, NEAR_CULL

SREC = 8        # input record rows
TILE = 16
TPX = TILE * TILE
NCH = 8         # output channels (6 live + 2 pad)
CP_LEN = 20     # camera/pose scalar vector length


def _pixel_coords(tile_y, tile_x, dtype):
    ly = jax.lax.broadcasted_iota(jnp.int32, (TPX, 1), 0) // TILE
    lx = jax.lax.broadcasted_iota(jnp.int32, (TPX, 1), 0) % TILE
    return ((tile_x * TILE + lx).astype(dtype),
            (tile_y * TILE + ly).astype(dtype))


def _project_chunk(rec, cp_ref):
    """Per-slot (1, chunk) projection pipeline; returns everything both
    kernels need. Mirrors projection.project_gaussians (isotropic path) and
    the world->camera transform of core/losses.render_slam."""
    wx, wy, wz = rec[0:1, :], rec[1:2, :], rec[2:3, :]
    lo, ls = rec[3:4, :], rec[4:5, :]
    R = [cp_ref[i] for i in range(9)]
    t = [cp_ref[9 + i] for i in range(3)]
    fx, fy, cx, cy = cp_ref[12], cp_ref[13], cp_ref[14], cp_ref[15]
    limx, limy = cp_ref[16], cp_ref[17]

    x = R[0] * wx + R[1] * wy + R[2] * wz + t[0]
    y = R[3] * wx + R[4] * wy + R[5] * wz + t[1]
    z = R[6] * wx + R[7] * wy + R[8] * wz + t[2]

    ok = z > NEAR_CULL
    zs = jnp.where(ok, z, 1.0)
    iz = 1.0 / zs
    ux = x * iz
    uy = y * iz
    cux = jnp.clip(ux, -limx, limx)
    cuy = jnp.clip(uy, -limy, limy)
    tx = cux * zs
    ty = cuy * zs
    iz2 = iz * iz
    j00 = fx * iz
    j02 = -fx * tx * iz2
    j11 = fy * iz
    j12 = -fy * ty * iz2
    s = jnp.exp(ls)
    s2 = s * s
    ax = j00 * j00 + j02 * j02
    bxy = j02 * j12
    cy_ = j11 * j11 + j12 * j12
    v00 = s2 * ax + COV2D_DILATION
    v01 = s2 * bxy
    v11 = s2 * cy_ + COV2D_DILATION
    det = v00 * v11 - v01 * v01
    ok = ok & (det > 0)
    idet = 1.0 / jnp.where(det > 0, det, 1.0)
    ca = v11 * idet
    cb = -v01 * idet
    cc = v00 * idet
    m2x = jnp.where(ok, fx * ux + cx - 0.5, -1e6)
    m2y = fy * uy + cy - 0.5
    sig = jax.nn.sigmoid(lo)
    op = jnp.where(ok, sig, 0.0)
    return dict(x=x, y=y, z=z, ok=ok, zs=zs, iz=iz, ux=ux, uy=uy, cux=cux,
                cuy=cuy, j00=j00, j02=j02, j11=j11, j12=j12, s2=s2, ax=ax,
                bxy=bxy, cy_=cy_, v00=v00, v01=v01, v11=v11, idet=idet,
                ca=ca, cb=cb, cc=cc, m2x=m2x, m2y=m2y, sig=sig, op=op,
                fx=fx, fy=fy, limx=limx, limy=limy)


def _fwd_kernel(count_ref, tiles_x_ref, cp_ref, slots_ref, out_ref, *,
                chunk: int, mpt: int):
    tl = pl.program_id(0)
    count = count_ref[tl]
    tiles_x = tiles_x_ref[0]
    t = tl + tiles_x_ref[1]          # global tile id (sharded grids)
    px, py = _pixel_coords(t // tiles_x, t % tiles_x, out_ref.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    n_chunks = pl.cdiv(count, chunk)

    def cond(carry):
        c, T, _ = carry
        return (c < n_chunks) & (jnp.max(T) >= T_TERMINATE)

    def body(carry):
        c, T, accum = carry
        j0 = c * chunk
        rec = slots_ref[0, :, pl.ds(j0, chunk)]        # (SREC, chunk)
        p = _project_chunk(rec, cp_ref)

        dx = px - p["m2x"]                             # (TPX, chunk)
        dy = py - p["m2y"]
        power = (-0.5 * (p["ca"] * dx * dx + p["cc"] * dy * dy)
                 - p["cb"] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, p["op"] * jnp.exp(power))
        keep = (power <= 0) & (alpha >= ALPHA_MIN) & (lane + j0 < count)
        alpha = jnp.where(keep, alpha, 0.0)

        cp = _cumprod_lanes(1.0 - alpha, chunk)
        T_after = T * cp
        T_in = T * _shift_in_ones(cp, chunk)
        include = T_after >= T_TERMINATE
        weight = jnp.where(include, alpha * T_in, 0.0)

        z = p["z"]
        cols = jnp.concatenate(
            [rec[5:8, :], z, jnp.ones_like(z), z * z,
             jnp.zeros((2, chunk), z.dtype)], axis=0)   # (NCH, chunk)
        accum = accum + jax.lax.dot_general(
            weight, cols, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=accum.dtype)
        T_last = T_after[:, chunk - 1:chunk]
        T_new = jnp.where(T_last < T_TERMINATE, 0.0, T_last)
        return c + 1, T_new, accum

    T0 = jnp.ones((TPX, 1), out_ref.dtype)
    A0 = jnp.zeros((TPX, NCH), out_ref.dtype)
    _, _, accum = jax.lax.while_loop(cond, body, (0, T0, A0))
    out_ref[0] = accum


def _bwd_kernel(count_ref, tiles_x_ref, cp_ref, slots_ref, out_ref, g_ref,
                grad_ref, *, chunk: int, mpt: int):
    tl = pl.program_id(0)
    count = count_ref[tl]
    tiles_x = tiles_x_ref[0]
    t = tl + tiles_x_ref[1]          # global tile id (sharded grids)
    f32 = grad_ref.dtype
    px, py = _pixel_coords(t // tiles_x, t % tiles_x, f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    grad_ref[0] = jnp.zeros((SREC, mpt), f32)

    out_total = out_ref[0]                 # (TPX, NCH)
    g = g_ref[0]
    GG = jnp.sum(g * out_total, axis=1, keepdims=True)
    n_chunks = pl.cdiv(count, chunk)

    def cond(carry):
        c, T, _ = carry
        return (c < n_chunks) & (jnp.max(T) >= T_TERMINATE)

    def body(carry):
        c, T, Hpref = carry
        j0 = c * chunk
        rec = slots_ref[0, :, pl.ds(j0, chunk)]
        p = _project_chunk(rec, cp_ref)

        dx = px - p["m2x"]
        dy = py - p["m2y"]
        ca, cb, cc = p["ca"], p["cb"], p["cc"]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        expp = jnp.exp(power)
        alpha_raw = p["op"] * expp
        clamped = alpha_raw > ALPHA_MAX
        alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
        keep = (power <= 0) & (alpha >= ALPHA_MIN) & (lane + j0 < count)
        alpha = jnp.where(keep, alpha, 0.0)

        cpv = _cumprod_lanes(1.0 - alpha, chunk)
        T_after = T * cpv
        T_in = T * _shift_in_ones(cpv, chunk)
        include = T_after >= T_TERMINATE
        weight = jnp.where(include, alpha * T_in, 0.0)

        z = p["z"]
        cols = jnp.concatenate(
            [rec[5:8, :], z, jnp.ones_like(z), z * z,
             jnp.zeros((2, chunk), z.dtype)], axis=0)   # (NCH, chunk)
        Gc = jax.lax.dot_general(g, cols, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=f32)  # (TPX, chunk)
        wGc = weight * Gc
        Hk = Hpref + _cumsum_lanes(wGc, chunk)
        inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1e-6)
        g_alpha = jnp.where(
            include & keep & (~clamped),
            T_in * Gc - (GG - Hk) * inv_om, 0.0)

        g_power = g_alpha * alpha
        # pixel-level reductions -> per-slot (1, chunk) rows
        g_m2x = jnp.sum(g_power * (ca * dx + cb * dy), axis=0, keepdims=True)
        g_m2y = jnp.sum(g_power * (cc * dy + cb * dx), axis=0, keepdims=True)
        g_ca = jnp.sum(g_power * (-0.5 * dx * dx), axis=0, keepdims=True)
        g_cb = jnp.sum(g_power * (-dx * dy), axis=0, keepdims=True)
        g_cc = jnp.sum(g_power * (-0.5 * dy * dy), axis=0, keepdims=True)
        g_opk = jnp.sum(g_alpha * expp * keep, axis=0, keepdims=True)
        # color-channel grads: (NCH, chunk) = g^T @ weight
        g_cols = jax.lax.dot_general(g, weight, (((0,), (0,)), ((), ())),
                                     precision=jax.lax.Precision.HIGHEST,
                                     preferred_element_type=f32)

        # ---- per-slot chain back to the 8 input rows ----
        ok = p["ok"]
        okf = ok.astype(f32)
        g_m2x = g_m2x * okf                      # m2x parked at -1e6 when !ok
        g_rgb = g_cols[0:3, :]
        g_z_cols = g_cols[3:4, :] + 2.0 * z * g_cols[5:6, :]
        g_lo = g_opk * p["sig"] * (1.0 - p["sig"]) * okf

        # conic = V^{-1}: dL/dV = -C (dL/dC) C with symmetric packing
        a0, a1, a2 = g_ca, 0.5 * g_cb, g_cc
        ca0 = ca * a0 + cb * a1
        ca1 = ca * a1 + cb * a2
        cb0 = cb * a0 + cc * a1
        cb1 = cb * a1 + cc * a2
        g_v00 = -(ca0 * ca + ca1 * cb)
        g_v01 = -2.0 * (ca0 * cb + ca1 * cc)
        g_v11 = -(cb0 * cb + cb1 * cc)

        g_s2 = g_v00 * p["ax"] + g_v01 * p["bxy"] + g_v11 * p["cy_"]
        g_ls = 2.0 * p["s2"] * g_s2 * okf
        s2v = p["s2"]
        j00, j02, j11, j12 = p["j00"], p["j02"], p["j11"], p["j12"]
        g_j00 = 2.0 * s2v * j00 * g_v00
        g_j02 = s2v * (2.0 * j02 * g_v00 + j12 * g_v01)
        g_j11 = 2.0 * s2v * j11 * g_v11
        g_j12 = s2v * (2.0 * j12 * g_v11 + j02 * g_v01)

        fx, fy = p["fx"], p["fy"]
        iz, zs = p["iz"], p["zs"]
        iz2 = iz * iz
        tx = p["cux"] * zs
        ty = p["cuy"] * zs
        # j00 = fx iz ; j02 = -fx tx iz^2 ; j11 = fy iz ; j12 = -fy ty iz^2
        g_iz = fx * g_j00 + fy * g_j11 \
            - 2.0 * fx * tx * iz * g_j02 - 2.0 * fy * ty * iz * g_j12
        g_tx = -fx * iz2 * g_j02
        g_ty = -fy * iz2 * g_j12
        # tx = clip(x/z, +-lim) * zs
        in_x = (jnp.abs(p["ux"]) <= p["limx"]).astype(f32)
        in_y = (jnp.abs(p["uy"]) <= p["limy"]).astype(f32)
        g_x = g_tx * in_x + g_m2x * fx * iz
        g_y = g_ty * in_y + g_m2y * fy * iz
        g_zs_tx = g_tx * (p["cux"] - in_x * p["ux"])
        g_zs_ty = g_ty * (p["cuy"] - in_y * p["uy"])
        # m2x = fx x iz + ... ; m2y = fy y iz + ...
        g_iz = g_iz + g_m2x * fx * p["x"] + g_m2y * fy * p["y"]
        g_zs = g_zs_tx + g_zs_ty - iz2 * g_iz
        g_z_total = (g_zs + g_z_cols) * okf

        gk = jnp.concatenate(
            [g_x * okf, g_y * okf, g_z_total, g_lo, g_ls, g_rgb], axis=0)
        grad_ref[0, :, pl.ds(j0, chunk)] = gk

        T_last = T_after[:, chunk - 1:chunk]
        T_new = jnp.where(T_last < T_TERMINATE, 0.0, T_last)
        return c + 1, T_new, Hpref + jnp.sum(wGc, axis=1, keepdims=True)

    T0 = jnp.ones((TPX, 1), f32)
    H0 = jnp.zeros((TPX, 1), f32)
    jax.lax.while_loop(cond, body, (0, T0, H0))


def _cp_vector(R: jnp.ndarray, trans: jnp.ndarray, cam: Camera):
    consts = jnp.asarray(
        [cam.fx, cam.fy, cam.cx, cam.cy, 1.3 * cam.tanfovx,
         1.3 * cam.tanfovy, 0.0, 0.0], jnp.float32)
    return jnp.concatenate([R.reshape(9), trans.reshape(3), consts])


def _params(interpret):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def splat_blend(slots8: jnp.ndarray, R: jnp.ndarray, trans: jnp.ndarray,
                counts: jnp.ndarray, tile_offset: jnp.ndarray,
                cam: Camera, tiles_x: int,
                chunk: int = 128, interpret: bool = False,
                grad_mode: str = "all") -> jnp.ndarray:
    """slots8 [n_tiles, SREC, mpt] + pose -> accum [n_tiles, TPX, NCH].

    grad_mode selects which cotangents the backward materializes — the
    XLA-level contractions (R^T g for world means, the sum g (x) w for dR)
    cost several ms at SLAM working sets, so callers that statically know
    what they optimize skip the rest:
      "pose": only (dR, dt); slot cotangent rows are zeros (tracking)
      "vals": only slot rows 3..7 (logit_op/log_scale/rgb); dR = dt = 0
              and mean rows are zeros (mapping)
      "all":  everything (generic / tests)
    """
    return _fwd_call(slots8, R, trans, counts, tile_offset, cam, tiles_x,
                     chunk, interpret)


def _fwd_call(slots8, R, trans, counts, tile_offset, cam, tiles_x, chunk,
              interpret):
    n_tiles, _, mpt = slots8.shape
    kernel = functools.partial(_fwd_kernel, chunk=chunk, mpt=mpt)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((1, SREC, mpt),
                                   lambda t, c_, tx_, cp_: (t, 0, 0))],
            out_specs=pl.BlockSpec((1, TPX, NCH),
                                   lambda t, c_, tx_, cp_: (t, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, TPX, NCH), slots8.dtype),
        compiler_params=_params(interpret),
        interpret=interpret,
    )(counts,
      jnp.stack([jnp.asarray(tiles_x, jnp.int32),
                 jnp.asarray(tile_offset, jnp.int32)]),
      _cp_vector(R, trans, cam), slots8)


def _splat_fwd(slots8, R, trans, counts, tile_offset, cam, tiles_x, chunk,
               interpret, grad_mode):
    out = _fwd_call(slots8, R, trans, counts, tile_offset, cam, tiles_x,
                    chunk, interpret)
    return out, (slots8, R, trans, counts, tile_offset, out)


def _splat_bwd(cam, tiles_x, chunk, interpret, grad_mode, res, g):
    slots8, R, trans, counts, tile_offset, out = res
    n_tiles, _, mpt = slots8.shape
    kernel = functools.partial(_bwd_kernel, chunk=chunk, mpt=mpt)
    grad = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, SREC, mpt),
                             lambda t, c_, tx_, cp_: (t, 0, 0)),
                pl.BlockSpec((1, TPX, NCH),
                             lambda t, c_, tx_, cp_: (t, 0, 0)),
                pl.BlockSpec((1, TPX, NCH),
                             lambda t, c_, tx_, cp_: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, SREC, mpt),
                                   lambda t, c_, tx_, cp_: (t, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, SREC, mpt), slots8.dtype),
        compiler_params=_params(interpret),
        interpret=interpret,
    )(counts,
      jnp.stack([jnp.asarray(tiles_x, jnp.int32),
                 jnp.asarray(tile_offset, jnp.int32)]),
      _cp_vector(R, trans, cam), slots8, out, g)

    # cotangents at the XLA level, restricted by grad_mode so the hot loops
    # never pay for contractions they do not consume
    n_tiles_, _, mpt_ = slots8.shape
    zeros3 = jnp.zeros((n_tiles_, 3, mpt_), slots8.dtype)
    if grad_mode in ("pose", "all"):
        g_mc = grad[:, 0:3, :]                   # d/d mean_cam
        w = slots8[:, 0:3, :]
        g_R = jnp.einsum("tim,tjm->ij", g_mc, w).reshape(9)
        g_t = jnp.sum(g_mc, axis=(0, 2))
    else:
        g_R = jnp.zeros((9,), slots8.dtype)
        g_t = jnp.zeros((3,), slots8.dtype)
    if grad_mode == "all":
        g_w = jnp.einsum("ij,tjm->tim", R.reshape(3, 3).T, g_mc)
    else:
        g_w = zeros3
    if grad_mode == "pose":
        g_slots8 = jnp.concatenate(
            [g_w, jnp.zeros((n_tiles_, 5, mpt_), slots8.dtype)], axis=1)
    else:
        g_slots8 = jnp.concatenate([g_w, grad[:, 3:8, :]], axis=1)
    f0 = jax.dtypes.float0
    return (g_slots8, g_R, g_t, np.zeros(counts.shape, f0),
            np.zeros(jnp.shape(tile_offset), f0))


splat_blend.defvjp(_splat_fwd, _splat_bwd)


def assemble_image(accum: jnp.ndarray, cam: Camera,
                   tile: int = TILE) -> jnp.ndarray:
    """[n_tiles, TPX, NCH] -> (6, H, W) SLAM channel stack."""
    tiles_x = -(-cam.width // tile)
    tiles_y = -(-cam.height // tile)
    img = accum[..., :6].reshape(tiles_y, tiles_x, tile, tile, 6)
    img = img.transpose(4, 0, 2, 1, 3).reshape(6, tiles_y * tile,
                                               tiles_x * tile)
    return img[:, :cam.height, :cam.width]
