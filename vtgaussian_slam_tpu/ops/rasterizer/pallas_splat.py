"""Fused Pallas TPU kernel: world-space slots + pose -> composited image.

Third-generation render kernel (see pallas_blend.py for the record-space
blend it supersedes on the SLAM hot paths). The CUDA rasterizer the reference
depends on fuses preprocess (projection) and render into one launch per pass
(/root/reference/utils/recon_helpers.py:2-27); this kernel goes further and
also fuses the world->camera transform, so the per-iteration XLA graph of the
tracking/mapping loops contains NO per-slot elementwise math at all.

Inputs (depth-ordered per tile, from binning.py; tiles padded to a multiple
of BLOCK so the grid processes BLOCK tiles per step — grid-step overhead was
the dominant cost of the one-tile-per-step v2 kernel at SLAM working sets):

    slots8 [n_tiles, 8, mpt]  rows [wx wy wz logit_op log_scale r g b]
    + pose (R flat, t) and camera intrinsics as scalar-prefetch operands
    -> accum [n_tiles, NCH, TPX] channels (r, g, b, z, 1, z*z, 0, 0)

The single 8-row record is one f32 sublane tile; it is produced by ONE
row gather from an (N, 8) field table (row gathers are row-count-bound, so
gathering 8 columns costs the same as 3 or 5 — binning.slots8_gather), and
the "vals" backward returns its gradient in the SAME (n_tiles, 8, mpt)
layout with zeroed mean rows, so no narrow-dimension slicing or relayout
ever touches the hot path.

The (NCH, TPX) accumulator layout keeps the lane dimension = pixels, so the
XLA-side tile->image assembly never relayouts narrow minor dimensions (a
(T, TPX, NCH) layout costs ~10 ms per call at 680x1200 in pure data
movement; see ROADMAP.md round-2 notes).

Inside the kernel, per chunk of 128 slots: world->camera transform, isotropic
EWA projection (projection.py math), sigmoid/exp activations — all on
(1, chunk) lane rows — then the (TPX, chunk) alpha compositing of
pallas_blend.py (cumprod transmittance, sticky early termination, MXU color
accumulation).

The backward replays the walk and is specialized per caller (`grad_mode`):
  "pose"  (tracking): chains pixel gradients to d/d mean_cam and contracts
          dR = sum g (x) w and dt = sum g IN-KERNEL, emitting one
          (n_blocks, 128) row of partial [dR(9), dt(3)] sums — no per-slot
          gradient buffer is materialized at all.
  "vals"  (mapping): means are frozen, so the mean/Jacobian chain is skipped
          entirely; emits (n_tiles, 8, mpt) with rows [0, 0, 0, d logit_op,
          d log_scale, d rgb] for the scatter-free inverse-map gather
          (binning.slots8_gather).
  "all"   (tests/generic): full per-slot gradient rows
          [d mean_cam(3), d logit_op, d log_scale, d rgb(3)]; the XLA wrapper
          contracts dR/dt and rotates d mean_cam back to world frame.
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
from .projection import COV2D_DILATION, NEAR_CULL

TILE = 16
TPX = TILE * TILE
NCH = 8         # output channels (6 live + 2 pad)
# Tiles per grid step (callers pad n_tiles to a multiple via pad_tiles).
# The per-tile chunk walk is a serial latency chain; the kernels unroll
# BLOCK independent tiles per grid step so the scheduler can interleave
# their instruction streams. 8 was picked on-chip for the v2 kernel;
# VTGS_SPLAT_BLOCK sweeps it (import-time, like VTGS_SPLAT_PRECISION).
BLOCK = int(__import__("os").environ.get("VTGS_SPLAT_BLOCK", "8"))

# MXU precision for the in-kernel matmuls. One-pass-bf16 dots (with f32
# accumulation) are ~30% faster end-to-end than exact f32 at the Replica
# room0 working set (fwd 13.9 -> 9.7 ms). Naive bf16 costs real quality
# (~1.5 dB PSNR, ~3 cm depth L1 on the smoke scene) because the z channel
# carries ~3 m absolute depths whose 0.4% rounding is centimeters — the
# per-chunk depth CENTERING in _splat_weights removes exactly that operand
# magnitude, after which bf16 matches f32 quality (smoke: PSNR 41.1 vs
# 41.3, depth L1 4.0 vs 3.7 cm, ATE equal). Default: bf16 everywhere;
# VTGS_SPLAT_PRECISION=highest forces exact f32.
import os as _os
_PREC_MODE = _os.environ.get("VTGS_SPLAT_PRECISION", "").lower()
FWD_PRECISION = (jax.lax.Precision.HIGHEST if _PREC_MODE == "highest"
                 else jax.lax.Precision.DEFAULT)
BWD_PRECISION = FWD_PRECISION


def pad_tiles(n_tiles: int) -> int:
    """Padded tile count the splat kernels require."""
    return -(-n_tiles // BLOCK) * BLOCK


def pick_walk_chunk(*mpts: int) -> int:
    """Largest walk-chunk width that divides EVERY supplied cache's slot
    dimension — the kernel's `pl.ds(j0, chunk)` walk reads past the slot
    axis if chunk does not divide mpt, so one loop rendering multiple
    caches (e.g. per-keyframe + global binnings with different pair
    budgets) must pick a chunk valid for all of them. Larger chunks
    amortize per-chunk loop/issue overhead (256 lanes measured 26.3 ->
    20.1 ms fwd+bwd at the Replica working set) — but the early-termination
    check only runs BETWEEN chunks, so past saturation depth the extra lanes
    are wasted walk; VTGS_WALK_CHUNK forces a width for measurement."""
    forced = _os.environ.get("VTGS_WALK_CHUNK")
    prefer = ((int(forced),) if forced else (512, 256, 128))
    for c in prefer:
        if all(m % c == 0 for m in mpts):
            return c
    if forced:
        raise ValueError(f"VTGS_WALK_CHUNK={forced} does not divide {mpts}")
    raise ValueError(f"slot dims {mpts} are not all multiples of 128")


def _project_chunk(rec, cp_ref):
    """Per-slot (1, chunk) projection pipeline; returns everything the
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


def _tri_excl(chunk, dtype):
    """(chunk, chunk) strictly-upper-triangular ones: column k of x @ tri
    sums x over lanes j < k (exclusive lane cumsum as ONE MXU matmul)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (ri < ci).astype(dtype)


CUMSUM_SUB = 128


def _cumsum_lanes(x, tri_sub, inclusive: bool, precision):
    """Lane cumsum of (rows, chunk) via two levels: per-128-block matmul
    against `tri_sub` (the 128-wide _tri_excl, shared by both kinds) plus a
    running f32 block offset. The one-matmul form is O(chunk^2) MXU work per
    slot; this is O(chunk * 128) — 4x fewer FLOPs at the 512-lane walk
    (the kernels' dominant contraction at SLAM working sets). `inclusive`
    adds x back to the exclusive scan instead of a second (shifted) tri."""
    chunk = x.shape[-1]
    if chunk == CUMSUM_SUB:
        s = jax.lax.dot_general(x, tri_sub, (((1,), (0,)), ((), ())),
                                precision=precision,
                                preferred_element_type=x.dtype)
        return s + x if inclusive else s
    parts = []
    off = jnp.zeros((x.shape[0], 1), x.dtype)
    for b in range(chunk // CUMSUM_SUB):
        xb = x[:, b * CUMSUM_SUB:(b + 1) * CUMSUM_SUB]
        sb = jax.lax.dot_general(xb, tri_sub, (((1,), (0,)), ((), ())),
                                 precision=precision,
                                 preferred_element_type=x.dtype)
        parts.append(sb + off + xb if inclusive else sb + off)
        off = off + sb[:, -1:] + xb[:, -1:]
    return jnp.concatenate(parts, axis=1)


def _phi_local(dtype):
    """(TPX, 8) tile-LOCAL pixel-moment basis [lx^2 lx*ly ly^2 lx ly 1 0 0].

    Shared by the forward quadratic-form evaluation (_splat_weights) and the
    backward's per-slot pixel reductions — both contract against it on the
    MXU instead of burning VPU issue on (TPX, chunk) elementwise panels."""
    lxl = (jax.lax.broadcasted_iota(jnp.int32, (TPX, 1), 0) % TILE
           ).astype(dtype)
    lyl = (jax.lax.broadcasted_iota(jnp.int32, (TPX, 1), 0) // TILE
           ).astype(dtype)
    return jnp.concatenate(
        [lxl * lxl, lxl * lyl, lyl * lyl, lxl, lyl, jnp.ones_like(lxl),
         jnp.zeros((TPX, 2), dtype)], axis=1)


def _splat_weights(p, rec_rgb, phi, tox, toy, lane, j0, count, T, chunk, tri,
                   precision):
    """Shared fwd-walk step: alpha, transmittance chain, blend weights.

    The exclusive transmittance product runs in log space with the lane
    cumsum as one proper (TPX, chunk) @ (chunk, chunk) MXU matmul (`tri`):
    the kernels are VPU-issue-bound and this replaces the 7-step shifted
    cumprod chain (measured 17.0 -> 13.9 ms fwd at the Replica working set;
    log1p/exp roundtrip error ~1e-4 relative on composited channels).

    The Gaussian quadratic form itself is ALSO one MXU matmul: power[p, k] =
    phi[p] . coef[:, k] with per-slot coefficients of the expanded quadratic
    in tile-local pixel coords — replacing the (TPX, chunk) dx/dy/power
    elementwise chain (~7 panels) with ~10 cheap (1, chunk) rows. The
    expansion cancels O(|a| mxl^2) terms, so this one contraction runs at
    HIGHEST (f32-exact) MXU precision regardless of the fast-path bf16 mode:
    at bf16, 0.4% of |a| mxl^2 ~ 2000 would be alpha-breaking; at f32 the
    expansion error is ~1e-7 relative (local coords <= span*16 + r)."""
    qa = -0.5 * p["ca"]
    qb = -p["cb"]
    qc = -0.5 * p["cc"]
    mxl = p["m2x"] - tox
    myl = p["m2y"] - toy
    zero = jnp.zeros_like(qa)
    coef = jnp.concatenate(
        [qa, qb, qc,
         -2.0 * qa * mxl - qb * myl,
         -2.0 * qc * myl - qb * mxl,
         qa * mxl * mxl + qb * mxl * myl + qc * myl * myl,
         zero, zero], axis=0)                            # (8, chunk)
    power = jax.lax.dot_general(
        phi, coef, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=coef.dtype)               # (TPX, chunk)
    expp = jnp.exp(power)
    alpha_raw = p["op"] * expp
    clamped = alpha_raw > ALPHA_MAX
    alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
    # power > 0 is the CUDA rasterizer's non-PD-garbage cut; true power is
    # <= 0 for a PD conic, but the MXU expansion carries ~1e-7 * |qa mxl^2|
    # absolute error (~2e-4), which would flip the test exactly at splat
    # CENTERS (power ~ 0, the max-alpha pixel) — hence the epsilon.
    keep = (power <= 1e-3) & (alpha >= ALPHA_MIN) & (lane + j0 < count)
    alpha = jnp.where(keep, alpha, 0.0)

    lg = jnp.log1p(-alpha)
    S_excl = _cumsum_lanes(lg, tri, False, precision)
    T_in = T * jnp.exp(S_excl)
    T_after = T_in * (1.0 - alpha)
    include = T_after >= T_TERMINATE
    weight = jnp.where(include, alpha * T_in, 0.0)

    # depth channels are CENTERED per chunk: the MXU contractions round
    # operands to bf16 in fast/backward precision modes, and 0.4% of a ~3 m
    # absolute depth is 1.2 cm of metric error — centering shrinks the
    # operand magnitude to the chunk's depth spread (error ~mm). The exact
    # identities accum_z = d_c + z0*sil and accum_z2 = d_c2 + 2 z0 d_c +
    # z0^2 sil are restored in f32 epilogues (fwd) / cotangent pre-rotation
    # (bwd), so the math is unchanged at f32 precision.
    z = p["z"]
    z0 = p["zs"][0, 0]
    c = z - z0
    cols = jnp.concatenate(
        [rec_rgb, c, jnp.ones_like(z), c * c,
         jnp.zeros((2, chunk), z.dtype)], axis=0)       # (NCH, chunk)
    return dict(clamped=clamped,
                alpha=alpha, keep=keep, T_after=T_after, T_in=T_in,
                include=include, weight=weight, cols=cols, z0=z0, zc=c)


def _fwd_kernel(count_ref, tid_ref, meta_ref, cp_ref, slots_ref, out_ref, *,
                chunk: int, mpt: int, block: int):
    blk = pl.program_id(0)
    tiles_x = meta_ref[0]
    f32 = out_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    tri = _tri_excl(min(chunk, CUMSUM_SUB), f32)
    phi = _phi_local(f32)

    for b in range(block):
        tl = blk * block + b
        count = count_ref[tl]
        # global tile id: explicit per-row id (two-class binning renders an
        # arbitrary tile subset) plus the sharded grids' range offset
        t = tid_ref[tl] + meta_ref[1]
        tox = ((t % tiles_x) * TILE).astype(f32)
        toy = ((t // tiles_x) * TILE).astype(f32)
        n_chunks = pl.cdiv(count, chunk)

        def cond(carry):
            c, T, _ = carry
            return (c < n_chunks) & (jnp.max(T) >= T_TERMINATE)

        def body(carry):
            c, T, accum = carry
            j0 = c * chunk
            rec = slots_ref[b, :, pl.ds(j0, chunk)]
            p = _project_chunk(rec, cp_ref)
            w = _splat_weights(p, rec[5:8, :], phi, tox, toy, lane, j0,
                               count, T, chunk, tri, FWD_PRECISION)
            # accum (NCH, TPX): channels on sublanes, pixels on lanes
            d = jax.lax.dot_general(
                w["cols"], w["weight"], (((1,), (1,)), ((), ())),
                precision=FWD_PRECISION,
                preferred_element_type=accum.dtype)
            # de-center the depth channels (see _splat_weights)
            z0 = w["z0"]
            d3 = d[3:4] + z0 * d[4:5]
            d5 = d[5:6] + 2.0 * z0 * d[3:4] + z0 * z0 * d[4:5]
            accum = accum + jnp.concatenate(
                [d[0:3], d3, d[4:5], d5, d[6:8]], axis=0)
            T_last = w["T_after"][:, chunk - 1:chunk]
            T_new = jnp.where(T_last < T_TERMINATE, 0.0, T_last)
            return c + 1, T_new, accum

        T0 = jnp.ones((TPX, 1), f32)
        A0 = jnp.zeros((NCH, TPX), f32)
        _, T_end, accum = jax.lax.while_loop(cond, body, (0, T0, A0))
        # pad channel 6 carries the per-pixel FINAL transmittance (zeroed
        # where the walk terminated): counts-saturated tiles with
        # max-pixel T_end >= T_TERMINATE are HARMFULLY truncated — the
        # dropped tail would have rendered (pipeline pair-budget feedback).
        # assemble_image reads channels :6 only, and backward cotangents on
        # channel 6 are zero by construction, so the math is unchanged.
        # Inserted with a row-iota select, NOT a (6+1+1)-row concatenate:
        # Mosaic rejects that concat with "result/input offset mismatch on
        # non-concat dimension" on real TPUs (the round-3 HEAD regression).
        ri = jax.lax.broadcasted_iota(jnp.int32, (NCH, TPX), 0)
        T_row = jnp.broadcast_to(T_end.reshape(1, TPX), (NCH, TPX))
        out_ref[b] = jnp.where(ri == 6, T_row, accum)


def _bwd_kernel(count_ref, tid_ref, meta_ref, cp_ref, slots_ref, out_ref,
                g_ref, grad_ref, *, chunk: int, mpt: int, block: int,
                mode: str):
    """Backward walk. mode selects which chains run and what is emitted:
    "vals"      -> grad_ref (block, 8, mpt) rows [0,0,0, d lo, d ls, d rgb]
    "vals_rows" -> grad_ref (block, mpt, 8) cols [0,0,0, d lo, d ls, d rgb]
                   — ROW-major per slot, so the flat (P, 8) view reads one
                   sector per slot in the inverse-map gathers (the (8, mpt)
                   layout strides a slot's channels 4*mpt bytes apart: 8
                   HBM transactions per gathered row, measured 2.5x slower)
    "all"       -> grad_ref (block, 8, mpt) rows [d mean_cam, d lo, d ls,
                   d rgb]
    "pose"      -> grad_ref (1, 8, 128) partial row [dR(9), dt(3), 0...]
                   summed over the block's tiles
    """
    blk = pl.program_id(0)
    tiles_x = meta_ref[0]
    f32 = g_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    tri = _tri_excl(min(chunk, CUMSUM_SUB), f32)

    # tile-LOCAL pixel-moment basis (shared with the forward quadratic,
    # _phi_local): every per-slot pixel reduction of the quadratic-form
    # chain becomes ONE MXU contraction phi^T @ g_power instead of ~5 masked
    # (TPX, chunk) multiply-reduce panels — the kernels are VPU-issue-bound,
    # so moving these onto the (otherwise idle) MXU is the main win. Local
    # coords keep the expansion's cancellation error ~1e-6 relative
    # (coords <= 16 + r).
    phi = _phi_local(f32)

    if mode == "pose":
        red = jnp.zeros((1, 12), f32)
        ones_row = jnp.ones((1, chunk), f32)

    for b in range(block):
        tl = blk * block + b
        count = count_ref[tl]
        t = tid_ref[tl] + meta_ref[1]
        tox = ((t % tiles_x) * TILE).astype(f32)
        toy = ((t // tiles_x) * TILE).astype(f32)

        if mode == "vals_rows":
            grad_ref[b] = jnp.zeros((mpt, 8), f32)
        elif mode != "pose":
            grad_ref[b] = jnp.zeros((8, mpt), f32)

        out_total = out_ref[b]                         # (NCH, TPX)
        g = g_ref[b]
        GG = jnp.sum(g * out_total, axis=0)[:, None]   # (TPX, 1)
        n_chunks = pl.cdiv(count, chunk)

        def cond(carry):
            c, T, _, _ = carry
            return (c < n_chunks) & (jnp.max(T) >= T_TERMINATE)

        def body(carry):
            c, T, Hpref, red_acc = carry
            j0 = c * chunk
            rec = slots_ref[b, :, pl.ds(j0, chunk)]
            p = _project_chunk(rec, cp_ref)
            w = _splat_weights(p, rec[5:8, :], phi, tox, toy, lane, j0,
                               count, T, chunk, tri, BWD_PRECISION)
            ca, cb, cc = p["ca"], p["cb"], p["cc"]

            # cotangent rows pre-rotated for the CENTERED depth channels
            # (exact identity: g_eff . cols_centered == g . cols_true)
            z0 = w["z0"]
            g_eff = jnp.concatenate(
                [g[0:3], g[3:4] + 2.0 * z0 * g[5:6],
                 g[4:5] + z0 * g[3:4] + z0 * z0 * g[5:6], g[5:8]], axis=0)

            # Gc[p, k] = sum_ch g_eff[ch, p] cols[ch, k]
            Gc = jax.lax.dot_general(g_eff, w["cols"],
                                     (((0,), (0,)), ((), ())),
                                     precision=BWD_PRECISION,
                                     preferred_element_type=f32)  # (TPX, chunk)
            wGc = w["weight"] * Gc
            # inclusive lane cumsum on the MXU (see _cumsum_lanes)
            Hk = Hpref + _cumsum_lanes(wGc, tri, True, BWD_PRECISION)
            inv_om = 1.0 / jnp.maximum(1.0 - w["alpha"], 1e-6)
            g_alpha = jnp.where(
                w["include"] & w["keep"] & (~w["clamped"]),
                w["T_in"] * Gc - (GG - Hk) * inv_om, 0.0)

            g_power = g_alpha * w["alpha"]
            # one MXU contraction yields every pixel moment of g_power:
            # M = [sum g lx^2, sum g lx ly, sum g ly^2, sum g lx, sum g ly,
            #      sum g, 0, 0] per slot; the dx/dy-weighted reductions of
            # the quadratic-form chain are then cheap (1, chunk) row math
            M = jax.lax.dot_general(phi, g_power, (((0,), (0,)), ((), ())),
                                    precision=BWD_PRECISION,
                                    preferred_element_type=f32)  # (8, chunk)
            mxl = p["m2x"] - tox                 # slot mean in local coords
            myl = p["m2y"] - toy
            s_dx = M[3:4, :] - mxl * M[5:6, :]               # sum g dx
            s_dy = M[4:5, :] - myl * M[5:6, :]               # sum g dy
            s_dxx = M[0:1, :] - 2.0 * mxl * M[3:4, :] + mxl * mxl * M[5:6, :]
            s_dxy = (M[1:2, :] - myl * M[3:4, :] - mxl * M[4:5, :]
                     + mxl * myl * M[5:6, :])
            s_dyy = M[2:3, :] - 2.0 * myl * M[4:5, :] + myl * myl * M[5:6, :]
            g_ca = -0.5 * s_dxx
            g_cb = -s_dxy
            g_cc = -0.5 * s_dyy
            # color-channel grads: (NCH, chunk) = g_eff @ weight
            # (rows 3/5 are then d/d centered-z and d/d centered-z^2)
            g_cols = jax.lax.dot_general(
                g_eff, w["weight"], (((1,), (0,)), ((), ())),
                precision=BWD_PRECISION,
                preferred_element_type=f32)

            ok = p["ok"]
            okf = ok.astype(f32)

            # conic = V^{-1}: dL/dV = -C (dL/dC) C with symmetric packing
            a0, a1, a2 = g_ca, 0.5 * g_cb, g_cc
            ca0 = ca * a0 + cb * a1
            ca1 = ca * a1 + cb * a2
            cb0 = cb * a0 + cc * a1
            cb1 = cb * a1 + cc * a2
            g_v00 = -(ca0 * ca + ca1 * cb)
            g_v01 = -2.0 * (ca0 * cb + ca1 * cc)
            g_v11 = -(cb0 * cb + cb1 * cc)

            if mode != "pose":
                # g_power = g_alpha * op * expp on every surviving pair, so
                # sum g_alpha expp = M5 / op (exact where op > 0; op == 0
                # slots contribute no g_power and get g_lo = 0 anyway)
                iop = jnp.where(p["op"] > 0, 1.0 / jnp.maximum(p["op"], 1e-30),
                                0.0)
                g_opk = M[5:6, :] * iop
                g_lo = g_opk * p["sig"] * (1.0 - p["sig"]) * okf
                g_rgb = g_cols[0:3, :]
                g_s2 = (g_v00 * p["ax"] + g_v01 * p["bxy"]
                        + g_v11 * p["cy_"])
                g_ls = 2.0 * p["s2"] * g_s2 * okf

            if mode not in ("vals", "vals_rows"):
                g_m2x = (ca * s_dx + cb * s_dy) * okf
                g_m2y = cc * s_dy + cb * s_dx
                g_z_cols = g_cols[3:4, :] + 2.0 * w["zc"] * g_cols[5:6, :]

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
                # j00 = fx iz ; j02 = -fx tx iz^2 ; j11 = fy iz ;
                # j12 = -fy ty iz^2
                g_iz = fx * g_j00 + fy * g_j11 \
                    - 2.0 * fx * tx * iz * g_j02 - 2.0 * fy * ty * iz * g_j12
                g_tx = -fx * iz2 * g_j02
                g_ty = -fy * iz2 * g_j12
                # tx = clip(x/z, +-lim) * zs
                in_x = (jnp.abs(p["ux"]) <= p["limx"]).astype(f32)
                in_y = (jnp.abs(p["uy"]) <= p["limy"]).astype(f32)
                g_x = (g_tx * in_x + g_m2x * fx * iz) * okf
                g_y = (g_ty * in_y + g_m2y * fy * iz) * okf
                g_zs_tx = g_tx * (p["cux"] - in_x * p["ux"])
                g_zs_ty = g_ty * (p["cuy"] - in_y * p["uy"])
                # m2x = fx x iz + ... ; m2y = fy y iz + ...
                g_iz = g_iz + g_m2x * fx * p["x"] + g_m2y * fy * p["y"]
                g_zs = g_zs_tx + g_zs_ty - iz2 * g_iz
                g_z = (g_zs + g_z_cols) * okf

            if mode == "vals":
                gk = jnp.concatenate(
                    [jnp.zeros((3, chunk), f32), g_lo, g_ls, g_rgb], axis=0)
                grad_ref[b, :, pl.ds(j0, chunk)] = gk
            elif mode == "vals_rows":
                gk = jnp.concatenate(
                    [jnp.zeros((3, chunk), f32), g_lo, g_ls, g_rgb], axis=0)
                grad_ref[b, pl.ds(j0, chunk), :] = gk.T
            elif mode == "all":
                gk = jnp.concatenate([g_x, g_y, g_z, g_lo, g_ls, g_rgb],
                                     axis=0)
                grad_ref[b, :, pl.ds(j0, chunk)] = gk
            else:  # pose: contract in-kernel against world means
                g_cam = jnp.concatenate([g_x, g_y, g_z], axis=0)  # (3, chunk)
                mw = rec[0:3, :]
                rows = [jax.lax.dot_general(
                    g_cam[i:i + 1, :], mw, (((1,), (1,)), ((), ())),
                    precision=BWD_PRECISION,
                    preferred_element_type=f32) for i in range(3)]
                gt_row = jax.lax.dot_general(
                    ones_row, g_cam, (((1,), (1,)), ((), ())),
                    precision=BWD_PRECISION,
                    preferred_element_type=f32)                   # (1, 3)
                red_acc = red_acc + jnp.concatenate(rows + [gt_row], axis=1)

            T_last = w["T_after"][:, chunk - 1:chunk]
            T_new = jnp.where(T_last < T_TERMINATE, 0.0, T_last)
            return (c + 1, T_new, Hpref + jnp.sum(wGc, axis=1, keepdims=True),
                    red_acc)

        T0 = jnp.ones((TPX, 1), f32)
        H0 = jnp.zeros((TPX, 1), f32)
        red0 = jnp.zeros((1, 12), f32)
        _, _, _, red_tile = jax.lax.while_loop(cond, body, (0, T0, H0, red0))
        if mode == "pose":
            red = red + red_tile

    if mode == "pose":
        row = jnp.concatenate([red, jnp.zeros((1, 128 - 12), f32)], axis=1)
        grad_ref[0] = jnp.concatenate([row, jnp.zeros((7, 128), f32)], axis=0)


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
def splat_blend(slots8: jnp.ndarray, R: jnp.ndarray,
                trans: jnp.ndarray, counts: jnp.ndarray,
                tile_offset: jnp.ndarray, cam: Camera, tiles_x: int,
                chunk: int = 128, interpret: bool = False,
                grad_mode: str = "all") -> jnp.ndarray:
    """slots8 [T,8,mpt] + pose -> accum [T, NCH, TPX].

    T must be a multiple of BLOCK (see pad_tiles; padded tiles carry count 0).
    grad_mode selects the specialized backward (module docstring):
      "pose": only (dR, dt) — slot cotangents are zeros (tracking)
      "vals": only rows 3..7 — dR = dt = 0, mean rows zeroed (mapping)
      "all":  everything (generic / tests)

    Channel layout of accum: rows 0..5 are the render (r, g, b, z, sil,
    z^2 — assemble_image reads exactly these); row 6 carries per-pixel
    FINAL transmittance telemetry (pair-budget harm feedback,
    core/track_cache.cached_harm) and row 7 is pad. Rows 6..7 are
    VALUE-ONLY: the backward has no gradient path through them, so any
    consumer must not differentiate them (read via lax.stop_gradient or
    outside grad). The `tids` operand of the private _fwd_call/_bwd_call
    renders arbitrary tile subsets; if it ever becomes caller-facing it
    MUST also join splat_blend's signature + the _splat_fwd residuals so
    forward/backward cannot disagree.
    """
    return _fwd_call(slots8, R, trans, counts, tile_offset, cam,
                     tiles_x, chunk, interpret)


def _fwd_call(slots8, R, trans, counts, tile_offset, cam, tiles_x,
              chunk, interpret, tids=None):
    n_tiles, _, mpt = slots8.shape
    assert n_tiles % BLOCK == 0, (n_tiles, BLOCK)
    if tids is None:
        tids = jnp.arange(n_tiles, dtype=jnp.int32)
    kernel = functools.partial(_fwd_kernel, chunk=chunk, mpt=mpt, block=BLOCK)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_tiles // BLOCK,),
            in_specs=[
                pl.BlockSpec((BLOCK, 8, mpt),
                             lambda t, c_, i_, m_, cp_: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((BLOCK, NCH, TPX),
                                   lambda t, c_, i_, m_, cp_: (t, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, NCH, TPX), slots8.dtype),
        compiler_params=_params(interpret),
        interpret=interpret,
    )(counts, tids,
      jnp.stack([jnp.asarray(tiles_x, jnp.int32),
                 jnp.asarray(tile_offset, jnp.int32)]),
      _cp_vector(R, trans, cam), slots8)


def _splat_fwd(slots8, R, trans, counts, tile_offset, cam, tiles_x,
               chunk, interpret, grad_mode):
    out = _fwd_call(slots8, R, trans, counts, tile_offset, cam,
                    tiles_x, chunk, interpret)
    return out, (slots8, R, trans, counts, tile_offset, out)


def _bwd_call(slots8, R, trans, counts, tile_offset, out, g, cam,
              tiles_x, chunk, interpret, mode, tids=None):
    n_tiles, _, mpt = slots8.shape
    if tids is None:
        tids = jnp.arange(n_tiles, dtype=jnp.int32)
    kernel = functools.partial(_bwd_kernel, chunk=chunk, mpt=mpt, block=BLOCK,
                               mode=mode)
    if mode == "pose":
        out_shape = jax.ShapeDtypeStruct((n_tiles // BLOCK, 8, 128),
                                         slots8.dtype)
        out_spec = pl.BlockSpec((1, 8, 128),
                                lambda t, c_, i_, m_, cp_: (t, 0, 0))
    elif mode == "vals_rows":
        out_shape = jax.ShapeDtypeStruct((n_tiles, mpt, 8), slots8.dtype)
        out_spec = pl.BlockSpec((BLOCK, mpt, 8),
                                lambda t, c_, i_, m_, cp_: (t, 0, 0))
    else:
        out_shape = jax.ShapeDtypeStruct((n_tiles, 8, mpt), slots8.dtype)
        out_spec = pl.BlockSpec((BLOCK, 8, mpt),
                                lambda t, c_, i_, m_, cp_: (t, 0, 0))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_tiles // BLOCK,),
            in_specs=[
                pl.BlockSpec((BLOCK, 8, mpt),
                             lambda t, c_, i_, m_, cp_: (t, 0, 0)),
                pl.BlockSpec((BLOCK, NCH, TPX),
                             lambda t, c_, i_, m_, cp_: (t, 0, 0)),
                pl.BlockSpec((BLOCK, NCH, TPX),
                             lambda t, c_, i_, m_, cp_: (t, 0, 0)),
            ],
            out_specs=out_spec,
        ),
        out_shape=out_shape,
        compiler_params=_params(interpret),
        interpret=interpret,
    )(counts, tids,
      jnp.stack([jnp.asarray(tiles_x, jnp.int32),
                 jnp.asarray(tile_offset, jnp.int32)]),
      _cp_vector(R, trans, cam), slots8, out, g)


def _splat_bwd(cam, tiles_x, chunk, interpret, grad_mode, res, g):
    slots8, R, trans, counts, tile_offset, out = res
    n_tiles, _, mpt = slots8.shape
    f32 = slots8.dtype
    grad = _bwd_call(slots8, R, trans, counts, tile_offset, out, g,
                     cam, tiles_x, chunk, interpret, grad_mode)

    if grad_mode == "pose":
        g_R = jnp.sum(grad[:, 0, 0:9], axis=0)
        g_t = jnp.sum(grad[:, 0, 9:12], axis=0)
        g_slots = jnp.zeros((n_tiles, 8, mpt), f32)
    elif grad_mode == "vals":
        g_R = jnp.zeros((9,), f32)
        g_t = jnp.zeros((3,), f32)
        g_slots = grad          # mean rows zeroed in-kernel; NO slicing here
    else:  # all
        g_mc = grad[:, 0:3, :]                   # d/d mean_cam
        g_R = jnp.einsum("tim,tjm->ij", g_mc, slots8[:, 0:3, :]).reshape(9)
        g_t = jnp.sum(g_mc, axis=(0, 2))
        g_w = jnp.einsum("ij,tjm->tim", R.reshape(3, 3).T, g_mc)
        g_slots = jnp.concatenate([g_w, grad[:, 3:8, :]], axis=1)
    f0 = jax.dtypes.float0
    return (g_slots, g_R, g_t, np.zeros(counts.shape, f0),
            np.zeros(jnp.shape(tile_offset), f0))


splat_blend.defvjp(_splat_fwd, _splat_bwd)


def assemble_image(accum: jnp.ndarray, cam: Camera,
                   tile: int = TILE) -> jnp.ndarray:
    """[Tp, NCH, TPX] (channel-major, possibly block-padded) -> (6, H, W)."""
    tiles_x = -(-cam.width // tile)
    tiles_y = -(-cam.height // tile)
    n_tiles = tiles_x * tiles_y
    img = accum[:n_tiles, :6, :].reshape(tiles_y, tiles_x, 6, tile, tile)
    img = img.transpose(2, 0, 3, 1, 4).reshape(6, tiles_y * tile,
                                               tiles_x * tile)
    return img[:, :cam.height, :cam.width]
