"""Pallas TPU kernel: per-tile front-to-back alpha compositing.

The native centerpiece of the rebuild — the hand-written replacement for the
CUDA rasterizer's render kernel (SURVEY.md 2.9a item 1). The XLA blend
(tiled.py) must process every padded slot of the per-tile depth list; this
kernel walks a tile's ACTUAL pair count in chunks with a real `while_loop`
and terminates as soon as every pixel of the tile is saturated
(min transmittance < 1e-4) — the CUDA kernel's early-out economics.

Layout (chosen so NO vector relayouts occur in the hot loop):
  - records are stored TRANSPOSED per tile: [n_tiles, RECW, mpt] — fields on
    sublanes, record slots on lanes. A chunk slice (RECW, 128) puts each
    field at a natural (1, chunk) lane-vector.
  - pixels live on sublanes: panels are (TPX=256, chunk=128) — broadcasting
    (TPX, 1) pixel coords against (1, chunk) fields needs no transposes.
  - the sequential blend becomes an exclusive cumulative product along
    LANES (log-step shifted adds of log(1-alpha)).
  - color accumulation and the backward contractions are MXU matmuls
    contracting over the chunk lanes.

The backward pass replays the walk with the suffix identity

  d out[p,:]/d alpha[k,p] = T_in[k,p] c[k] - (out[p,:] - prefix[k,p,:])/(1-alpha[k,p])

contracted against the cotangent in 2-D panels, writing per-slot record
gradients [n_tiles, RECW, mpt] that XLA scatter-adds back onto the Gaussians
(the transpose of the record gather — TPU's analogue of CUDA atomics).

Record rows (RECW=16):
  0: mean2d.x  1: mean2d.y  2: conic.a  3: conic.b  4: conic.c  5: opacity
  6..6+C: colors (C <= 8)   rest: padding
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend import ALPHA_MAX, ALPHA_MIN, T_TERMINATE

RECW = 16       # record rows
TILE = 16       # pixels per tile side
TPX = TILE * TILE


def _cumsum_lanes(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive cumulative sum along lanes (axis 1) in log2(k) steps
    (Mosaic has no cumsum primitive)."""
    shift = 1
    while shift < k:
        x = x + jnp.pad(x, ((0, 0), (shift, 0)))[:, :k]
        shift *= 2
    return x


def _cumprod_lanes(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive cumulative product along lanes, same log-step trick.

    Replaces the exp(cumsum(log1p(-alpha))) transmittance chain with a direct
    product — three transcendental panels fewer per chunk than the log-space
    form, with the same numerical range (terms are in [0.01, 1])."""
    shift = 1
    while shift < k:
        x = x * jnp.pad(x, ((0, 0), (shift, 0)), constant_values=1.0)[:, :k]
        shift *= 2
    return x


def _shift_in_ones(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift right one lane, filling with 1 (exclusive-product helper)."""
    return jnp.pad(x, ((0, 0), (1, 0)), constant_values=1.0)[:, :k]


def _pixel_coords(tile_y, tile_x, dtype):
    """(TPX, 1) sublane vectors of global pixel coordinates."""
    ly = jax.lax.broadcasted_iota(jnp.int32, (TPX, 1), 0) // TILE
    lx = jax.lax.broadcasted_iota(jnp.int32, (TPX, 1), 0) % TILE
    px = (tile_x * TILE + lx).astype(dtype)
    py = (tile_y * TILE + ly).astype(dtype)
    return px, py


def _fwd_kernel(count_ref, tiles_x_ref, recs_ref, out_ref, *,
                chunk: int, mpt: int, n_channels: int):
    t = pl.program_id(0)
    count = count_ref[t]
    tiles_x = tiles_x_ref[0]
    ty = t // tiles_x
    tx = t % tiles_x
    px, py = _pixel_coords(ty, tx, out_ref.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    n_chunks = pl.cdiv(count, chunk)

    def cond(carry):
        c, T, _ = carry
        return (c < n_chunks) & (jnp.max(T) >= T_TERMINATE)

    def body(carry):
        c, T, accum = carry
        j0 = c * chunk
        rec = recs_ref[0, :, pl.ds(j0, chunk)]        # (RECW, chunk)
        m2x, m2y = rec[0:1, :], rec[1:2, :]
        ca, cb, cc, op = rec[2:3, :], rec[3:4, :], rec[4:5, :], rec[5:6, :]
        dx = px - m2x                                  # (TPX, chunk)
        dy = py - m2y
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        keep = (power <= 0) & (alpha >= ALPHA_MIN) & (lane + j0 < count)
        alpha = jnp.where(keep, alpha, 0.0)

        cp = _cumprod_lanes(1.0 - alpha, chunk)        # inclusive prod(1-a)
        T_after = T * cp                               # T is (TPX, 1)
        T_in = T * _shift_in_ones(cp, chunk)           # exclusive product
        include = T_after >= T_TERMINATE
        weight = jnp.where(include, alpha * T_in, 0.0)

        cols = rec[6:6 + n_channels, :]                # (C, chunk)
        accum = accum + jax.lax.dot_general(
            weight, cols, (((1,), (1,)), ((), ())),    # (TPX, C)
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=accum.dtype)
        # T_after is monotone along lanes, so the chunk exit value is the last
        # lane. A pixel whose T crossed the threshold is DONE (the crossing
        # Gaussian is never blended, CUDA semantics): park its T at 0 so the
        # whole-tile early exit `max(T) >= T_TERMINATE` can actually fire.
        T_last = T_after[:, chunk - 1:chunk]
        T_new = jnp.where(T_last < T_TERMINATE, 0.0, T_last)
        return c + 1, T_new, accum

    T0 = jnp.ones((TPX, 1), out_ref.dtype)
    A0 = jnp.zeros((TPX, n_channels), out_ref.dtype)
    _, _, accum = jax.lax.while_loop(cond, body, (0, T0, A0))
    out_ref[0] = accum


def _bwd_kernel(count_ref, tiles_x_ref, recs_ref, out_ref, g_ref,
                grad_ref, *, chunk: int, mpt: int, n_channels: int):
    t = pl.program_id(0)
    count = count_ref[t]
    tiles_x = tiles_x_ref[0]
    ty = t // tiles_x
    tx = t % tiles_x
    f32 = grad_ref.dtype
    px, py = _pixel_coords(ty, tx, f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    grad_ref[0] = jnp.zeros((RECW, mpt), f32)

    out_total = out_ref[0]                 # (TPX, C)
    g = g_ref[0]                           # (TPX, C)
    GG = jnp.sum(g * out_total, axis=1, keepdims=True)   # (TPX, 1)

    n_chunks = pl.cdiv(count, chunk)

    def cond(carry):
        c, T, _ = carry
        return (c < n_chunks) & (jnp.max(T) >= T_TERMINATE)

    def body(carry):
        c, T, Hpref = carry                # T, Hpref: (TPX, 1)
        j0 = c * chunk
        rec = recs_ref[0, :, pl.ds(j0, chunk)]
        m2x, m2y = rec[0:1, :], rec[1:2, :]
        ca, cb, cc, op = rec[2:3, :], rec[3:4, :], rec[4:5, :], rec[5:6, :]
        dx = px - m2x
        dy = py - m2y
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        expp = jnp.exp(power)
        alpha_raw = op * expp
        clamped = alpha_raw > ALPHA_MAX
        alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
        keep = (power <= 0) & (alpha >= ALPHA_MIN) & (lane + j0 < count)
        alpha = jnp.where(keep, alpha, 0.0)

        cp = _cumprod_lanes(1.0 - alpha, chunk)
        T_after = T * cp
        T_in = T * _shift_in_ones(cp, chunk)
        include = T_after >= T_TERMINATE
        weight = jnp.where(include, alpha * T_in, 0.0)

        cols = rec[6:6 + n_channels, :]    # (C, chunk)
        # Gc[p,k] = sum_c g[p,c] cols[c,k]
        Gc = jax.lax.dot_general(g, cols, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=f32)  # (TPX, chunk)
        wGc = weight * Gc
        Hk = Hpref + _cumsum_lanes(wGc, chunk)
        inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1e-6)
        g_alpha = jnp.where(
            include & keep & (~clamped),
            T_in * Gc - (GG - Hk) * inv_om, 0.0)       # (TPX, chunk)

        g_power = g_alpha * alpha
        # per-record grads: reductions over pixel sublanes -> (1, chunk) rows
        g_m2x = jnp.sum(g_power * (ca * dx + cb * dy), axis=0, keepdims=True)
        g_m2y = jnp.sum(g_power * (cc * dy + cb * dx), axis=0, keepdims=True)
        g_ca = jnp.sum(g_power * (-0.5 * dx * dx), axis=0, keepdims=True)
        g_cb = jnp.sum(g_power * (-dx * dy), axis=0, keepdims=True)
        g_cc = jnp.sum(g_power * (-0.5 * dy * dy), axis=0, keepdims=True)
        g_op = jnp.sum(g_alpha * expp * keep, axis=0, keepdims=True)
        # color grads: (C, chunk) = g^T @ weight
        g_col = jax.lax.dot_general(g, weight, (((0,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=f32)

        gk = jnp.concatenate(
            [g_m2x, g_m2y, g_ca, g_cb, g_cc, g_op, g_col,
             jnp.zeros((RECW - 6 - n_channels, chunk), f32)], axis=0)
        grad_ref[0, :, pl.ds(j0, chunk)] = gk

        T_last = T_after[:, chunk - 1:chunk]
        T_new = jnp.where(T_last < T_TERMINATE, 0.0, T_last)
        return c + 1, T_new, Hpref + jnp.sum(wGc, axis=1, keepdims=True)

    T0 = jnp.ones((TPX, 1), f32)
    H0 = jnp.zeros((TPX, 1), f32)
    jax.lax.while_loop(cond, body, (0, T0, H0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def blend_tiles(recs: jnp.ndarray, counts: jnp.ndarray, tiles_x: int,
                chunk: int = 128, n_channels: int = 8,
                interpret: bool = False) -> jnp.ndarray:
    """recs [n_tiles, RECW, mpt], counts [n_tiles] -> accum [n_tiles, TPX, C].

    Preconditions (violations would SILENTLY corrupt output: Pallas clamps
    an out-of-range dynamic-slice start, re-blending earlier records under
    a mask that assumes the unclamped offset): chunk divides mpt, and every
    count <= mpt (binning clamps counts; tiled.py rounds mpt up)."""
    assert recs.shape[2] % chunk == 0, (recs.shape, chunk)
    out, _ = _blend_fwd_impl(recs, counts, tiles_x, chunk, n_channels,
                             interpret)
    return out


def _params(interpret):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _blend_fwd_impl(recs, counts, tiles_x, chunk, n_channels, interpret):
    n_tiles, _, mpt = recs.shape
    kernel = functools.partial(_fwd_kernel, chunk=chunk, mpt=mpt,
                               n_channels=n_channels)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, RECW, mpt), lambda t, c_, tx_: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TPX, n_channels),
                                   lambda t, c_, tx_: (t, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, TPX, n_channels), recs.dtype),
        compiler_params=_params(interpret),
        interpret=interpret,
    )(counts, jnp.asarray([tiles_x], jnp.int32), recs)
    return out, None


def _blend_fwd(recs, counts, tiles_x, chunk, n_channels, interpret):
    out, _ = _blend_fwd_impl(recs, counts, tiles_x, chunk, n_channels,
                             interpret)
    return out, (recs, counts, out)


def _blend_bwd(tiles_x, chunk, n_channels, interpret, res, g):
    recs, counts, out = res
    n_tiles, _, mpt = recs.shape
    kernel = functools.partial(_bwd_kernel, chunk=chunk, mpt=mpt,
                               n_channels=n_channels)
    grad = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, RECW, mpt), lambda t, c_, tx_: (t, 0, 0)),
                pl.BlockSpec((1, TPX, n_channels), lambda t, c_, tx_: (t, 0, 0)),
                pl.BlockSpec((1, TPX, n_channels), lambda t, c_, tx_: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, RECW, mpt), lambda t, c_, tx_: (t, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, RECW, mpt), recs.dtype),
        compiler_params=_params(interpret),
        interpret=interpret,
    )(counts, jnp.asarray([tiles_x], jnp.int32), recs, out, g)
    return grad, None


blend_tiles.defvjp(_blend_fwd, _blend_bwd)
