"""Front-to-back alpha compositing, expressed as a parallel prefix.

The CUDA rasterizer blends Gaussians sequentially per pixel. On TPU the same
math is computed as a chunked parallel scan: within a chunk of K depth-sorted
Gaussians, per-Gaussian transmittance is an exclusive cumulative product
(computed as exp(cumsum(log1p(-alpha)))), so the whole chunk blends with
vectorized VPU/MXU ops; a per-pixel carry threads transmittance across chunks.

Semantics replicated from the CUDA forward
(diff-gaussian-rasterization render kernel, see SURVEY.md 2.9):
  - alpha = min(0.99, opacity * exp(power)); skipped if power > 0
  - Gaussians with alpha < 1/255 are skipped (do not touch T)
  - a Gaussian that would push T below 1e-4 is not blended and terminates
    the pixel; with monotone T this is exactly `include = T_after >= 1e-4`
  - background is black (bg=0, /root/reference/utils/recon_helpers.py:19)
"""
from __future__ import annotations

import jax.numpy as jnp

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_TERMINATE = 1e-4


def gaussian_alpha(
    mean2d: jnp.ndarray,   # (..., K, 2)
    conic: jnp.ndarray,    # (..., K, 3)
    opacity: jnp.ndarray,  # (..., K)
    pix: jnp.ndarray,      # (..., P, 2) pixel coordinates
    pair_valid: jnp.ndarray,  # (..., K) bool
) -> jnp.ndarray:
    """Evaluate per-(Gaussian, pixel) alpha: (..., K, P)."""
    d = pix[..., None, :, :] - mean2d[..., :, None, :]          # (..., K, P, 2)
    dx, dy = d[..., 0], d[..., 1]
    a = conic[..., 0:1]
    b = conic[..., 1:2]
    c = conic[..., 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy     # (..., K, P)
    alpha = jnp.minimum(ALPHA_MAX, opacity[..., None] * jnp.exp(power))
    keep = (power <= 0) & (alpha >= ALPHA_MIN) & pair_valid[..., None]
    return jnp.where(keep, alpha, 0.0)


def blend_chunk(
    carry_T: jnp.ndarray,   # (..., P) running transmittance
    accum: jnp.ndarray,     # (..., P, C) accumulated color
    alpha: jnp.ndarray,     # (..., K, P) per-Gaussian alpha (depth-sorted)
    colors: jnp.ndarray,    # (..., K, C)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Blend one depth-sorted chunk; returns updated (carry_T, accum)."""
    log_om = jnp.log1p(-alpha)                              # log(1 - alpha), >= log(0.01)
    cum = jnp.cumsum(log_om, axis=-2)                       # inclusive over K
    T_after = carry_T[..., None, :] * jnp.exp(cum)          # (..., K, P)
    T_before = carry_T[..., None, :] * jnp.exp(cum - log_om)
    include = T_after >= T_TERMINATE
    weight = jnp.where(include, alpha * T_before, 0.0)       # (..., K, P)
    accum = accum + jnp.einsum(
        "...kp,...kc->...pc", weight, colors, preferred_element_type=accum.dtype
    )
    # A pixel whose transmittance crossed the termination threshold is DONE:
    # the crossing Gaussian is never blended and no later Gaussian revives the
    # pixel (CUDA sticky `done` flag). T_after is monotone non-increasing
    # along the depth axis, so the crossing test is just the last entry; done
    # pixels park T at 0 so downstream chunks exclude everything.
    T_last = T_after[..., -1, :]
    new_T = jnp.where(T_last < T_TERMINATE, 0.0, T_last)
    return new_T, accum
