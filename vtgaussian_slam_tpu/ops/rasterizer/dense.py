"""Dense (every-Gaussian-every-pixel) differentiable renderer.

Correctness oracle for the tiled/Pallas renderers and a practical fallback for
tiny scenes and unit tests. O(N * H * W) compute, chunked over Gaussians to
bound memory; exact same projection + blend semantics as the production path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..camera import Camera
from .blend import blend_chunk, gaussian_alpha
from .projection import project_gaussians


def render_dense(
    means_cam: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    cam: Camera,
    active: jnp.ndarray | None = None,
    chunk: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render (C, H, W) image + per-Gaussian pixel radii (N,).

    Gaussians are globally depth-sorted and composited front-to-back over all
    pixels. `colors` is (N, C) with arbitrary channel count (the SLAM layer
    renders RGB and the (z, 1, z^2) depth/silhouette channels in one pass).
    """
    N = means_cam.shape[0]
    C = colors.shape[1]
    H, W = cam.height, cam.width
    P = H * W

    proj = project_gaussians(means_cam, quats, scales, opacities, cam, active)
    order = jnp.argsort(proj.depth)  # invalid have depth=inf -> sorted last

    s_mean2d = proj.mean2d[order]
    s_conic = proj.conic[order]
    s_opac = proj.opacity[order]
    s_valid = proj.valid[order]
    s_colors = colors[order]

    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    pix = jnp.stack([xs, ys], -1).reshape(P, 2).astype(means_cam.dtype)

    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        s_mean2d = jnp.pad(s_mean2d, ((0, pad), (0, 0)))
        s_conic = jnp.pad(s_conic, ((0, pad), (0, 0)), constant_values=1.0)
        s_opac = jnp.pad(s_opac, ((0, pad),))
        s_valid = jnp.pad(s_valid, ((0, pad),))
        s_colors = jnp.pad(s_colors, ((0, pad), (0, 0)))

    def body(carry, xs_chunk):
        T, accum = carry
        m2d, con, op, vld, col = xs_chunk
        alpha = gaussian_alpha(m2d, con, op, pix, vld)
        T, accum = blend_chunk(T, accum, alpha, col)
        return (T, accum), None

    init = (
        jnp.ones((P,), means_cam.dtype),
        jnp.zeros((P, C), means_cam.dtype),
    )
    xs_chunks = tuple(
        a.reshape((n_chunks, chunk) + a.shape[1:])
        for a in (s_mean2d, s_conic, s_opac, s_valid, s_colors)
    )
    (T, accum), _ = jax.lax.scan(jax.checkpoint(body), init, xs_chunks)

    img = accum.T.reshape(C, H, W)
    return img, proj.radius
