"""Public rasterizer API.

`render` replaces `GaussianRasterizer(raster_settings)(**rendervar)` of the
reference (/root/reference/utils/recon_helpers.py:2-27; call sites
/root/reference/src/vtgaussian_slam.py:461,466,747). Differences by design:

- colors can have any channel count: the SLAM layer concatenates RGB with the
  (z, 1, z^2) depth/silhouette channels and renders both reference passes in
  ONE pass (the geometry is identical between the reference's two calls —
  SURVEY.md section 6, hard part 5).
- `active` masks capacity-padded Gaussian buffers (static shapes under jit).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..camera import Camera
from .dense import render_dense
from .tiled import render_tiled


class RenderOutput(NamedTuple):
    image: jnp.ndarray   # (C, H, W)
    radii: jnp.ndarray   # (N,) pixel radii; > 0 == "seen"


def render(
    means_cam: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    cam: Camera,
    active: jnp.ndarray | None = None,
    backend: str = "tiled",
    **kwargs,
) -> RenderOutput:
    if backend == "dense":
        img, radii = render_dense(means_cam, quats, scales, opacities, colors,
                                  cam, active, **kwargs)
    elif backend == "tiled":
        img, radii = render_tiled(means_cam, quats, scales, opacities, colors,
                                  cam, active, **kwargs)
    else:
        raise ValueError(f"unknown rasterizer backend {backend!r}")
    return RenderOutput(image=img, radii=radii)
