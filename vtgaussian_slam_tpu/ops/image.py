"""Host-side image ops: geometric edge mask (Canny + dilate).

Replaces the reference's cv2-based `geometric_edge_mask`
(/root/reference/src/vtgaussian_slam.py:1025-1044): Canny(50, 200,
aperture 3, L2 gradient) on the grayscale image, dilated 3x3 once. The mask
gates which hi-res pixels the densification stream back-projects (SURVEY.md
2.16). cv2 is used when present (exact parity); a numpy Canny (Sobel + NMS +
hysteresis) is the fallback.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def geometric_edge_mask(rgb_image: np.ndarray, dilate: bool = True,
                        RGB: bool = True) -> np.ndarray:
    """uint8 edge mask (0/255) of an (H, W, 3) image."""
    img = np.asarray(rgb_image)
    if cv2 is not None:
        gray = cv2.cvtColor(
            img.astype(np.uint8),
            cv2.COLOR_RGB2GRAY if RGB else cv2.COLOR_BGR2GRAY)
        edges = cv2.Canny(gray, threshold1=50, threshold2=200,
                          apertureSize=3, L2gradient=True)
        if dilate:
            edges = cv2.dilate(edges, np.ones((3, 3), np.uint8), iterations=1)
        return edges
    return _canny_numpy(img, RGB=RGB, dilate=dilate)


def _canny_numpy(img: np.ndarray, RGB: bool, dilate: bool,
                 low: float = 50.0, high: float = 200.0) -> np.ndarray:
    """Minimal Canny: Sobel gradients + NMS + double-threshold hysteresis."""
    w = np.array([0.299, 0.587, 0.114]) if RGB else np.array([0.114, 0.587, 0.299])
    gray = (img[..., :3].astype(np.float64) @ w)

    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], float)
    ky = kx.T

    def conv(a, k):
        out = np.zeros_like(a)
        ap = np.pad(a, 1, mode="edge")
        for i in range(3):
            for j in range(3):
                out += k[i, j] * ap[i : i + a.shape[0], j : j + a.shape[1]]
        return out

    gx, gy = conv(gray, kx), conv(gray, ky)
    mag = np.hypot(gx, gy)
    ang = (np.rad2deg(np.arctan2(gy, gx)) + 180.0) % 180.0

    # non-maximum suppression along the gradient direction
    mp = np.pad(mag, 1)
    H, W = mag.shape
    n1 = np.zeros_like(mag)
    n2 = np.zeros_like(mag)
    sel_h = (ang < 22.5) | (ang >= 157.5)
    sel_d1 = (ang >= 22.5) & (ang < 67.5)
    sel_v = (ang >= 67.5) & (ang < 112.5)
    sel_d2 = (ang >= 112.5) & (ang < 157.5)
    pairs = {
        "h": (mp[1 : H + 1, 2 : W + 2], mp[1 : H + 1, 0:W]),
        "d1": (mp[2 : H + 2, 2 : W + 2], mp[0:H, 0:W]),
        "v": (mp[2 : H + 2, 1 : W + 1], mp[0:H, 1 : W + 1]),
        "d2": (mp[2 : H + 2, 0:W], mp[0:H, 2 : W + 2]),
    }
    for sel, key in ((sel_h, "h"), (sel_d1, "d1"), (sel_v, "v"), (sel_d2, "d2")):
        a, b = pairs[key]
        n1 = np.where(sel, a, n1)
        n2 = np.where(sel, b, n2)
    nms = np.where((mag >= n1) & (mag >= n2), mag, 0.0)

    strong = nms >= high
    weak = (nms >= low) & ~strong
    # hysteresis: keep weak pixels connected to strong ones (few dilation passes)
    keep = strong.copy()
    for _ in range(8):
        kp = np.pad(keep, 1)
        neigh = np.zeros_like(keep)
        for di in range(3):
            for dj in range(3):
                neigh |= kp[di : di + H, dj : dj + W]
        new = keep | (weak & neigh)
        if np.array_equal(new, keep):
            break
        keep = new
    edges = (keep * 255).astype(np.uint8)
    if dilate:
        ep = np.pad(edges, 1)
        out = np.zeros_like(edges)
        for di in range(3):
            for dj in range(3):
                out = np.maximum(out, ep[di : di + H, dj : dj + W])
        edges = out
    return edges


def resize_mask_nearest(mask: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor mask resize (cv2.INTER_NEAREST parity, :779)."""
    if cv2 is not None:
        return cv2.resize(mask.astype(np.uint8), (width, height),
                          interpolation=cv2.INTER_NEAREST)
    ys = (np.arange(height) * mask.shape[0] / height).astype(int)
    xs = (np.arange(width) * mask.shape[1] / width).astype(int)
    return mask[ys][:, xs]
