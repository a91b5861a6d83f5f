"""Keyframe / base-frame overlap selection.

TPU redesign of the live subset of `utils/keyframe_selection.py` (SURVEY.md
2.17). The geometric scoring — back-project current depth, reproject into
each candidate keyframe, count in-frustum (and optionally depth-consistent)
points — runs as ONE batched jit over a padded keyframe buffer (the reference
loops per keyframe with host<->device shuttling). The tiny list logic on top
(sorting, threshold decay, earliest-chain walk) stays on host: it is
O(#baseframes) Python over scalars.

Score semantics:
  percent_inside = mean over sampled valid pixels of
      in-image(edge margin, strict) & z > 0
      [& |depth_sample - z| < thres * min(depth_sample, z)]   (vis-based)
  (/root/reference/utils/keyframe_selection.py:40-116 plain,
   :121-229 vis-based, :581-724 dynamic-threshold earliest top-k,
   :1581-1613 earliest-chain walk.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry as geo


@functools.partial(jax.jit, static_argnames=("pixels", "edge", "use_vis",
                                             "depth_stride"))
def overlap_percents(
    gt_depth: jnp.ndarray,      # (H, W) current frame depth
    w2c: jnp.ndarray,           # (4, 4) current pose estimate
    intrinsics: jnp.ndarray,    # (3, 3)
    kf_w2cs: jnp.ndarray,       # (B, 4, 4) candidate keyframe poses
    kf_depths: jnp.ndarray,     # (B, H/s, W/s) candidate depths (vis mode),
    #                             subsampled by depth_stride (BaseframeStore)
    rng: jnp.ndarray,
    pixels: int = 1600,         # 0 => use all pixels (vis-based variants)
    edge: int = 20,
    use_vis: bool = False,
    kf_depth_thresh: float = 0.01,
    depth_stride: int = 1,
) -> jnp.ndarray:
    """Batched percent_inside for all B candidates. Invalid rows score 0."""
    H, W = gt_depth.shape
    flat = gt_depth.reshape(-1)
    valid = flat > 0

    if pixels > 0:
        # sample `pixels` indices among valid ones (reference: torch.randint
        # over the valid-index array, :58). Draw by sampling ranks into the
        # prefix-sum of validity.
        n_valid = jnp.sum(valid.astype(jnp.int32))
        ranks = jax.random.randint(rng, (pixels,), 0, jnp.maximum(n_valid, 1))
        cum = jnp.cumsum(valid.astype(jnp.int32)) - 1
        idx = jnp.searchsorted(cum, ranks, side="left")
        rows, cols = idx // W, idx % W
        # a frame with ZERO valid depth (dropped sensor frame) must score 0
        # everywhere — the clamped searchsorted would otherwise sample one
        # garbage corner pixel 1600 times (the reference crashes here)
        pmask = jnp.full((pixels,), True) & (n_valid > 0)
    else:
        idx = jnp.arange(H * W)
        rows, cols = idx // W, idx % W
        pmask = valid

    pts = geo.backproject_at(gt_depth, intrinsics, rows, cols,
                             c2w=geo.invert_se3(w2c))

    def score(kf_w2c, kf_depth):
        pc = geo.transform_points(kf_w2c, pts)
        uv, z = geo.project_points(pc, intrinsics)
        m = (
            (uv[:, 0] < W - edge) & (uv[:, 0] > edge)
            & (uv[:, 1] < H - edge) & (uv[:, 1] > edge)
            & (z > 0) & pmask
        )
        if use_vis:
            # stored pixel (i, j) holds the full-res sample at (i*s, j*s)
            d = geo.bilinear_sample(kf_depth, uv / depth_stride)
            m = m & (jnp.abs(d - z) < kf_depth_thresh * jnp.minimum(d, z))
        # percent over the VALID sampled pixels: the reference backprojects
        # only valid-depth pixels and divides by their count
        # (keyframe_selection.py:121-229); dividing by H*W would scale every
        # score by the frame's valid fraction and shift threshold decisions
        return jnp.sum(m) / jnp.maximum(jnp.sum(pmask), 1)

    return jax.vmap(score)(kf_w2cs, kf_depths)


def select_topk_overlap(percents: np.ndarray, k: int) -> list[int]:
    """ids sorted by percent desc, keep > 0, take first k (reference :92-101).
    Ties broken by id order like python's stable sort."""
    order = sorted(range(len(percents)), key=lambda i: -float(percents[i]))
    return [i for i in order if percents[i] > 0.0][:k]


def select_visbased(percents: np.ndarray, k: int, earliest_thres: float = 0.5):
    """(top-k ids, earliest id above threshold) — reference :192-229."""
    order = sorted(range(len(percents)), key=lambda i: -float(percents[i]))
    selected = [i for i in order if percents[i] > 0.0][:k]
    above = [i for i in order if percents[i] > earliest_thres]
    earliest = [above[-1]] if above else list(selected)
    return selected, earliest


def select_earliest_topk_base(
    percents: np.ndarray,
    config: dict,
    earliest_thres: float,
    lower_percent: float,
    topk_base: int | None,
) -> list[int]:
    """Dynamic-threshold earliest base-section selection (reference :581-724).

    Decays the overlap threshold by `lower_percent` until >= 3 distinct base
    sections qualify (or the pool is small / threshold < 0.01), then returns
    the earliest `topk_base` SECTION ids (threshold-sorted pool, id-sorted).
    """
    n = len(percents)
    num_overlap_in_base = int(config["baseframe_every"] / config["overlap_every"])
    entries = sorted(range(n), key=lambda i: -float(percents[i]))

    thres = earliest_thres
    it = 0
    while True:
        if it > 0:
            thres = lower_percent * thres
        filtered = [i for i in entries if percents[i] > thres]
        quantized = sorted({i // num_overlap_in_base for i in filtered})
        it += 1
        if (len(quantized) >= 3
                or (n <= 3 * num_overlap_in_base and len(quantized) > 0)
                or thres < 0.01):
            break

    if not filtered:
        filtered = [n - 1]  # fall back to the latest keyframe (:683-684)
    filtered = sorted(filtered)
    quantized = sorted({i // num_overlap_in_base for i in filtered})
    if topk_base is None:
        return sorted({filtered[0] // num_overlap_in_base})
    return quantized[: min(topk_base, len(quantized))]


def find_earliest_keyframe(
    corr_list: list,
    score_one,
    baseframe_every: int,
    threshold: float,
) -> int:
    """Walk the tracking correspondence chain back while overlap > threshold.

    Parity: `find_earliest_keyframe`
    (/root/reference/utils/keyframe_selection.py:1581-1613). `corr_list`
    entries are [keyframe_id, latest_id, current_id]; `score_one(baseframe_idx)`
    returns the percent_inside of the current frame against that base frame.
    """
    rev = corr_list[::-1]
    current = rev[0][0]
    earliest = current
    while current >= 0:
        current = next((i for i, _, x in rev if x == current), -100)
        if current >= 0:
            if score_one(int(current / baseframe_every)) > threshold:
                earliest = current
            else:
                break
    return earliest
