"""Tile binning for the splatting rasterizer, shared by all render paths.

TPU-native replacement for the CUDA rasterizer's duplicate-key emission +
radix sort stage (SURVEY.md 2.9): every Gaussian owns a fixed budget of
span_cap^2 (tile, depth, gaussian) pair slots (unused slots carry a sentinel
tile that sorts to the end), one stable `lax.sort` of a fused int32
(tile << depth_bits | quantized_depth) key replaces the 64-bit radix sort,
and per-tile windows of the sorted order form a static-shape
[n_tiles, max_pairs_per_tile] gather table.

`with_inverse=True` additionally inverts the slot permutation: for every
(gaussian, slot) pair it records the flattened table position it landed in
(or -1 if culled/truncated). This is the TPU analogue of the CUDA backward's
atomic gradient accumulation: the transpose of the table gather becomes a
dense (N, span_cap^2) GATHER + sum instead of a scatter-add over
n_tiles*max_pairs_per_tile rows (measured 72 ms vs 18 ms at the Replica
room0 working set). Because binning inputs (means, poses) are frozen during
tracking phases and whole mapping phases (mapping lrs for means3D and
unnorm_rotations are 0 in every reference config, e.g.
/root/reference/configs/replica/room0.py:99-107), the inverse map is built
once per phase and amortized over all iterations.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians


class BinnedPairs(NamedTuple):
    tab: jnp.ndarray        # (n_tiles, mpt) int32 gaussian index per slot
    counts: jnp.ndarray     # (n_tiles,) int32 valid slots per tile
    inv_pos: jnp.ndarray | None  # (N, span_cap^2) int32 flattened table
    #                              position (tile*mpt + j) or -1


class BinnedPairs2C(NamedTuple):
    """Two-class binning: a small DENSE tile class keeps the full pair
    budget while the rest run a smaller one (see bin_two_class)."""
    tab_d: jnp.ndarray      # (Kp, mpt_d) int32 gaussian index per slot
    counts_d: jnp.ndarray   # (Kp,)
    tids_d: jnp.ndarray     # (Kp,) int32 global tile id per dense row
    tab_s: jnp.ndarray      # (Sp, mpt_s)
    counts_s: jnp.ndarray   # (Sp,)
    tids_s: jnp.ndarray     # (Sp,)
    merge: jnp.ndarray      # (n_tiles,) int32 row into [accum_d; accum_s]
    inv_pos: jnp.ndarray | None  # (N, s2) positions in the flat layout
    #   [dense block: r*mpt_d + j (r < Kp) | sparse: Kp*mpt_d + r*mpt_s + j]


def tile_rects(proj: ProjectedGaussians, tile: int, span_cap: int,
               tiles_x: int, tiles_y: int):
    """Tile rectangle per Gaussian (CUDA getRect semantics, with span cap).

    Oversized rects are re-centered on the tile containing the mean so large
    splats keep their nearest tiles (the fork's tightened "smallerGSradii"
    screen bound plays the same truncation role).
    Returns (rx0, ry0, span_x, span_y, valid).
    """
    px, py = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = proj.radius
    rx0 = jnp.clip(jnp.floor((px - r) / tile), 0, tiles_x).astype(jnp.int32)
    ry0 = jnp.clip(jnp.floor((py - r) / tile), 0, tiles_y).astype(jnp.int32)
    rx1 = jnp.clip(jnp.floor((px + r) / tile) + 1, 0, tiles_x).astype(jnp.int32)
    ry1 = jnp.clip(jnp.floor((py + r) / tile) + 1, 0, tiles_y).astype(jnp.int32)
    ctx = jnp.clip(jnp.floor(px / tile), 0, tiles_x - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(py / tile), 0, tiles_y - 1).astype(jnp.int32)
    rx0 = jnp.where(rx1 - rx0 > span_cap,
                    jnp.clip(ctx - span_cap // 2, rx0, rx1 - span_cap), rx0)
    ry0 = jnp.where(ry1 - ry0 > span_cap,
                    jnp.clip(cty - span_cap // 2, ry0, ry1 - span_cap), ry0)
    span_x = jnp.minimum(rx1 - rx0, span_cap)
    span_y = jnp.minimum(ry1 - ry0, span_cap)
    valid = proj.valid & (span_x > 0) & (span_y > 0)
    return rx0, ry0, span_x, span_y, valid


def _pair_sort(proj: ProjectedGaussians, tile: int, span_cap: int,
               tiles_x: int, tiles_y: int, select: str) -> dict:
    """Shared binning stage: emit every (tile, gaussian) pair slot, rank it
    with ONE stable fused-key sort, and locate per-tile windows.

    The fused int32 key is `tile << depth_bits | rank` where rank is the
    LOG-quantized depth (select="depth") or the quantized
    -log(max-alpha-over-the-tile) importance (select="importance") — see
    bin_gaussians for why. Returns the sorted keys/ids, per-tile window
    edges, and the quantized depth (for the importance re-sort)."""
    N = proj.mean2d.shape[0]
    n_tiles = tiles_x * tiles_y
    s2 = span_cap * span_cap
    p_max = N * s2
    # static bit split: tiles in the high bits, quantized depth below
    depth_bits = min(31 - max(int(n_tiles).bit_length(), 1), 21)
    qmax = (1 << depth_bits) - 1

    rx0, ry0, span_x, span_y, valid = tile_rects(
        proj, tile, span_cap, tiles_x, tiles_y)

    sentinel = jnp.int32(n_tiles << depth_bits)
    # LOG-depth quantization over a fixed [1e-3, 1e4] m range: resolution is
    # RELATIVE to depth (ln(1e7)/2^bits ~ 6e-5 of z at 18 bits, i.e. 0.2 mm
    # at 3 m) and independent of the frame's depth distribution — a linear
    # range from frame min/max would let one far outlier coarsen ordering
    # for the whole frame. Monotone, so (tile, depth) order is preserved.
    d = proj.depth
    log_lo, log_span = -6.90776, 16.1181   # ln(1e-3), ln(1e4) - ln(1e-3)
    dl = jnp.log(jnp.clip(jnp.where(jnp.isfinite(d), d, 1e4), 1e-3, 1e4))
    qd = jnp.clip((dl - log_lo) * (qmax / log_span),
                  0, qmax).astype(jnp.int32)
    px, py = proj.mean2d[:, 0], proj.mean2d[:, 1]
    # circle-vs-tile cut: the rect over-includes ~25-30% of pairs whose disc
    # never reaches the tile; those blend to exactly zero through the blend
    # kernels' ALPHA_MIN cutoff, so skipping them at bin time changes no
    # output pixel while every downstream stage (gathers, sort, blend walk)
    # stops paying for them. Margin: alpha >= 1/255 requires
    # d <= sigma * sqrt(2 ln 255) = 3.33 sigma; radius = ceil(3 sigma), so
    # test against (1.11 * radius) >= 3.33 sigma — conservative.
    r2 = (1.11 * proj.radius) ** 2
    if select == "importance":
        # per-slot rank key = quantized -log(max alpha over the tile): the
        # exact conic evaluated at the tile's nearest pixel to the mean.
        # Range: alpha in [~1e-6, 1] -> -log in [0, ~14); quantize to the
        # same bit budget the depth key uses.
        ca, cb, cc = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
        nlop = -jnp.log(jnp.maximum(proj.opacity, 1e-6))
        imp_scale = qmax / 14.0
    elif select != "depth":
        raise ValueError(f"unknown select mode {select!r}")
    slot_tiles = []
    for s in range(s2):
        dy, dx = s // span_cap, s % span_cap
        ok = valid & (dy < span_y) & (dx < span_x)
        tx0 = (rx0 + dx).astype(px.dtype) * tile
        ty0 = (ry0 + dy).astype(py.dtype) * tile
        dxp = px - jnp.clip(px, tx0, tx0 + (tile - 1))
        dyp = py - jnp.clip(py, ty0, ty0 + (tile - 1))
        ok = ok & (dxp * dxp + dyp * dyp <= r2)
        if select == "importance":
            power = (0.5 * (ca * dxp * dxp + cc * dyp * dyp)
                     + cb * dxp * dyp)                 # = -log falloff >= 0
            qr = jnp.clip((nlop + jnp.maximum(power, 0.0)) * imp_scale,
                          0, qmax).astype(jnp.int32)
        else:
            qr = qd
        slot_tiles.append(jnp.where(
            ok, (((ry0 + dy) * tiles_x + rx0 + dx) << depth_bits) | qr,
            sentinel))
    pair_key = jnp.stack(slot_tiles).reshape(-1)               # (p_max,)
    pair_id = jnp.arange(p_max, dtype=jnp.int32)               # s * N + g

    # one stable fused-key sort; the pair id rides along and encodes both
    # the gaussian (id % N) and, for the inverse map, the slot (id // N)
    s_key, s_id = jax.lax.sort((pair_key, pair_id), num_keys=1)

    tid = jnp.arange(n_tiles + 1, dtype=jnp.int32) << depth_bits
    edges = jnp.searchsorted(s_key, tid, side="left").astype(jnp.int32)
    return dict(N=N, s2=s2, p_max=p_max, depth_bits=depth_bits,
                sentinel=sentinel, qd=qd, s_key=s_key, s_id=s_id,
                start=edges[:-1], end=edges[1:])


def bin_gaussians(proj: ProjectedGaussians, tile: int, span_cap: int,
                  tiles_x: int, tiles_y: int, mpt: int,
                  with_inverse: bool = False,
                  select: str = "depth") -> BinnedPairs:
    """Bin projected Gaussians into per-tile depth-sorted gather tables.

    The (tile, depth) order is established by ONE stable single-key sort of
    a fused int32 key `tile << depth_bits | quantized_depth` plus the pair
    id. XLA's TPU sort compiles a per-operand-per-key merge network whose
    build time at SLAM sizes is brutal (a 3-operand 2-key sort at the
    Replica room0 working set costs ~45-60 s of COMPILE; it dominated
    section-boundary stalls) — fusing the key halves the operand count and
    drops the second key comparison. Depth is LOG-quantized to the bits
    left under the tile id (>= 18 at ScanNet++ tile counts; ~6e-5 relative
    steps): far finer than alpha-blend order sensitivity, and ties keep
    pair-id order (stable sort), so the order is deterministic.

    select="importance" changes WHICH pairs survive a saturated tile's
    budget (never their blend order): the big fused-key sort ranks a tile's
    pairs by max-alpha-over-the-tile (opacity x conic falloff at the
    nearest tile pixel) instead of depth, the top-mpt window is kept, and a
    second SMALL (n_tiles, mpt) two-key sort restores exact (depth, pair-id)
    blend order. Depth-prefix truncation (select="depth") drops the ENTIRE
    depth tail of a saturated tile, surface splats included — measured
    0.9-3.9% of rendered pixels wrong vs an untruncated render at the bench
    working set; importance selection instead drops the lowest-contribution
    pairs wherever they sit, measuring EXACT to 1e-3 at the same budget
    (prof_imp.py, PSNR-vs-full 84 dB vs 50 dB). For unsaturated tiles both
    selects produce bit-identical tables (the re-sort reproduces the stable
    (tile, depth, pair-id) order). The CUDA reference composites ALL pairs
    (SURVEY.md 2.9) — importance selection is strictly closer to that
    semantics at any fixed budget."""
    ps = _pair_sort(proj, tile, span_cap, tiles_x, tiles_y, select)
    N, p_max, s2 = ps["N"], ps["p_max"], ps["s2"]
    n_tiles = tiles_x * tiles_y
    s_key, s_id, start, end, qd = (ps["s_key"], ps["s_id"], ps["start"],
                                   ps["end"], ps["qd"])
    depth_bits, sentinel = ps["depth_bits"], ps["sentinel"]
    counts = jnp.minimum(end - start, mpt)
    j = jnp.arange(mpt, dtype=jnp.int32)
    window = jnp.minimum(start[:, None] + j[None, :], p_max - 1)

    if select == "importance":
        # restore exact (depth, pair-id) blend order within the kept window:
        # a SMALL (n_tiles, mpt) lane-axis two-key sort — out-of-count
        # window entries (clamped reads) get +inf-like keys so they sort
        # last and never alias real pairs
        pid_w = s_id[window]                                   # (T, mpt)
        in_count = j[None, :] < counts[:, None]
        qd_w = jnp.where(in_count, qd[pid_w % N], jnp.int32(2 ** 30))
        qd_s, pid_s = jax.lax.sort((qd_w, pid_w), dimension=1, num_keys=2)
        tab = pid_s % N
        inv_pos = None
        if with_inverse:
            flatpos = jnp.arange(n_tiles * mpt,
                                 dtype=jnp.int32).reshape(n_tiles, mpt)
            in_count_s = j[None, :] < counts[:, None]          # sorted-first
            # dummy ids p_max+flatpos keep the scatter indices unique while
            # mode="drop" discards them (out-of-range)
            pid_scat = jnp.where(in_count_s, pid_s, p_max + flatpos)
            pos_by_pair = jnp.full((p_max,), -1, jnp.int32).at[
                pid_scat.reshape(-1)].set(flatpos.reshape(-1),
                                          mode="drop", unique_indices=True)
            inv_pos = pos_by_pair.reshape(s2, N).T             # (N, s2)
        return BinnedPairs(tab=tab, counts=counts, inv_pos=inv_pos)

    tab = (s_id % N)[window]                                   # (n_tiles, mpt)

    inv_pos = None
    if with_inverse:
        # table position of sorted rank r: its tile's window slot, if within
        # the per-tile budget and not the sentinel region
        rank = jnp.arange(p_max, dtype=jnp.int32)
        in_image = s_key < sentinel
        tile_safe = jnp.minimum(s_key >> depth_bits, n_tiles - 1)
        off = rank - start[tile_safe]
        pos = jnp.where(in_image & (off < mpt), tile_safe * mpt + off, -1)
        # invert the permutation with a unique-index scatter (a second sort
        # keyed by pair id costs another full merge-network COMPILE)
        pos_by_pair = jnp.full((p_max,), -1, jnp.int32).at[s_id].set(
            pos, unique_indices=True)
        inv_pos = pos_by_pair.reshape(s2, N).T                 # (N, s2)

    return BinnedPairs(tab=tab, counts=counts, inv_pos=inv_pos)


def bin_two_class(proj: ProjectedGaussians, tile: int, span_cap: int,
                  tiles_x: int, tiles_y: int, mpt_d: int, mpt_s: int,
                  k_dense: int, block: int,
                  with_inverse: bool = False, select: str = "depth",
                  priority: jnp.ndarray | None = None) -> BinnedPairs2C:
    """Two-class tile binning: the k_dense highest-priority tiles keep the
    full mpt_d pair budget; every other tile runs the smaller mpt_s.

    Why: per-tile pair counts are heavy-tailed, but single-class binning
    sizes EVERY tile's gather/DMA/backward-buffer volume by the worst tile.
    The splat kernels already accept arbitrary per-row tile ids (the `tids`
    operand, pallas_splat._fwd_call), so the two classes render as two
    kernel invocations over disjoint tile sets and merge by one row gather.
    Total slot volume drops from n_tiles*mpt_d to
    k_dense*mpt_d + (n_tiles-k_dense)*mpt_s.

    EXACTNESS: both classes window the SAME fused-key sort, so a dense tile
    produces bit-identical rows to single-class bin_gaussians(mpt_d) and a
    sparse tile to bin_gaussians(mpt_s). If k_dense covers every tile with
    count > mpt_s (priority=None ranks by pair count, so this holds whenever
    #{count > mpt_s} <= k_dense), the split is BIT-EXACT vs single-class at
    mpt_d. Under-covered sparse tiles truncate at mpt_s with the same
    select semantics (importance keeps top-alpha pairs); the measured-harm
    probe (core/map_cache.trunc_probe) guards that regime.

    priority: optional (n_tiles,) score for choosing the dense set (e.g.
    leftover-transmittance harm telemetry); defaults to raw pair counts.
    Ties and the ranking are deterministic (stable argsort).
    Returns tables padded to `block` rows (padded rows: count 0, tid 0).
    """
    n_tiles = tiles_x * tiles_y
    K = int(k_dense)
    if not 0 < K < n_tiles:
        raise ValueError(f"k_dense {K} not in (0, {n_tiles})")
    ps = _pair_sort(proj, tile, span_cap, tiles_x, tiles_y, select)
    N, p_max = ps["N"], ps["p_max"]
    s_key, s_id, start, end, qd = (ps["s_key"], ps["s_id"], ps["start"],
                                   ps["end"], ps["qd"])
    counts_full = end - start                                   # (n_tiles,)
    prio = counts_full if priority is None else priority
    order = jnp.argsort(-prio)                  # stable: ties by tile id
    dense_t, sparse_t = order[:K], order[K:]                    # S = nt - K
    S = n_tiles - K
    Kp = -(-K // block) * block
    Sp = -(-S // block) * block
    rank = jnp.zeros((n_tiles,), jnp.int32).at[order].set(
        jnp.arange(n_tiles, dtype=jnp.int32))

    def one_class(tids, mpt_c, pad_rows, flat_base):
        c = jnp.minimum(counts_full[tids], mpt_c)
        j = jnp.arange(mpt_c, dtype=jnp.int32)
        window = jnp.minimum(start[tids][:, None] + j[None, :], p_max - 1)
        scat = None
        if select == "importance":
            pid_w = s_id[window]
            in_count = j[None, :] < c[:, None]
            qd_w = jnp.where(in_count, qd[pid_w % N], jnp.int32(2 ** 30))
            _, pid_s = jax.lax.sort((qd_w, pid_w), dimension=1, num_keys=2)
            tab = pid_s % N
            if with_inverse:
                rows = tids.shape[0]
                flatpos = flat_base + jnp.arange(
                    rows * mpt_c, dtype=jnp.int32).reshape(rows, mpt_c)
                # dummy ids p_max+flat keep scatter indices unique across
                # BOTH classes (flat positions are globally disjoint)
                pid_scat = jnp.where(in_count, pid_s, p_max + flatpos)
                scat = (pid_scat.reshape(-1), flatpos.reshape(-1))
        else:
            tab = (s_id % N)[window]
        tab = jnp.pad(tab, ((0, pad_rows), (0, 0)))
        return (tab, jnp.pad(c, (0, pad_rows)),
                jnp.pad(tids, (0, pad_rows)), scat)

    tab_d, counts_d, tids_d, scat_d = one_class(dense_t, mpt_d, Kp - K, 0)
    tab_s, counts_s, tids_s, scat_s = one_class(sparse_t, mpt_s, Sp - S,
                                                Kp * mpt_d)

    merge = (jnp.zeros((n_tiles,), jnp.int32)
             .at[dense_t].set(jnp.arange(K, dtype=jnp.int32))
             .at[sparse_t].set(Kp + jnp.arange(S, dtype=jnp.int32)))

    inv_pos = None
    if with_inverse:
        if select == "importance":
            buf = jnp.full((p_max,), -1, jnp.int32)
            for ids, fp in (scat_d, scat_s):
                buf = buf.at[ids].set(fp, mode="drop", unique_indices=True)
            inv_pos = buf.reshape(ps["s2"], N).T
        else:
            idx = jnp.arange(p_max, dtype=jnp.int32)
            in_image = s_key < ps["sentinel"]
            tile_safe = jnp.minimum(s_key >> ps["depth_bits"], n_tiles - 1)
            off = idx - start[tile_safe]
            r = rank[tile_safe]
            is_d = r < K
            pos = jnp.where(
                in_image & is_d & (off < mpt_d), r * mpt_d + off,
                jnp.where(in_image & ~is_d & (off < mpt_s),
                          Kp * mpt_d + (r - K) * mpt_s + off, -1))
            buf = jnp.full((p_max,), -1, jnp.int32).at[s_id].set(
                pos, unique_indices=True)
            inv_pos = buf.reshape(ps["s2"], N).T

    return BinnedPairs2C(tab_d=tab_d, counts_d=counts_d, tids_d=tids_d,
                         tab_s=tab_s, counts_s=counts_s, tids_s=tids_s,
                         merge=merge, inv_pos=inv_pos)


def table_gather(vals: jnp.ndarray, tab: jnp.ndarray,
                 inv_pos: jnp.ndarray) -> jnp.ndarray:
    """Differentiable per-slot gather `vals[tab]` whose backward is a dense
    inverse-map gather instead of a scatter-add (see module docstring).

    vals: (N, C) trainable per-gaussian values; tab: (n_tiles, mpt);
    inv_pos: (N, s2) from `bin_gaussians(..., with_inverse=True)`.
    Slots beyond a tile's count hold clamped garbage indices; they are never
    rendered (the blend kernels mask by count) so their cotangents are zero,
    and inv_pos never references them — the transpose stays exact.
    """
    return _table_gather(vals, tab, inv_pos)


def gather_channels(vals: jnp.ndarray, tab: jnp.ndarray) -> jnp.ndarray:
    """(N, C) row-major values -> (T, C, mpt) slot planes.

    A plain row gather followed by a batch transpose: XLA fuses the
    transpose into the gather's output layout for free (measured 6.9 ms for
    1.65M rows at the Replica working set — row-count-bound; per-channel
    element gathers cost 2x per row and C times the rows)."""
    return vals[tab].transpose(0, 2, 1)


class SlotInv(NamedTuple):
    """Sorted dense inverse map for the scatter-free gather backward.

    The raw inverse map is (N, s2) positions with -1 pads. TPU row gathers
    are row-count-bound (~5.8 ns/row at the Replica working set) but XLA
    runs a fused `flat[idx2].sum(1)` at ~2.7x that rate, and any composite
    mixing a small-table indirection into the same fusion serializes ~2x
    slower still (measured: fused (N,2)+sum 14.3 ms; compact main+overflow
    composite 27.6 ms; s2 SEPARATE single-index gathers + adds 17.8 ms at
    N=917k, s2=4). So the inverse ships as s2 independent (N,) index
    columns, valid-first, each with a pre-cast f32 weight column — the
    backward is s2 single-index row gathers combined by cheap elementwise
    FMAs, with NO overflow list and therefore no gradient drops at any
    density (the previous compact form silently dropped 3rd+ slots beyond
    its overflow capacity)."""
    pos: jnp.ndarray   # (N, s2) flat table positions, valid-first
    #                    (descending sort), clipped to [0, P)
    w: jnp.ndarray     # (N, s2) f32 1.0/0.0 — 0 = pad (pre-cast: casting
    #                    bool masks per iteration measured ~3 ms)


def slot_inverse(inv_pos: jnp.ndarray) -> SlotInv:
    """Build the sorted inverse map from a raw (N, s2) one."""
    srt = -jnp.sort(-inv_pos, axis=1)                  # valid (>= 0) first
    return SlotInv(pos=jnp.maximum(srt, 0),
                   w=(srt >= 0).astype(jnp.float32))


def weighted_inverse(flat: jnp.ndarray, pos: jnp.ndarray,
                     w: jnp.ndarray) -> jnp.ndarray:
    """sum_k flat[pos[:, k]] * w[:, k:k+1] — the inverse-map gather.

    flat: (P, C) cotangent rows; pos: (N, s2) in-range positions;
    w: (N, s2) f32 weights (0 disables a column).

    Fast path when C == 8 and P % G == 0 for a power-of-two pack group
    G >= 2 (VTGS_INV_PACK, default 8; always satisfiable in the engine:
    C is the fields8 width, P = n_tiles_padded * mpt with mpt a power of
    two): view `flat` as (P/G, G*8) packed rows — one G*32-byte HBM sector
    per row instead of a 32-byte (1, 8) sliver — gather by pos >> log2(G),
    and select the target 8-lane group with a one-hot (pos & (G-1)) einsum
    whose 0/1 factors keep the sum bit-exact. Non-power-of-two G, G < 2,
    or P % G != 0 fall back to the plain row-gather path. Measured at the
    Replica room0 working set (N = 917k, s2 = 4, P = 1.65M): plain row
    gathers 16.7 ms -> packed G=8 sweet spot (round-5 sweep: G=4 41.3,
    G=8 16.7 of which gathers ~6.6, G=16 18.9, G=32 63.6) and 61.6 ->
    42.7 ms for the whole mapping backward in context (prof_layout.py /
    prof_map.py / sweep notes in ROADMAP.md)."""
    P, C = flat.shape
    s2 = pos.shape[1]
    w = w.astype(flat.dtype)
    # pack-group width: G rows of 8 per gathered sector (G*32 bytes).
    # On-chip sweep at the room0 working set (N=917k, s2=4, P=1.65M,
    # round 5): G=4 41.3 ms, G=8 16.7, G=16 18.9, G=32 63.6 — the 256-byte
    # sector is the sweet spot between gather-sector size and the one-hot
    # select tensor; VTGS_INV_PACK re-sweeps on other topologies.
    G = int(os.environ.get("VTGS_INV_PACK", "8"))
    if C != 8 or G < 2 or (G & (G - 1)) or P % G:
        g = flat[pos[:, 0]] * w[:, 0:1]
        for k in range(1, s2):
            g = g + flat[pos[:, k]] * w[:, k:k + 1]
        return g
    rows = flat.reshape(P // G, G * C)
    # comparison one-hot, NOT an eye(G) row gather: mixing a small-table
    # indirection into the gather fusion serializes it ~25% slower
    # (measured 52.6 vs 42.8 ms for the mapping backward, prof_map 12c)
    iG = jnp.arange(G, dtype=jnp.int32)
    shift = G.bit_length() - 1
    g = None
    for k in range(s2):
        r = rows[pos[:, k] >> shift].reshape(-1, G, C)
        sel = ((pos[:, k:k + 1] & (G - 1)) == iG[None, :]).astype(flat.dtype)
        t = jnp.einsum("ngc,ng->nc", r, sel * w[:, k:k + 1])
        g = t if g is None else g + t
    return g


def apply_slot_inverse(flat: jnp.ndarray, inv: SlotInv) -> jnp.ndarray:
    """(P, C) flat cotangent rows -> (N, C) per-gaussian sums (the exact
    transpose of the `flat[tab]` slot gather; see SlotInv)."""
    return weighted_inverse(flat, inv.pos, inv.w)


@jax.custom_vjp
def _table_gather(vals, tab, inv_pos):
    return vals[tab]


def _table_gather_fwd(vals, tab, inv_pos):
    return vals[tab], (inv_pos, tab.shape)


def _table_gather_bwd(res, g):
    import numpy as np
    inv_pos, tab_shape = res
    C = g.shape[-1]
    # append one zero pad row; invalid (-1) positions gather it instead of
    # paying a mask multiply over the whole (N, s2, C) contribution tensor
    flat = jnp.concatenate(
        [g.reshape(-1, C), jnp.zeros((1, C), g.dtype)], axis=0)
    pad = flat.shape[0] - 1
    idx = jnp.where(inv_pos >= 0, inv_pos, pad)
    g_vals = jnp.sum(flat[idx], axis=1)                         # (N, C)
    f0 = jax.dtypes.float0
    return (g_vals, np.zeros(tab_shape, f0), np.zeros(inv_pos.shape, f0))


_table_gather.defvjp(_table_gather_fwd, _table_gather_bwd)
