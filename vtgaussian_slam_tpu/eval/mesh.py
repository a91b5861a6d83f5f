"""TSDF fusion + marching cubes mesh reconstruction (eval-only path).

Replaces the reference's Open3D ScalableTSDFVolume + extract_triangle_mesh
(/root/reference/utils/eval_helpers.py:633-777) and the trimesh-based mesh
cleaning (/root/reference/utils/evaluate_reconstruction.py:200-254).

- `TSDFVolume`: dense voxel grid bounded by the observed scene AABB,
  integrated one RGB-D frame at a time with a jit-compiled projective update
  (voxel -> camera projection, SDF truncation at `sdf_trunc`, running
  weighted average). Reference parameters: voxel_length 5/512, sdf_trunc
  0.04, depth_trunc 16 (:644-656).
- `marching_cubes`: single-pass numpy marching-TETRAHEDRA implementation
  over the fused grid (6 tets per cube, table-free, watertight), host-side —
  mesh extraction is a one-shot postprocess, not a hot path.
- `clean_mesh`: drop connected components with < min_verts vertices (the
  reference's threshold semantics).
- `accuracy_completion`: point-sampled accuracy/completion between meshes
  (scipy cKDTree), the metric pair of `evaluate_3d_reconstruction`.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


class TSDFVolume:
    def __init__(self, bounds_min, bounds_max, voxel_length: float = 5.0 / 512,
                 sdf_trunc: float = 0.04, depth_trunc: float = 16.0):
        self.origin = np.asarray(bounds_min, np.float32)
        self.voxel = float(voxel_length)
        self.trunc = float(sdf_trunc)
        self.depth_trunc = float(depth_trunc)
        dims = np.ceil((np.asarray(bounds_max) - self.origin) / self.voxel
                       ).astype(int) + 1
        self.dims = tuple(int(d) for d in dims)
        self.tsdf = jnp.ones(self.dims, jnp.float32)
        self.weight = jnp.zeros(self.dims, jnp.float32)
        self.color = jnp.zeros(self.dims + (3,), jnp.float32)

    def integrate(self, color, depth, intrinsics, w2c):
        """color (H,W,3) [0,1], depth (H,W) meters, w2c 4x4."""
        self.tsdf, self.weight, self.color = _integrate(
            self.tsdf, self.weight, self.color,
            jnp.asarray(color, jnp.float32), jnp.asarray(depth, jnp.float32),
            jnp.asarray(intrinsics, jnp.float32), jnp.asarray(w2c, jnp.float32),
            jnp.asarray(self.origin), self.voxel, self.trunc, self.depth_trunc)

    def extract_mesh(self):
        tsdf = np.asarray(self.tsdf)
        w = np.asarray(self.weight)
        tsdf = np.where(w > 0, tsdf, np.nan)
        verts, faces = marching_cubes(tsdf, level=0.0)
        verts_world = verts * self.voxel + self.origin
        return verts_world, faces

    def vertex_colors(self, verts_world: np.ndarray) -> np.ndarray:
        """Nearest-voxel color lookup for world-space vertices."""
        idx = np.round((verts_world - self.origin) / self.voxel).astype(int)
        idx = np.clip(idx, 0, np.array(self.dims) - 1)
        return np.asarray(self.color)[idx[:, 0], idx[:, 1], idx[:, 2]]


@functools.partial(jax.jit, static_argnames=("voxel", "trunc", "depth_trunc"))
def _integrate(tsdf, weight, color_vol, color, depth, K, w2c, origin,
               voxel, trunc, depth_trunc):
    dims = tsdf.shape
    H, W = depth.shape
    ii, jj, kk = jnp.meshgrid(*(jnp.arange(d) for d in dims), indexing="ij")
    pts = origin + voxel * jnp.stack([ii, jj, kk], -1).astype(jnp.float32)
    pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
    z = pc[..., 2]
    u = K[0, 0] * pc[..., 0] / jnp.maximum(z, 1e-6) + K[0, 2]
    v = K[1, 1] * pc[..., 1] / jnp.maximum(z, 1e-6) + K[1, 2]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H) & (z > 0)
    uc = jnp.clip(ui, 0, W - 1)
    vc = jnp.clip(vi, 0, H - 1)
    d = depth[vc, uc]
    valid = inb & (d > 0) & (d < depth_trunc)
    sdf = d - z
    valid = valid & (sdf > -trunc)
    tsdf_new = jnp.clip(sdf / trunc, -1.0, 1.0)
    w_new = jnp.where(valid, 1.0, 0.0)
    w_tot = weight + w_new
    tsdf_out = jnp.where(
        w_tot > 0, (tsdf * weight + tsdf_new * w_new) / jnp.maximum(w_tot, 1),
        tsdf)
    c = color[vc, uc]
    color_out = jnp.where(
        (w_tot > 0)[..., None],
        (color_vol * weight[..., None] + c * w_new[..., None])
        / jnp.maximum(w_tot, 1)[..., None],
        color_vol)
    return tsdf_out, w_tot, color_out


# ---------------------------------------------------------------------------
# Iso-surface extraction: marching TETRAHEDRA (6 tets per cube) — table-free
# and watertight; slightly more triangles than classic marching cubes
# ---------------------------------------------------------------------------
_CORNER = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
])


# the 6 tetrahedra (corner indices) decomposing a cube — all sharing the
# 0-6 diagonal so neighboring cubes tile compatibly (watertight surface)
_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
])


def marching_cubes(volume: np.ndarray, level: float = 0.0):
    """Extract the iso-surface of `volume` (3-D, NaN = unobserved) at
    `level` using marching tetrahedra. Returns (verts [M,3] in voxel
    coordinates, faces [F,3])."""
    vol = volume
    nx, ny, nz = vol.shape
    finite = np.isfinite(vol)

    # candidate cells: all 8 corners observed and sign change present
    c = np.zeros((nx - 1, ny - 1, nz - 1), bool)
    vmin = np.full(c.shape, np.inf)
    vmax = np.full(c.shape, -np.inf)
    ok = np.ones(c.shape, bool)
    for dx, dy, dz in _CORNER:
        sub = vol[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
        okc = finite[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
        ok &= okc
        vmin = np.minimum(vmin, np.where(okc, sub, np.inf))
        vmax = np.maximum(vmax, np.where(okc, sub, -np.inf))
    cells = np.argwhere(ok & (vmin <= level) & (vmax >= level))
    if len(cells) == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), int)

    corner_vals = np.stack(
        [vol[cells[:, 0] + dx, cells[:, 1] + dy, cells[:, 2] + dz]
         for dx, dy, dz in _CORNER], -1)  # (M, 8)

    tets = _TETS
    verts_out = []
    faces_out = []
    vert_count = 0
    # process each tetrahedron type over all candidate cells (vectorized)
    for tet in tets:
        tv = corner_vals[:, tet]                      # (M, 4)
        inside = tv < level                           # (M, 4)
        code = (inside * np.array([1, 2, 4, 8])).sum(-1)
        # edge interpolation helper
        tp = _CORNER[tet].astype(np.float64)          # (4, 3)

        def interp(sel, i, j):
            a = tv[sel, i]
            b = tv[sel, j]
            t = (level - a) / np.where(np.abs(b - a) < 1e-12, 1e-12, b - a)
            t = np.clip(t, 0.0, 1.0)[:, None]
            base = cells[sel].astype(np.float64)
            return base + tp[i] + t * (tp[j] - tp[i])

        # marching tetrahedra cases
        for cases, tris in _MT_CASES.items():
            sel = code == cases
            if not sel.any():
                continue
            for tri in tris:
                vs = [interp(sel, i, j) for (i, j) in tri]
                n = vs[0].shape[0]
                verts_out.extend(vs)
                base = vert_count
                idx = np.arange(n)
                faces_out.append(
                    np.stack([base + idx, base + n + idx, base + 2 * n + idx],
                             -1))
                vert_count += 3 * n
    if not verts_out:
        return np.zeros((0, 3)), np.zeros((0, 3), int)
    verts = np.concatenate(verts_out)
    faces = np.concatenate(faces_out)
    # weld duplicate vertices
    key = np.round(verts / 1e-6).astype(np.int64)
    _, uniq_idx, inv = np.unique(key, axis=0, return_index=True,
                                 return_inverse=True)
    return verts[uniq_idx], inv[faces]


# marching tetrahedra case table: code (bitmask of corners < level) ->
# list of triangles, each triangle a list of edges (corner index pairs)
_MT_CASES = {
    1: [[(0, 1), (0, 2), (0, 3)]],
    2: [[(1, 0), (1, 3), (1, 2)]],
    3: [[(0, 2), (0, 3), (1, 3)], [(0, 2), (1, 3), (1, 2)]],
    4: [[(2, 0), (2, 1), (2, 3)]],
    5: [[(0, 1), (2, 1), (0, 3)], [(2, 1), (2, 3), (0, 3)]],
    6: [[(1, 0), (2, 0), (1, 3)], [(2, 0), (2, 3), (1, 3)]],
    7: [[(0, 3), (1, 3), (2, 3)]],
    8: [[(3, 0), (3, 2), (3, 1)]],
    9: [[(0, 1), (0, 2), (3, 2)], [(0, 1), (3, 2), (3, 1)]],
    10: [[(1, 0), (3, 0), (1, 2)], [(3, 0), (3, 2), (1, 2)]],
    11: [[(0, 2), (3, 2), (1, 2)]],
    12: [[(2, 0), (2, 1), (3, 1)], [(2, 0), (3, 1), (3, 0)]],
    13: [[(0, 1), (2, 1), (3, 1)]],
    14: [[(1, 0), (2, 0), (3, 0)]],
}


def clean_mesh(verts: np.ndarray, faces: np.ndarray, min_verts: int = 200):
    """Remove connected components with fewer than `min_verts` VERTICES —
    the reference's threshold is on component vertex count, and it keeps
    faces touching any kept component
    (evaluate_reconstruction.py:200-254: `len(c) >= min_len` over vertex
    index arrays, faces via `np.any(np.isin(faces, component))`)."""
    if len(faces) == 0:
        return verts, faces
    import scipy.sparse as sp

    n = len(verts)
    rows = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    cols = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    adj = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    n_comp, labels = sp.csgraph.connected_components(adj, directed=False)
    comp_sizes = np.bincount(labels, minlength=n_comp)
    vert_keep = comp_sizes[labels] >= min_verts
    keep = vert_keep[faces].any(axis=1)
    faces = faces[keep]
    used = np.unique(faces)
    remap = -np.ones(n, int)
    remap[used] = np.arange(len(used))
    return verts[used], remap[faces]


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                   seed: int = 0) -> np.ndarray:
    """Uniform area-weighted surface sampling."""
    rng = np.random.default_rng(seed)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    if area.sum() == 0:
        return verts[:n] if len(verts) else np.zeros((0, 3))
    probs = area / area.sum()
    idx = rng.choice(len(faces), size=n, p=probs)
    r1 = np.sqrt(rng.uniform(size=(n, 1)))
    r2 = rng.uniform(size=(n, 1))
    return (1 - r1) * v0[idx] + r1 * (1 - r2) * v1[idx] + r1 * r2 * v2[idx]


def accuracy_completion(rec_verts, rec_faces, gt_verts, gt_faces,
                        n_samples: int = 200000, seed: int = 0):
    """(accuracy, completion) in meters: mean NN distance rec->gt and
    gt->rec over surface samples (evaluate_3d_reconstruction semantics)."""
    from scipy.spatial import cKDTree

    rp = sample_surface(rec_verts, rec_faces, n_samples, seed)
    gp = sample_surface(gt_verts, gt_faces, n_samples, seed + 1)
    acc = cKDTree(gp).query(rp)[0].mean() if len(rp) else np.inf
    comp = cKDTree(rp).query(gp)[0].mean() if len(gp) else np.inf
    return float(acc), float(comp)


@functools.partial(jax.jit, static_argnames=("h", "w", "span", "chunk"))
def render_mesh_depth(verts: jnp.ndarray, faces: jnp.ndarray,
                      w2c: jnp.ndarray, K: jnp.ndarray,
                      h: int, w: int, span: int = 16,
                      chunk: int = 8192) -> jnp.ndarray:
    """Z-buffer depth render of a triangle mesh (TPU-native replacement for
    the Open3D offscreen depth capture in
    /root/reference/utils/evaluate_reconstruction.py:152-185).

    Rasterizes each face over a static `span`x`span` pixel window anchored at
    its screen bbox corner (perspective-correct barycentric depth) and
    scatter-mins into the z-buffer, `chunk` faces at a time inside a
    `lax.fori_loop` to bound memory. Faces whose screen extent exceeds `span`
    pixels are only partially filled — pre-subdivide with
    `subdivide_to_edge` (done by `calc_2d_metric`). Returns (h, w) depth in
    meters, 0 where no surface.
    """
    near = 1e-4
    F0 = faces.shape[0]
    if F0 == 0:  # static: empty mesh renders empty
        return jnp.zeros((h, w), jnp.float32)
    n_chunks = -(-F0 // chunk)
    pad = n_chunks * chunk - F0
    faces = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)]) if pad else faces

    vc = verts @ w2c[:3, :3].T + w2c[:3, 3]
    z = vc[:, 2]
    front = z > near
    zs = jnp.where(front, z, 1.0)
    u = K[0, 0] * vc[:, 0] / zs + K[0, 2]
    v = K[1, 1] * vc[:, 1] / zs + K[1, 2]
    inv_z = jnp.where(front, 1.0 / zs, 0.0)

    sy = jnp.arange(span, dtype=jnp.int32)[:, None]
    sx = jnp.arange(span, dtype=jnp.int32)[None, :]

    def body(c, zbuf):
        f = jax.lax.dynamic_slice(faces, (c * chunk, 0), (chunk, 3))
        fvalid = (jnp.arange(chunk) + c * chunk) < F0
        i0, i1, i2 = f[:, 0], f[:, 1], f[:, 2]
        u0, u1, u2 = u[i0], u[i1], u[i2]
        v0, v1, v2 = v[i0], v[i1], v[i2]
        w0, w1, w2 = inv_z[i0], inv_z[i1], inv_z[i2]
        fvalid &= front[i0] & front[i1] & front[i2]

        xi0 = jnp.clip(jnp.floor(jnp.minimum(jnp.minimum(u0, u1), u2)),
                       0, w - 1).astype(jnp.int32)
        yi0 = jnp.clip(jnp.floor(jnp.minimum(jnp.minimum(v0, v1), v2)),
                       0, h - 1).astype(jnp.int32)
        px = (xi0[:, None, None] + sx[None]).astype(jnp.float32)
        py = (yi0[:, None, None] + sy[None]).astype(jnp.float32)

        area = (u1 - u0) * (v2 - v0) - (v1 - v0) * (u2 - u0)
        ok_area = jnp.abs(area) > 1e-12
        inv_area = 1.0 / jnp.where(ok_area, area, 1.0)

        def edge(ua, va, ub, vb):
            return ((ub - ua)[:, None, None] * (py - va[:, None, None])
                    - (vb - va)[:, None, None] * (px - ua[:, None, None]))

        l0 = edge(u1, v1, u2, v2) * inv_area[:, None, None]
        l1 = edge(u2, v2, u0, v0) * inv_area[:, None, None]
        l2 = edge(u0, v0, u1, v1) * inv_area[:, None, None]
        eps = -1e-6
        inside = (l0 >= eps) & (l1 >= eps) & (l2 >= eps)
        inside &= (fvalid & ok_area)[:, None, None]
        inside &= (px < w) & (py < h)

        inv_depth = (l0 * w0[:, None, None] + l1 * w1[:, None, None]
                     + l2 * w2[:, None, None])
        inside &= inv_depth > near
        depth = 1.0 / jnp.where(inside, inv_depth, 1.0)
        depth = jnp.where(inside, depth, jnp.inf)

        flat = (py.astype(jnp.int32) * w + px.astype(jnp.int32)).reshape(-1)
        return zbuf.at[flat].min(depth.reshape(-1), mode="drop")

    zbuf = jnp.full((h * w,), jnp.inf, jnp.float32)
    zbuf = jax.lax.fori_loop(0, n_chunks, body, zbuf)
    return jnp.where(jnp.isfinite(zbuf), zbuf, 0.0).reshape(h, w)


def subdivide_to_edge(verts: np.ndarray, faces: np.ndarray,
                      max_edge: float, max_rounds: int | None = None):
    """Midpoint 1->4 subdivision of faces whose longest edge exceeds
    `max_edge` (keeps the rasterizer's fixed screen window valid).

    Rounds adapt to the actual longest edge (each round halves edges) — a
    fixed small cap silently left faces longer than max_edge, which the
    16-px rasterizer window then rasterized only partially."""
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    if max_rounds is None:
        if len(faces):
            e = verts[faces]
            longest = max(
                float(np.linalg.norm(e[:, 0] - e[:, 1], axis=1).max()),
                float(np.linalg.norm(e[:, 1] - e[:, 2], axis=1).max()),
                float(np.linalg.norm(e[:, 2] - e[:, 0], axis=1).max()))
            max_rounds = max(int(np.ceil(np.log2(
                max(longest / max(max_edge, 1e-9), 1.0)))), 0) + 1
        else:
            max_rounds = 0
    for _ in range(max_rounds):
        if len(faces) == 0:
            break
        e = verts[faces]
        longest = np.maximum(
            np.linalg.norm(e[:, 0] - e[:, 1], axis=1),
            np.maximum(np.linalg.norm(e[:, 1] - e[:, 2], axis=1),
                       np.linalg.norm(e[:, 2] - e[:, 0], axis=1)))
        big = longest > max_edge
        if not big.any():
            break
        keep = faces[~big]
        fb = faces[big]
        v0, v1, v2 = verts[fb[:, 0]], verts[fb[:, 1]], verts[fb[:, 2]]
        m01, m12, m20 = (v0 + v1) / 2, (v1 + v2) / 2, (v2 + v0) / 2
        base = len(verts)
        nb = len(fb)
        verts = np.concatenate([verts, m01, m12, m20])
        a = fb[:, 0]
        b = fb[:, 1]
        c = fb[:, 2]
        i01 = base + np.arange(nb)
        i12 = base + nb + np.arange(nb)
        i20 = base + 2 * nb + np.arange(nb)
        new = np.concatenate([
            np.stack([a, i01, i20], 1), np.stack([i01, b, i12], 1),
            np.stack([i20, i12, c], 1), np.stack([i01, i12, i20], 1)])
        faces = np.concatenate([keep, new])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def icp_align(src_pts: np.ndarray, dst_pts: np.ndarray,
              threshold: float = 0.1, iters: int = 30) -> np.ndarray:
    """Point-to-point ICP: 4x4 transform aligning src onto dst (replaces the
    Open3D registration_icp call in evaluate_reconstruction.py:17-35)."""
    from scipy.spatial import cKDTree

    T = np.eye(4)
    cur = src_pts.copy()
    tree = cKDTree(dst_pts)
    prev_err = np.inf
    for _ in range(iters):
        d, idx = tree.query(cur)
        m = d < threshold
        if m.sum() < 10:
            break
        p, q = cur[m], dst_pts[idx[m]]
        pc, qc = p.mean(0), q.mean(0)
        U, _, Vt = np.linalg.svd((p - pc).T @ (q - qc))
        R = Vt.T @ U.T
        if np.linalg.det(R) < 0:
            Vt[-1] *= -1
            R = Vt.T @ U.T
        t = qc - R @ pc
        step = np.eye(4)
        step[:3, :3], step[:3, 3] = R, t
        T = step @ T
        cur = cur @ R.T + t
        err = d[m].mean()
        if prev_err - err < 1e-7:
            break
        prev_err = err
    return T


def _oriented_camera_box(gt_verts: np.ndarray):
    """PCA oriented bounding box of the GT mesh, shrunk to the room's vacant
    interior the same way the reference does (extents x [0.3, 0.7, 0.7],
    +0.4 m lift; evaluate_reconstruction.py:167-175)."""
    c = gt_verts.mean(0)
    centered = gt_verts - c
    _, _, Vt = np.linalg.svd(centered[:: max(1, len(gt_verts) // 50000)],
                             full_matrices=False)
    proj = centered @ Vt.T
    lo, hi = proj.min(0), proj.max(0)
    extents = (hi - lo) * np.array([0.3, 0.7, 0.7])
    transform = np.eye(4)
    transform[:3, :3] = Vt.T
    transform[:3, 3] = c + Vt.T @ ((lo + hi) / 2)
    transform[2, 3] += 0.4
    return extents, transform


def _lookat_w2c(origin: np.ndarray, target: np.ndarray,
                up=(0.0, 0.0, -1.0)) -> np.ndarray:
    fwd = target - origin
    fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
    right = np.cross(np.asarray(up, np.float64), fwd)
    n = np.linalg.norm(right)
    if n < 1e-6:
        right = np.cross([0.0, 1.0, 0.0], fwd)
        n = np.linalg.norm(right)
    right /= n
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, origin
    return np.linalg.inv(c2w)


def calc_2d_metric(rec_verts, rec_faces, gt_verts, gt_faces,
                   pc_unseen: np.ndarray | None = None,
                   n_imgs: int = 1000, align: bool = True, seed: int = 0,
                   h: int = 500, w: int = 500, focal: float = 300.0,
                   max_edge: float = 0.05, max_tries: int = 200) -> dict:
    """Unseen-aware 2D depth-L1 between reconstructed and GT meshes
    (/root/reference/utils/evaluate_reconstruction.py:97-197): sample
    `n_imgs` random in-room camera views (origin uniform in the GT room's
    shrunken oriented box, look-at a random direction), reject views that
    project any `pc_unseen` point in front of the camera, render both meshes'
    depth, and average |gt - rec| over pixels the reconstruction covers.
    Returns {"depth l1": cm}.

    Deviation: the camera convention is this framework's +z-forward w2c
    (the reference flips axes to satisfy Open3D/OpenGL); the ray
    distribution and the metric are identical.
    """
    rng = np.random.default_rng(seed)
    K = np.array([[focal, 0, w / 2.0 - 0.5],
                  [0, focal, h / 2.0 - 0.5], [0, 0, 1.0]], np.float32)

    if align and len(rec_verts) and len(gt_verts):
        T = icp_align(
            rec_verts[:: max(1, len(rec_verts) // 20000)].astype(np.float64),
            gt_verts[:: max(1, len(gt_verts) // 20000)].astype(np.float64))
        rec_verts = rec_verts @ T[:3, :3].T + T[:3, 3]

    rec_verts, rec_faces = subdivide_to_edge(rec_verts, rec_faces, max_edge)
    gt_verts, gt_faces = subdivide_to_edge(gt_verts, gt_faces, max_edge)
    rv, rf = jnp.asarray(rec_verts), jnp.asarray(rec_faces)
    gv, gf = jnp.asarray(gt_verts), jnp.asarray(gt_faces)
    extents, transform = _oriented_camera_box(np.asarray(gt_verts))

    errors = []
    for _ in range(n_imgs):
        w2c = None
        for _try in range(max_tries):
            local = (rng.uniform(-0.5, 0.5, 3)) * extents
            origin = transform[:3, :3] @ local + transform[:3, 3]
            target = rng.uniform(-10000, 10000, 3)
            cand = _lookat_w2c(origin, target)
            if pc_unseen is not None and len(pc_unseen):
                pc = pc_unseen @ cand[:3, :3].T + cand[:3, 3]
                zp = pc[:, 2]
                uv = pc[:, :2] / np.maximum(zp[:, None], 1e-5)
                uu = uv[:, 0] * focal + K[0, 2]
                vv = uv[:, 1] * focal + K[1, 2]
                seen = ((zp > 0) & (uu > 0) & (uu < w)
                        & (vv > 0) & (vv < h)).any()
                if seen:
                    continue
            w2c = cand
            break
        if w2c is None:
            continue
        w2c_j = jnp.asarray(w2c, jnp.float32)
        gt_d = np.asarray(render_mesh_depth(gv, gf, w2c_j, K, h, w))
        rec_d = np.asarray(render_mesh_depth(rv, rf, w2c_j, K, h, w))
        m = rec_d > 0
        if m.sum() > 0:
            errors.append(np.abs(gt_d[m] - rec_d[m]).mean())
    return {"depth l1": float(np.mean(errors) * 100) if errors
            else float("nan")}
