"""Sequence evaluation: render each frame from its section, score metrics.

Parity with `eval` (/root/reference/utils/eval_helpers.py:339-602): per
`eval_every` frame pick the frame's section params, render RGB and
depth/silhouette at the estimated pose, compute valid-depth-masked PSNR,
MS-SSIM, LPIPS (optional — see lpips.py), depth L1/RMSE; finally ATE RMSE of
the full trajectory with Horn alignment, metric .txt dumps, and optional
rendered-frame PNG export.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..ops.camera import setup_camera
from ..ops import geometry as geo
from ..ops.ssim import ms_ssim
from ..core.losses import render_slam
from .metrics import calc_psnr, evaluate_ate


def eval_backend_kwargs(params_ls: list[dict], height: int, width: int,
                        tpu_cfg: dict | None = None) -> dict:
    """Generous rasterizer kwargs for offline evaluation of saved params.

    A map trained at pair budget B composites up to B splats deep per tile;
    rendering it with a smaller budget truncates trained tails and
    under-reports quality (observed: a PSNR-42 map scored 20.7 through a
    512-budget eval). When the training budget is unknown (eval_mode),
    budget the FULL average per-tile pair count, memory-capped.
    """
    tpu_cfg = tpu_cfg or {}
    span = tpu_cfg.get("span_cap", 3)
    base = max(tpu_cfg.get("max_pairs_per_tile", 512), 512)
    tiles = (-(-width // 16)) * (-(-height // 16))
    n = max((int(np.asarray(p["means3D"]).shape[0]) for p in params_ls),
            default=0)
    from ..core.pipeline import auto_pair_budget
    mpt = auto_pair_budget(n, tiles, span, base, hard_cap=16384)
    # eval is offline: spend the full average density, not 1/12 of it
    cap = max(base, min(16384, (1 << 23) // max(tiles, 1)))
    need = n * span * span // max(tiles, 1)
    while mpt < need and mpt * 2 <= cap:
        mpt *= 2
    return {"use_pallas": jax.default_backend() != "cpu",
            "max_pairs_per_tile": mpt, "span_cap": span,
            "chunk": tpu_cfg.get("blend_chunk", 128)}


def _load_sections_and_renderer(params_ls: list[dict],
                                backend_kwargs: dict | None):
    """Shared eval setup: sections + trajectory from saved params, and a
    jitted renderer (the reference uses the LAST section's trajectory,
    eval_helpers.py:525-541)."""
    sections, traj = [], None
    for p in params_ls:
        sec, tr = G.section_from_numpy_params(p)
        sections.append(sec)
        traj = tr
    if backend_kwargs is None:
        # Pallas blend on accelerators, XLA blend on CPU
        backend_kwargs = {"use_pallas": jax.default_backend() != "cpu",
                          "max_pairs_per_tile": 512}
    render_fn = jax.jit(
        lambda prm, act, q, t, cam: render_slam(prm, act, q, t, cam,
                                                backend_kwargs),
        static_argnames=("cam",))
    return sections, traj, render_fn


def eval_sequence(
    dataset,
    params_ls: list[dict],
    num_frames: int,
    eval_dir: str,
    sil_thres: float = 0.5,
    mapping_iters: int = 1,
    add_new_gaussians: bool = True,
    eval_every: int = 1,
    baseframe_every: int = 40,
    save_frames: bool = False,
    lpips_fn=None,
    backend_kwargs: dict | None = None,
) -> dict:
    os.makedirs(eval_dir, exist_ok=True)
    psnr_list, rmse_list, l1_list, ssim_list, lpips_list = [], [], [], [], []

    sections, traj, render_fn = _load_sections_and_renderer(
        params_ls, backend_kwargs)

    # the saved trajectory only covers the frames the map was trained on —
    # a jnp index past its end CLAMPS silently, which would score every
    # extra frame at the final trained pose (the reference hard-errors)
    T = traj.quats.shape[0]
    if num_frames > T:
        print(f"WARNING: dataset has {num_frames} frames but the saved "
              f"trajectory covers {T}; evaluating the covered prefix")
        num_frames = T

    gt_w2c_list = []
    first_frame_w2c = None
    cam = None
    if save_frames:
        for sub in ("rendered_rgb", "rendered_depth", "rgb", "depth"):
            os.makedirs(os.path.join(eval_dir, sub), exist_ok=True)

    for t in range(num_frames):
        skipped = t != 0 and t % eval_every != 0
        if skipped and hasattr(dataset, "poses"):
            # only the pose is needed for the final ATE — skip the image
            # decode+resize for frames eval_every passes over (minutes of
            # wasted I/O at replica's eval_every=1000 over 2000 frames)
            pose = dataset.poses[t]
            gt_w2c_list.append(np.linalg.inv(np.asarray(pose, np.float64)))
            continue
        color, depth, intrinsics, pose = dataset[t]
        gt_w2c = np.linalg.inv(np.asarray(pose, np.float64))
        gt_w2c_list.append(gt_w2c)
        if t == 0:
            first_frame_w2c = gt_w2c
            K = np.asarray(intrinsics)[:3, :3]
            cam = setup_camera(color.shape[1], color.shape[0], K)
        if skipped:
            continue

        sec = sections[min(t // baseframe_every, len(sections) - 1)]
        q, tr = traj.quats[t], traj.trans[t]
        r = render_fn(sec.params, sec.active_mask(), q, tr, cam)

        gt_im = np.transpose(color, (2, 0, 1)) / 255.0
        gt_depth = np.transpose(depth, (2, 0, 1))
        valid = (gt_depth > 0)

        im = np.asarray(r.im)
        rastered_depth = np.asarray(r.depth) * valid
        presence = np.asarray(r.silhouette) > sil_thres

        if mapping_iters == 0 and not add_new_gaussians:
            w_im = im * presence * valid
            w_gt = gt_im * presence * valid
        else:
            w_im = im * valid
            w_gt = gt_im * valid
        psnr_list.append(float(calc_psnr(w_im, w_gt).mean()))
        ssim_list.append(float(ms_ssim(jnp.asarray(w_im, jnp.float32),
                                       jnp.asarray(w_gt, jnp.float32))))
        if lpips_fn is not None:
            lpips_list.append(float(lpips_fn(np.clip(w_im, 0, 1),
                                             np.clip(w_gt, 0, 1))))

        diff = rastered_depth - gt_depth
        if mapping_iters == 0 and not add_new_gaussians:
            diff = diff * presence
        vsum = max(valid.sum(), 1)
        # NOTE reference parity quirk: the reference computes "Depth RMSE"
        # as torch.sqrt((diff)**2) ELEMENTWISE then means it
        # (/root/reference/utils/eval_helpers.py:464-479) — i.e. its RMSE
        # column is mathematically identical to its L1 column. Kept
        # bit-for-intent; do not "fix" to a true RMSE without breaking
        # comparability with reference-reported numbers.
        rmse_list.append(float((np.sqrt(diff**2) * valid).sum() / vsum))
        l1_list.append(float((np.abs(diff) * valid).sum() / vsum))

        if save_frames:
            _save_frame_pngs(eval_dir, t, im, np.asarray(r.depth), gt_im,
                             gt_depth)

    # trajectory metric
    try:
        T = traj.quats.shape[0]
        est, gts = [first_frame_w2c], [gt_w2c_list[0]]
        for idx in range(1, min(T, len(gt_w2c_list))):
            g = gt_w2c_list[idx]
            if np.isnan(g).any() or np.isinf(g).any():
                continue
            w2c = np.asarray(geo.pose_to_w2c(
                geo.normalize(traj.quats[idx]), traj.trans[idx]))
            est.append(w2c)
            gts.append(g)
        ate_rmse = evaluate_ate([np.linalg.inv(x) for x in gts],
                                [np.linalg.inv(np.asarray(x, np.float64))
                                 for x in est])
    except Exception:
        ate_rmse = 100.0
        print("Failed to evaluate trajectory with alignment.")

    results = {
        "psnr": float(np.mean(psnr_list)) if psnr_list else float("nan"),
        "depth_rmse": float(np.mean(rmse_list)) if rmse_list else float("nan"),
        "depth_l1": float(np.mean(l1_list)) if l1_list else float("nan"),
        "ms_ssim": float(np.mean(ssim_list)) if ssim_list else float("nan"),
        "lpips": float(np.mean(lpips_list)) if lpips_list else float("nan"),
        "ate_rmse": ate_rmse,
    }
    for name, arr in (("psnr", psnr_list), ("rmse", rmse_list),
                      ("l1", l1_list), ("ssim", ssim_list),
                      ("lpips", lpips_list)):
        np.savetxt(os.path.join(eval_dir, f"{name}.txt"), np.array(arr))
    _plot_metrics(eval_dir, psnr_list, l1_list, results["psnr"],
                  results["depth_l1"], ate_rmse)
    print(f"Average PSNR: {results['psnr']:.2f}")
    print(f"Average Depth RMSE: {results['depth_rmse'] * 100:.2f} cm")
    print(f"Average Depth L1: {results['depth_l1'] * 100:.2f} cm")
    print(f"Average MS-SSIM: {results['ms_ssim']:.3f}")
    print(f"Final Average ATE RMSE: {ate_rmse * 100:.2f} cm")
    return results


def eval_recon(
    dataset,
    params_ls: list[dict],
    num_frames: int,
    eval_dir: str,
    eval_every: int = 1,
    baseframe_every: int = 40,
    sil_thres: float = 0.5,
    voxel_length: float = 5.0 / 512,
    sdf_trunc: float = 0.04,
    gt_mesh_path: str | None = None,
    unseen_pc_path: str | None = None,
    n_2d_views: int = 0,
    backend_kwargs: dict | None = None,
) -> dict:
    """Mesh reconstruction evaluation (parity with `eval_recon`,
    /root/reference/utils/eval_helpers.py:633-777): render each frame's
    RGB-D from its section at the estimated pose, mask depth where the
    silhouette is unreliable, TSDF-fuse, extract + clean the mesh, export
    `recon/mesh.ply`, and — when a GT mesh is given — score
    accuracy/completion and (optionally) the unseen-aware 2D depth-L1.
    """
    from .mesh import (TSDFVolume, accuracy_completion, calc_2d_metric,
                       clean_mesh)
    from .plyio import read_ply, write_ply

    os.makedirs(os.path.join(eval_dir, "recon"), exist_ok=True)
    sections, traj, render_fn = _load_sections_and_renderer(
        params_ls, backend_kwargs)

    color0, _, intrinsics, _ = dataset[0]
    K = np.asarray(intrinsics)[:3, :3]
    cam = setup_camera(color0.shape[1], color0.shape[0], K)

    # pass 1: render frames, collect bounds
    frames, poses = [], []
    pts_all = []
    for t in range(num_frames):
        if t != 0 and t % eval_every != 0:
            continue
        sec = sections[min(t // baseframe_every, len(sections) - 1)]
        r = render_fn(sec.params, sec.active_mask(),
                      traj.quats[t], traj.trans[t], cam)
        w2c = np.asarray(geo.pose_to_w2c(geo.normalize(traj.quats[t]),
                                         traj.trans[t]), np.float64)
        im = np.clip(np.transpose(np.asarray(r.im), (1, 2, 0)), 0, 1)
        depth = np.asarray(r.depth)[0]
        depth = depth * (np.asarray(r.silhouette) > sil_thres)
        frames.append((im.astype(np.float32), depth.astype(np.float32)))
        poses.append(w2c)
        ys, xs = np.mgrid[0: depth.shape[0]: 8, 0: depth.shape[1]: 8]
        z = depth[ys, xs]
        x = (xs - K[0, 2]) / K[0, 0] * z
        y = (ys - K[1, 2]) / K[1, 1] * z
        pc = np.stack([x, y, z], -1).reshape(-1, 3)
        c2w = np.linalg.inv(w2c)
        pts_all.append((pc @ c2w[:3, :3].T + c2w[:3, 3])[z.reshape(-1) > 0])
    pts_all = np.concatenate(pts_all) if pts_all else np.zeros((1, 3))
    if pts_all.shape[0] == 0:
        # every rendered depth was silhouette-masked away (degenerate map):
        # report a failed reconstruction instead of crashing on min() of an
        # empty array
        pts_all = np.zeros((1, 3))
    vol = TSDFVolume(pts_all.min(0) - 0.5, pts_all.max(0) + 0.5,
                     voxel_length, sdf_trunc)
    for (im, depth), w2c in zip(frames, poses):
        vol.integrate(im, depth, K, w2c)
    verts, faces = vol.extract_mesh()
    verts, faces = clean_mesh(verts, faces)
    colors = vol.vertex_colors(verts)
    mesh_path = os.path.join(eval_dir, "recon", "mesh.ply")
    write_ply(mesh_path, verts, faces, colors)
    out = {"mesh_path": mesh_path, "n_verts": int(len(verts)),
           "n_faces": int(len(faces))}

    if gt_mesh_path is not None:
        gt_v, gt_f, _ = read_ply(gt_mesh_path)
        acc, comp = accuracy_completion(verts, faces, gt_v, gt_f)
        out["accuracy_cm"] = acc * 100
        out["completion_cm"] = comp * 100
        if n_2d_views > 0:
            pc_unseen = (np.load(unseen_pc_path)
                         if unseen_pc_path else None)
            out.update(calc_2d_metric(verts, faces, gt_v, gt_f,
                                      pc_unseen=pc_unseen,
                                      n_imgs=n_2d_views))
    print("eval_recon:", {k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in out.items()})
    return out


def _plot_metrics(eval_dir, psnr_list, l1_list, avg_psnr, avg_l1, ate_rmse):
    """PSNR/Depth-L1 line plots -> metrics.png (reference :588-599)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    fig, axs = plt.subplots(1, 2, figsize=(12, 4))
    axs[0].plot(np.arange(len(psnr_list)), psnr_list)
    axs[0].set_title("RGB PSNR")
    axs[0].set_xlabel("Time Step")
    axs[0].set_ylabel("PSNR")
    axs[1].plot(np.arange(len(l1_list)), np.array(l1_list) * 100)
    axs[1].set_title("Depth L1")
    axs[1].set_xlabel("Time Step")
    axs[1].set_ylabel("L1 (cm)")
    fig.suptitle(
        f"Average PSNR: {avg_psnr:.2f}, Average Depth L1: "
        f"{avg_l1 * 100:.2f} cm, ATE RMSE: {ate_rmse * 100:.2f} cm",
        y=1.05, fontsize=16)
    plt.savefig(os.path.join(eval_dir, "metrics.png"), bbox_inches="tight")
    plt.close()


def _save_frame_pngs(eval_dir, t, im, depth, gt_im, gt_depth):
    try:
        import cv2
    except ImportError:
        return
    vmin, vmax = 0, 6

    def depth_png(d):
        norm = np.clip((d[0] - vmin) / (vmax - vmin), 0, 1)
        return cv2.applyColorMap((norm * 255).astype(np.uint8),
                                 cv2.COLORMAP_JET)

    def rgb_png(x):
        arr = np.clip(np.transpose(x, (1, 2, 0)), 0, 1) * 255
        return cv2.cvtColor(arr.astype(np.uint8), cv2.COLOR_RGB2BGR)

    cv2.imwrite(os.path.join(eval_dir, "rendered_rgb", f"gs_{t:04d}.png"),
                rgb_png(im))
    cv2.imwrite(os.path.join(eval_dir, "rendered_depth", f"gs_{t:04d}.png"),
                depth_png(depth))
    cv2.imwrite(os.path.join(eval_dir, "rgb", f"gt_{t:04d}.png"),
                rgb_png(gt_im))
    cv2.imwrite(os.path.join(eval_dir, "depth", f"gt_{t:04d}.png"),
                depth_png(gt_depth))
