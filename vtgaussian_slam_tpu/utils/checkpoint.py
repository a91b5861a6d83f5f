"""Checkpoint / resume for SLAM runs.

The reference only saves the final `params_ls.npy` and leaves
`load_checkpoint` a TODO stub (/root/reference/src/vtgaussian_slam.py:
1378-1384, SURVEY.md section 5) — this makes both directions real:

- `save_checkpoint`: full engine state at frame t — per-section params
  (reference params_ls format), camera trajectory, base-frame pool,
  correspondence lists, far-depth statistics — one .npz per checkpoint under
  `<run_dir>/checkpoints/`.
- `load_checkpoint`: restores that state into a fresh engine so the frame
  loop continues at t+1. (Per-frame optimizers are re-created fresh each
  frame in both systems, so no moment state needs persisting.)
"""
from __future__ import annotations

import json
import os

import numpy as np


def save_checkpoint(engine, time_idx: int) -> str:
    import jax.numpy as jnp

    cfg = engine.config
    out_dir = os.path.join(cfg["workdir"], cfg["run_name"], "checkpoints")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"ckpt_{time_idx:06d}.npz")

    blobs = {}
    for i, sec in enumerate(engine.sections):
        n = int(sec.n_active)
        blobs[f"sec{i}_means3D"] = np.asarray(sec.params.means3d[:n])
        blobs[f"sec{i}_rgb_colors"] = np.asarray(sec.params.rgb_colors[:n])
        blobs[f"sec{i}_unnorm_rotations"] = np.asarray(
            sec.params.unnorm_rotations[:n])
        blobs[f"sec{i}_logit_opacities"] = np.asarray(
            sec.params.logit_opacities[:n])
        blobs[f"sec{i}_log_scales"] = np.asarray(sec.params.log_scales[:n])
        blobs[f"sec{i}_timestep"] = np.asarray(sec.vars.timestep[:n])
        blobs[f"sec{i}_scene_radius"] = np.asarray(sec.vars.scene_radius)
    blobs["traj_quats"] = np.asarray(engine.traj.quats)
    blobs["traj_trans"] = np.asarray(engine.traj.trans)
    blobs["gt_w2c"] = np.stack(engine.gt_w2c)
    nb = len(engine.baseframes)
    blobs["baseframe_depths"] = np.asarray(engine.baseframes.depths[:nb])
    blobs["baseframe_quats"] = np.asarray(engine.baseframes.quats[:nb])
    blobs["baseframe_trans"] = np.asarray(engine.baseframes.trans[:nb])
    blobs["ring_colors"] = np.asarray(engine.ring_colors)
    blobs["ring_depths"] = np.asarray(engine.ring_depths)
    meta = {
        "time_idx": time_idx,
        "n_sections": len(engine.sections),
        "baseframe_ids": engine.baseframes.ids,
        "baseframe_depth_stride": engine.baseframes.stride,
        "tracking_corr": engine.tracking_corr,
        "earliest_corr": [[int(x) if isinstance(x, (int, np.integer)) else x
                           for x in row] for row in engine.earliest_corr],
        "mapping_corr": engine.mapping_corr,
        "fixed_section_ids": list(engine.fixed_section_ids)
        if engine.fixed_section_ids else None,
        "depth_means": engine.depth_means,
        "num_gs_per_frame_ls": engine.num_gs_per_frame_ls,
        "stats": engine.stats,
        # learned runtime state a resumed run must not re-learn: the
        # scannetpp init-error probe history (the rescue median) and the
        # closed-loop pair-budget boost
        "frame_color_loss": engine.frame_color_loss,
        "frame_depth_loss": engine.frame_depth_loss,
        "mpt_boost": engine._mpt_boost,
        # probe-control state (core/pipeline._update_pair_budget): the
        # recent measured-harm readings and the probe-cadence counter.
        # _pending_harm (an in-flight device scalar) is deliberately
        # dropped — the resumed run just re-probes.
        "harm_hist": list(engine._harm_hist),
        "frames_tracked": engine._frames_tracked,
        # RNG streams: without these, a resumed run replays selection /
        # mapping-draw randomness from PRNGKey(seed) and silently diverges
        # from the uninterrupted run
        "np_rng_state": _np_rng_state_json(engine.np_rng),
    }
    blobs["jax_rng_key"] = np.asarray(engine.rng)
    blobs["meta_json"] = np.frombuffer(
        json.dumps(meta, default=str).encode(), dtype=np.uint8)
    # atomic write: a crash mid-save must not leave a truncated npz that
    # the next resume picks as the latest checkpoint
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **blobs)
    os.replace(tmp, path)
    return path


def _np_rng_state_json(rng) -> list:
    name, keys, pos, has_gauss, cached = rng.get_state()
    return [name, np.asarray(keys).tolist(), int(pos), int(has_gauss),
            float(cached)]


def load_checkpoint(engine, path: str | None = None,
                    time_idx: int | None = None) -> int:
    """Restore state into `engine`; returns the frame index to resume AT
    (the first unprocessed frame)."""
    import jax.numpy as jnp

    from ..models import gaussians as G

    cfg = engine.config
    ckpt_dir = os.path.join(cfg["workdir"], cfg["run_name"], "checkpoints")
    if path is None:
        cands = sorted(os.listdir(ckpt_dir)) if os.path.isdir(ckpt_dir) else []
        if time_idx is not None:
            name = f"ckpt_{time_idx:06d}.npz"
            cands = [c for c in cands if c == name]
        cands = [c for c in cands if not c.endswith(".tmp.npz")]
        if not cands:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        # fall back to older checkpoints if the newest fails to load
        data = meta = None
        for c in reversed(cands):
            path = os.path.join(ckpt_dir, c)
            try:
                data = np.load(path, allow_pickle=False)
                meta = json.loads(bytes(data["meta_json"]).decode())
                break
            except Exception as e:
                print(f"WARNING: checkpoint {c} unreadable ({e}); "
                      "trying the previous one")
                data = meta = None
        if data is None:
            raise FileNotFoundError(f"no readable checkpoint in {ckpt_dir}")
    else:
        data = np.load(path, allow_pickle=False)
        meta = json.loads(bytes(data["meta_json"]).decode())

    engine.sections = []
    for i in range(meta["n_sections"]):
        p = {
            "means3D": data[f"sec{i}_means3D"],
            "rgb_colors": data[f"sec{i}_rgb_colors"],
            "unnorm_rotations": data[f"sec{i}_unnorm_rotations"],
            "logit_opacities": data[f"sec{i}_logit_opacities"],
            "log_scales": data[f"sec{i}_log_scales"],
            "cam_unnorm_rots": data["traj_quats"].T[None],
            "cam_trans": data["traj_trans"].T[None],
        }
        sec, _ = G.section_from_numpy_params(p, quantum=engine.quantum)
        ts = jnp.zeros((sec.capacity,), jnp.float32)
        ts = ts.at[: len(data[f"sec{i}_timestep"])].set(
            jnp.asarray(data[f"sec{i}_timestep"]))
        sec = sec.replace(vars=sec.vars.replace(
            timestep=ts,
            scene_radius=jnp.asarray(data[f"sec{i}_scene_radius"])))
        engine.sections.append(sec)

    engine.traj = engine.traj.replace(
        quats=jnp.asarray(data["traj_quats"]),
        trans=jnp.asarray(data["traj_trans"]))
    engine.gt_w2c = [g for g in data["gt_w2c"]]
    nb = data["baseframe_depths"].shape[0]
    bs = engine.baseframes
    capn = max(bs.quantum, -(-max(nb, 1) // bs.quantum) * bs.quantum)
    bs.ids = list(meta["baseframe_ids"])
    # depths were saved at the saving engine's stride; adopt it (the pool
    # stores exact strided samples, so no resampling is possible or needed)
    ck_stride = int(meta.get("baseframe_depth_stride", 1))
    if ck_stride != bs.stride:
        bs.stride = ck_stride
        bs.sH = -(-bs.H // ck_stride)
        bs.sW = -(-bs.W // ck_stride)
    bs.depths = jnp.zeros((capn, bs.sH, bs.sW), jnp.float32).at[:nb].set(
        jnp.asarray(data["baseframe_depths"]))
    bs.quats = jnp.zeros((capn, 4), jnp.float32).at[:nb].set(
        jnp.asarray(data["baseframe_quats"]))
    bs.trans = jnp.zeros((capn, 3), jnp.float32).at[:nb].set(
        jnp.asarray(data["baseframe_trans"]))
    engine.ring_colors = jnp.asarray(data["ring_colors"])
    engine.ring_depths = jnp.asarray(data["ring_depths"])
    engine.tracking_corr = meta["tracking_corr"]
    engine.earliest_corr = meta["earliest_corr"]
    engine.mapping_corr = meta["mapping_corr"]
    engine.fixed_section_ids = (tuple(meta["fixed_section_ids"])
                                if meta["fixed_section_ids"] else None)
    engine.depth_means = meta["depth_means"]
    engine.num_gs_per_frame_ls = meta["num_gs_per_frame_ls"]
    engine.stats = meta["stats"]
    engine.frame_color_loss = meta.get("frame_color_loss", [])
    engine.frame_depth_loss = meta.get("frame_depth_loss", [])
    engine._mpt_boost = int(meta.get("mpt_boost", 1))
    engine._harm_hist = [float(h) for h in meta.get("harm_hist", [])]
    engine._frames_tracked = int(meta.get("frames_tracked", 0))
    engine._pending_harm = None
    if "jax_rng_key" in data:
        engine.rng = jnp.asarray(data["jax_rng_key"])
    st = meta.get("np_rng_state")
    if st:
        engine.np_rng.set_state(
            (st[0], np.asarray(st[1], np.uint32), int(st[2]), int(st[3]),
             float(st[4])))
    return meta["time_idx"] + 1
