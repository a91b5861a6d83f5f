"""End-to-end CLI runs of the REAL dataset configs against miniature
on-disk dataset trees in the exact file formats (VERDICT r3 item 8).

Unlike the loader fixture tests (test_datasets.py), these run the actual
user command — `python src/vtgaussian_slam.py configs/replica/room0.py`
etc. — with only `data.basedir` (and resolution/iteration budgets, for CPU
runtime) overridden, proving the BASELINE configs drive SLAM + eval + the
params_ls.npy/eval-artifact contract end-to-end from real file trees:

- Replica: results/frame*.jpg + depth*.png (16-bit, png_depth_scale
  6553.5) + traj.txt row-major c2w — the layout of
  /root/reference/datasets/gradslam_datasets/replica.py
- TUM: rgb/ + depth/ + rgb.txt/depth.txt/groundtruth.txt timestamp
  association — tum.py
- ScanNet: color/*.jpg + depth/*.png (mm) + pose/*.txt — scannet.py

Frames are renders of SyntheticRoomDataset (consistent geometry + motion),
so tracking/mapping genuinely converge and the eval metrics are asserted
finite and sane, not just present.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vtgaussian_slam_tpu.datasets.synthetic import SyntheticRoomDataset

# full-engine / subprocess integration tests: minutes each on the
# 1-core CPU box. Fast safety net: pytest -m "not slow" (pytest.ini).
pytestmark = pytest.mark.slow

N_FRAMES = 5
H, W = 48, 64


def _scene_frames():
    ds = SyntheticRoomDataset(num_frames=N_FRAMES, height=H, width=W,
                              seed=4, motion_scale=0.15, relative_pose=False)
    frames = []
    for i in range(N_FRAMES):
        color, depth, K, pose = ds[i]
        frames.append((np.asarray(color, np.float64),
                       np.asarray(depth, np.float64)[..., 0],
                       np.asarray(K, np.float64),
                       np.asarray(pose, np.float64)))
    return frames


def _write_replica(root, frames, scale=6553.5):
    seq = os.path.join(root, "room0", "results")
    os.makedirs(seq)
    rows = []
    for i, (c, d, K, p) in enumerate(frames):
        cv2.imwrite(os.path.join(seq, f"frame{i:06d}.jpg"),
                    c[..., ::-1].astype(np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
        cv2.imwrite(os.path.join(seq, f"depth{i:06d}.png"),
                    (d * scale).astype(np.uint16))
        rows.append(" ".join(f"{v:.9f}" for v in p.reshape(-1)))
    with open(os.path.join(root, "room0", "traj.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")


def _write_tum(root, frames, scale=5000.0):
    seq = os.path.join(root, "rgbd_dataset_freiburg1_desk")
    os.makedirs(os.path.join(seq, "rgb"))
    os.makedirs(os.path.join(seq, "depth"))
    rgb_rows, d_rows, gt_rows = [], [], []
    for i, (c, d, K, p) in enumerate(frames):
        ts = 1000.0 + i * 0.05
        cv2.imwrite(os.path.join(seq, "rgb", f"{ts:.4f}.png"),
                    c[..., ::-1].astype(np.uint8))
        cv2.imwrite(os.path.join(seq, "depth", f"{ts:.4f}.png"),
                    (d * scale).astype(np.uint16))
        rgb_rows.append(f"{ts:.4f} rgb/{ts:.4f}.png")
        d_rows.append(f"{ts:.4f} depth/{ts:.4f}.png")
        # groundtruth.txt: timestamp tx ty tz qx qy qz qw (c2w)
        t = p[:3, 3]
        m = p[:3, :3]
        qw = np.sqrt(max(1 + m[0, 0] + m[1, 1] + m[2, 2], 0)) / 2
        qx = (m[2, 1] - m[1, 2]) / (4 * qw)
        qy = (m[0, 2] - m[2, 0]) / (4 * qw)
        qz = (m[1, 0] - m[0, 1]) / (4 * qw)
        gt_rows.append(f"{ts:.4f} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
                       f"{qx:.9f} {qy:.9f} {qz:.9f} {qw:.9f}")
    for name, rows in (("rgb.txt", rgb_rows), ("depth.txt", d_rows),
                       ("groundtruth.txt", gt_rows)):
        with open(os.path.join(seq, name), "w") as f:
            f.write("# comment header\n" + "\n".join(rows) + "\n")


def _write_scannet(root, frames, scale=1000.0):
    seq = os.path.join(root, "scene0000_00")
    for sub in ("color", "depth", "pose"):
        os.makedirs(os.path.join(seq, sub))
    for i, (c, d, K, p) in enumerate(frames):
        cv2.imwrite(os.path.join(seq, "color", f"{i}.jpg"),
                    c[..., ::-1].astype(np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
        cv2.imwrite(os.path.join(seq, "depth", f"{i}.png"),
                    (d * scale).astype(np.uint16))
        np.savetxt(os.path.join(seq, "pose", f"{i}.txt"), p)


def _camera_yaml(path, K, depth_scale, dataset_name, crop_edge=0):
    with open(path, "w") as f:
        f.write(f"""dataset_name: '{dataset_name}'
camera_params:
  image_height: {H}
  image_width: {W}
  fx: {K[0, 0]}
  fy: {K[1, 1]}
  cx: {K[0, 2]}
  cy: {K[1, 2]}
  png_depth_scale: {depth_scale}
  crop_edge: {crop_edge}
""")


def _run_cli(tmp_path, base_config_rel, basedir, yaml_path, monkeypatch=None):
    """Write a thin config that loads the REAL scene config and overrides
    only data location/resolution/budgets, then run the CLI subprocess."""
    workdir = os.path.join(str(tmp_path), "exp")
    cfg_path = os.path.join(str(tmp_path), "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(f"""
import sys
sys.path.insert(0, {REPO!r})
from importlib.machinery import SourceFileLoader
base = SourceFileLoader("base_cfg", {os.path.join(REPO, base_config_rel)!r}
                        ).load_module()
config = base.config
config["workdir"] = {workdir!r}
config["use_wandb"] = False
config["data"].update(
    basedir={basedir!r},
    gradslam_data_cfg={yaml_path!r},
    desired_image_height={H}, desired_image_width={W},
    densification_image_height={2 * H}, densification_image_width={2 * W},
    num_frames=-1, start=0, end=-1, stride=1,
)
config["tracking"]["num_iters"] = 8
config["tracking"]["base1_num_iters"] = 8
config["mapping"]["num_iters"] = 10
config["baseframe_every"] = 40
config["eval_every"] = 1
""")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    env.setdefault("VTGS_JAX_CACHE", os.path.join(REPO, ".jax_cache"))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "src", "vtgaussian_slam.py"),
         cfg_path],
        env=env, capture_output=True, text=True, timeout=1500)
    assert res.returncode == 0, res.stderr[-4000:]
    return res.stdout, workdir


def _check_outputs(stdout, workdir):
    run_dirs = [os.path.join(r, d) for r, ds_, _ in os.walk(workdir)
                for d in ds_ if os.path.exists(
                    os.path.join(r, d, "params_ls.npy"))]
    assert run_dirs, f"no params_ls.npy under {workdir}"
    params = np.load(os.path.join(run_dirs[0], "params_ls.npy"),
                     allow_pickle=True)
    assert len(params) >= 1
    assert "means3D" in params[0]
    psnr = np.loadtxt(os.path.join(run_dirs[0], "eval", "psnr.txt"))
    assert np.isfinite(psnr).all()
    # tiny budgets, but the scene is consistent: the map must be usable
    assert float(np.atleast_1d(psnr).mean()) > 13.0, psnr
    assert "Final Average ATE RMSE" in stdout
    ate_cm = float(stdout.split("Final Average ATE RMSE:")[1].split("cm")[0])
    assert np.isfinite(ate_cm) and ate_cm < 30.0, ate_cm
    lp = np.loadtxt(os.path.join(run_dirs[0], "eval", "lpips.txt"))
    assert np.isfinite(lp).all()          # untrained-fallback LPIPS


class TestRealDataCLI:
    def test_replica_room0_config(self, tmp_path):
        frames = _scene_frames()
        data = os.path.join(str(tmp_path), "Replica")
        os.makedirs(data)
        _write_replica(data, frames)
        yml = os.path.join(str(tmp_path), "cam.yaml")
        _camera_yaml(yml, frames[0][2], 6553.5, 'replica')
        out, workdir = _run_cli(tmp_path, "configs/replica/room0.py",
                                data, yml)
        _check_outputs(out, workdir)

    def test_tum_fr1_config(self, tmp_path):
        frames = _scene_frames()
        data = os.path.join(str(tmp_path), "TUM_RGBD")
        os.makedirs(data)
        _write_tum(data, frames)
        yml = os.path.join(str(tmp_path), "cam.yaml")
        _camera_yaml(yml, frames[0][2], 5000.0, 'tum')
        out, workdir = _run_cli(tmp_path, "configs/tum/fr1_config.py",
                                data, yml)
        _check_outputs(out, workdir)

    def test_scannet_scene0000_config(self, tmp_path):
        frames = _scene_frames()
        data = os.path.join(str(tmp_path), "scannet")
        os.makedirs(data)
        _write_scannet(data, frames)
        yml = os.path.join(str(tmp_path), "cam.yaml")
        _camera_yaml(yml, frames[0][2], 1000.0, 'scannet')
        out, workdir = _run_cli(tmp_path, "configs/scannet/scene0000_config.py",
                                data, yml)
        _check_outputs(out, workdir)
