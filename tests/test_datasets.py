"""Dataset loader tests on tiny on-disk fixtures in each format."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vtgaussian_slam_tpu.datasets import get_dataset
from vtgaussian_slam_tpu.datasets.dataconfig import load_dataset_config


def write_png16(path, depth_m, scale):
    cv2.imwrite(str(path), (depth_m * scale).astype(np.uint16))


def make_replica_fixture(root, n=3, H=48, W=64, depth_scale=6553.5):
    seq = root / "room0" / "results"
    os.makedirs(seq)
    rng = np.random.default_rng(0)
    poses = []
    for i in range(n):
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        cv2.imwrite(str(seq / f"frame{i:06d}.jpg"), img)
        write_png16(seq / f"depth{i:06d}.png", np.full((H, W), 2.0 + i * 0.1),
                    depth_scale)
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, 0, 0]
        poses.append(T)
    with open(root / "room0" / "traj.txt", "w") as f:
        for T in poses:
            f.write(" ".join(str(v) for v in T.reshape(-1)) + "\n")
    return {
        "dataset_name": "replica",
        "camera_params": dict(image_height=H, image_width=W, fx=60.0, fy=60.0,
                              cx=W / 2, cy=H / 2, png_depth_scale=depth_scale,
                              crop_edge=0),
    }


class TestReplicaLoader:
    def test_contract(self, tmp_path):
        cfg = make_replica_fixture(tmp_path)
        ds = get_dataset(cfg, str(tmp_path), "room0", desired_height=24,
                         desired_width=32)
        assert len(ds) == 3
        color, depth, K, pose = ds[1]
        assert color.shape == (24, 32, 3) and color.dtype == np.float32
        assert color.max() > 1.0  # 0..255 range
        assert depth.shape == (24, 32, 1)
        np.testing.assert_allclose(depth, 2.1, atol=5e-4)
        assert K.shape == (4, 4)
        # intrinsics rescaled by half
        np.testing.assert_allclose(K[0, 0], 30.0)
        # poses relative to frame 0
        np.testing.assert_allclose(pose[:3, 3], [0.1, 0, 0], atol=1e-6)

    def test_start_end_stride(self, tmp_path):
        cfg = make_replica_fixture(tmp_path)
        ds = get_dataset(cfg, str(tmp_path), "room0", start=0, end=-1, stride=2,
                         desired_height=24, desired_width=32)
        assert len(ds) == 2


class TestScannetLoader:
    def test_contract(self, tmp_path):
        seq = tmp_path / "scene0000_00"
        for sub in ("color", "depth", "pose"):
            os.makedirs(seq / sub)
        for i in range(2):
            cv2.imwrite(str(seq / "color" / f"{i}.jpg"),
                        np.full((32, 40, 3), 128, np.uint8))
            write_png16(seq / "depth" / f"{i}.png", np.full((32, 40), 1.5),
                        1000.0)
            np.savetxt(seq / "pose" / f"{i}.txt", np.eye(4))
        cfg = {"dataset_name": "scannet",
               "camera_params": dict(image_height=32, image_width=40, fx=40.0,
                                     fy=40.0, cx=20, cy=16,
                                     png_depth_scale=1000.0)}
        ds = get_dataset(cfg, str(tmp_path), "scene0000_00",
                         desired_height=32, desired_width=40)
        color, depth, K, pose = ds[0]
        np.testing.assert_allclose(depth, 1.5, atol=1e-3)
        np.testing.assert_allclose(pose, np.eye(4), atol=1e-7)


class TestTUMLoader:
    def test_association(self, tmp_path):
        seq = tmp_path / "rgbd_dataset_freiburg1_desk"
        os.makedirs(seq / "rgb")
        os.makedirs(seq / "depth")
        rows_rgb, rows_depth, rows_pose = [], [], []
        for i in range(3):
            t = 100.0 + i * 0.1
            cv2.imwrite(str(seq / "rgb" / f"{t:.6f}.png"),
                        np.full((24, 32, 3), 100, np.uint8))
            write_png16(seq / "depth" / f"{t + 0.01:.6f}.png",
                        np.full((24, 32), 1.0), 5000.0)
            rows_rgb.append(f"{t:.6f} rgb/{t:.6f}.png")
            rows_depth.append(f"{t + 0.01:.6f} depth/{t + 0.01:.6f}.png")
            rows_pose.append(f"{t:.6f} {0.05 * i} 0 0 0 0 0 1")
        (seq / "rgb.txt").write_text("\n".join(rows_rgb))
        (seq / "depth.txt").write_text("\n".join(rows_depth))
        (seq / "groundtruth.txt").write_text("# header\n" + "\n".join(rows_pose))
        cfg = {"dataset_name": "tum",
               "camera_params": dict(image_height=24, image_width=32, fx=30.0,
                                     fy=30.0, cx=16, cy=12,
                                     png_depth_scale=5000.0)}
        ds = get_dataset(cfg, str(tmp_path), "rgbd_dataset_freiburg1_desk",
                         desired_height=24, desired_width=32)
        assert len(ds) == 3
        _, depth, _, pose = ds[2]
        np.testing.assert_allclose(depth, 1.0, atol=1e-3)
        np.testing.assert_allclose(pose[:3, 3], [0.1, 0, 0], atol=1e-6)


class TestDataConfig:
    def test_inherit_from(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text("dataset_name: 'replica'\ncamera_params:\n  fx: 600.0\n  fy: 600.0\n")
        child = tmp_path / "child.yaml"
        child.write_text(f"inherit_from: {base}\ncamera_params:\n  fx: 300.0\n")
        cfg = load_dataset_config(str(child))
        assert cfg["camera_params"]["fx"] == 300.0
        assert cfg["camera_params"]["fy"] == 600.0
        assert cfg["dataset_name"] == "replica"


def _cam_cfg(H, W, name, scale=6553.5):
    return {
        "dataset_name": name,
        "camera_params": dict(image_height=H, image_width=W, fx=60.0, fy=60.0,
                              cx=W / 2, cy=H / 2, png_depth_scale=scale,
                              crop_edge=0),
    }


class TestReplicaV2Loader:
    def _make(self, root, split, n, H=24, W=32, offset=0.0):
        seq = root / "room_0" / split
        os.makedirs(seq / "rgb")
        os.makedirs(seq / "depth")
        rng = np.random.default_rng(1)
        with open(seq / "traj_w_c.txt", "w") as f:
            for i in range(n):
                img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
                cv2.imwrite(str(seq / "rgb" / f"rgb_{i}.png"), img)
                write_png16(seq / "depth" / f"depth_{i}.png",
                            np.full((H, W), 2.0), 6553.5)
                T = np.eye(4)
                T[:3, 3] = [offset + 0.1 * i, 0, 0]
                f.write(" ".join(str(v) for v in T.reshape(-1)) + "\n")

    def test_test_split_anchors_on_first_train_frame(self, tmp_path):
        """The reference prepends imap/00's first frame to the imap/01 split
        (replica.py:108-129) so relative poses anchor on the TRAIN world
        frame — without it a train-split map evaluates misaligned."""
        self._make(tmp_path, "imap/00", 2, offset=0.0)
        self._make(tmp_path, "imap/01", 3, offset=5.0)
        cfg = _cam_cfg(24, 32, "replicaV2")
        ds = get_dataset(cfg, str(tmp_path), "room_0", desired_height=24,
                         desired_width=32, use_train_split=False)
        assert len(ds) == 4  # prepended train frame + 3 test frames
        _, _, _, p0 = ds[0]
        _, _, _, p1 = ds[1]
        # relative to the TRAIN frame: first test frame sits at x = +5.0
        assert abs(float(np.asarray(p1)[0, 3]) - 5.0) < 1e-6
        assert np.allclose(np.asarray(p0), np.eye(4), atol=1e-6)


class TestICLLoader:
    def test_gt_sim_pose_format(self, tmp_path):
        """Reference icl.py parses *.gt.sim: 3 rows of 4 floats per pose."""
        seq = tmp_path / "living_room"
        os.makedirs(seq / "rgb")
        os.makedirs(seq / "depth")
        rng = np.random.default_rng(2)
        rows = []
        for i in range(2):
            img = rng.uniform(0, 255, (24, 32, 3)).astype(np.uint8)
            cv2.imwrite(str(seq / "rgb" / f"{i}.png"), img)
            write_png16(seq / "depth" / f"{i}.png", np.full((24, 32), 2.0),
                        6553.5)
            T = np.eye(4)
            T[:3, 3] = [0.2 * i, 0.1 * i, 0]
            rows += [" ".join(str(v) for v in T[r]) for r in range(3)]
        (seq / "lr.gt.sim").write_text("\n".join(rows) + "\n")
        cfg = _cam_cfg(24, 32, "icl")
        ds = get_dataset(cfg, str(tmp_path), "living_room",
                         desired_height=24, desired_width=32)
        _, _, _, p1 = ds[1]
        assert abs(float(np.asarray(p1)[0, 3]) - 0.2) < 1e-6


class TestAzureLoader:
    def _frames(self, seq, n=2):
        os.makedirs(seq / "color")
        os.makedirs(seq / "depth")
        rng = np.random.default_rng(3)
        for i in range(n):
            img = rng.uniform(0, 255, (24, 32, 3)).astype(np.uint8)
            cv2.imwrite(str(seq / "color" / f"{i:05d}.jpg"), img)
            write_png16(seq / "depth" / f"{i:05d}.png",
                        np.full((24, 32), 2.0), 6553.5)

    def test_log_odomfile(self, tmp_path):
        """Reference azure.py parses .log odometry: 5 lines per frame."""
        seq = tmp_path / "capture"
        self._frames(seq)
        lines = []
        for i in range(2):
            T = np.eye(4)
            T[:3, 3] = [0.3 * i, 0, 0]
            lines.append(f"{i} {i + 1}")
            lines += [" ".join(str(v) for v in T[r]) for r in range(4)]
        (seq / "odom.log").write_text("\n".join(lines) + "\n")
        cfg = _cam_cfg(24, 32, "azure")
        ds = get_dataset(cfg, str(tmp_path), "capture", desired_height=24,
                         desired_width=32, odomfile="odom.log")
        _, _, _, p1 = ds[1]
        assert abs(float(np.asarray(p1)[0, 3]) - 0.3) < 1e-6

    def test_no_poses_identity_fallback(self, tmp_path):
        seq = tmp_path / "capture2"
        self._frames(seq)
        cfg = _cam_cfg(24, 32, "azure")
        ds = get_dataset(cfg, str(tmp_path), "capture2", desired_height=24,
                         desired_width=32)
        _, _, _, p1 = ds[1]
        assert np.allclose(np.asarray(p1), np.eye(4), atol=1e-6)
