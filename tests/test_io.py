import os

import numpy as np
import pytest

from modular_slam_tpu.config import CameraConfig
from modular_slam_tpu.io import (
    associate,
    TumRgbdDataset,
    frame_to_device,
    TumTrajectoryWriter,
    KittiTrajectoryWriter,
    read_tum_trajectory,
)
from modular_slam_tpu.geometry.se3 import identity_pose, Pose, quat_from_axis_angle
import jax.numpy as jnp

REF_DATA = "/root/reference/data"


def test_associate_basic():
    a = [0.0, 1.0, 2.0, 3.0]
    b = [0.015, 1.5, 2.005, 3.1]
    pairs = associate(a, b, max_difference=0.02)
    assert pairs == [(0, 0), (2, 2)]


def test_associate_greedy_unique():
    # two a's compete for the same b; nearest wins, each used once
    a = [0.0, 0.010]
    b = [0.008]
    pairs = associate(a, b, max_difference=0.02)
    assert pairs == [(1, 0)]


def test_associate_offset():
    a = [10.0]
    b = [0.0]
    assert associate(a, b, offset=10.0, max_difference=0.02) == [(0, 0)]
    assert associate(a, b, offset=0.0, max_difference=0.02) == []


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="sample data absent")
def test_bundled_dataset():
    ds = TumRgbdDataset(REF_DATA)
    assert len(ds) == 2
    rgb, depth, ts = ds.load(0)
    assert rgb.shape == (480, 640, 3) and rgb.dtype == np.uint8
    assert depth.shape == (480, 640) and depth.dtype == np.float32
    assert 0.0 <= depth.min() and depth.max() < 20.0  # meters, sane
    assert (depth > 0).mean() > 0.2  # plenty of valid depth


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="sample data absent")
def test_frame_to_device_grayscale():
    ds = TumRgbdDataset(REF_DATA)
    rgb, depth, ts = ds.load(0)
    frame = frame_to_device(rgb, depth, ts)
    assert frame.gray.shape == (480, 640)
    ref = rgb.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(np.array(frame.gray), ref, atol=1e-2)


def test_tum_sequence_mode(tmp_path):
    # synth a TUM-style dir with rgb.txt/depth.txt
    import cv2

    root = tmp_path / "seq"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    lines_rgb, lines_d = ["# rgb"], ["# depth"]
    for k in range(3):
        t = 100.0 + k * 0.033
        rp, dp = f"rgb/{t:.6f}.png", f"depth/{t + 0.005:.6f}.png"
        cv2.imwrite(str(root / rp), np.full((8, 8, 3), k * 10, np.uint8))
        cv2.imwrite(str(root / dp), np.full((8, 8), 5000, np.uint16))
        lines_rgb.append(f"{t:.6f} {rp}")
        lines_d.append(f"{t + 0.005:.6f} {dp}")
    (root / "rgb.txt").write_text("\n".join(lines_rgb) + "\n")
    (root / "depth.txt").write_text("\n".join(lines_d) + "\n")
    (root / "groundtruth.txt").write_text("100.0 0 0 0 0 0 0 1\n")

    ds = TumRgbdDataset(str(root), CameraConfig())
    assert len(ds) == 3
    rgb, depth, ts = ds.load(1)
    assert abs(ts - 100.033) < 1e-6
    np.testing.assert_allclose(depth, 1.0)  # 5000 * 1/5000
    assert ds.groundtruth.shape == (1, 8)


def test_trajectory_roundtrip(tmp_path):
    path = str(tmp_path / "traj.txt")
    pose = Pose(q=quat_from_axis_angle(jnp.array([0.1, 0.2, 0.3])),
                t=jnp.array([1.0, 2.0, 3.0]))
    with TumTrajectoryWriter(path) as w:
        w.write(123.456, identity_pose())
        w.write(123.489, pose)
    arr = read_tum_trajectory(path)
    assert arr.shape == (2, 8)
    np.testing.assert_allclose(arr[0], [123.456, 0, 0, 0, 0, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(arr[1, 1:4], [1, 2, 3], atol=1e-6)
    # qw last in TUM order
    np.testing.assert_allclose(arr[1, 7], float(pose.q[0]), atol=1e-6)


def test_kitti_writer(tmp_path):
    path = str(tmp_path / "kitti.txt")
    with KittiTrajectoryWriter(path) as w:
        w.write(0.0, identity_pose())
    row = np.loadtxt(path)
    np.testing.assert_allclose(
        row, [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], atol=1e-9)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="sample data absent")
def test_native_loader_matches_opencv():
    from modular_slam_tpu.io import native
    if not native.available():
        pytest.skip("native loader not built and no toolchain")
    import cv2

    rgb = native.decode_png(REF_DATA + "/rgb/0000.png")
    ref = cv2.imread(REF_DATA + "/rgb/0000.png")[..., ::-1]
    np.testing.assert_array_equal(rgb, ref)
    dep = native.decode_png(REF_DATA + "/depth/0000.png")
    refd = cv2.imread(REF_DATA + "/depth/0000.png", cv2.IMREAD_ANYDEPTH)
    assert dep.dtype == np.uint16
    np.testing.assert_array_equal(dep, refd)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="sample data absent")
def test_prefetch_iter_equals_sync_iter():
    from modular_slam_tpu.io import native
    if not native.available():
        pytest.skip("native loader not built")
    ds = TumRgbdDataset(REF_DATA)
    sync = list(ds)
    pre = list(ds.prefetch_iter(n_threads=2, ring=2))
    assert len(sync) == len(pre)
    for (r1, d1, t1), (r2, d2, t2) in zip(sync, pre):
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_allclose(d1, d2)
        assert t1 == t2


def test_native_decode_bad_path_returns_none():
    from modular_slam_tpu.io import native
    if not native.available():
        pytest.skip("native loader not built")
    assert native.decode_png("/nonexistent.png") is None
