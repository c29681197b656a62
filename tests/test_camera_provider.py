"""Live-camera provider contract tests (no hardware: injected backend).

Covers the reference RealSenseCamera behaviors worth keeping
(realsense_camera.cpp): warmup frames consumed at init (:15-26), device
intrinsics + 0.001 depth factor (:36-38), and interchangeability with the
file provider behind the same iterator contract.
"""

import numpy as np
import pytest

from modular_slam_tpu.config import CameraConfig
from modular_slam_tpu.io.camera import (LiveRgbdCamera,
                                        REALSENSE_DEPTH_FACTOR,
                                        WARMUP_FRAMES)


class FakeRs:
    def __init__(self, n=100):
        self.calls = 0
        self.camera = CameraConfig(fx=600.0, fy=600.0, cx=320.0, cy=240.0,
                                   width=64, height=48,
                                   depth_factor=REALSENSE_DEPTH_FACTOR)

    def wait_for_frames(self):
        self.calls += 1
        rgb = np.full((48, 64, 3), self.calls % 256, dtype=np.uint8)
        depth = np.full((48, 64), 1.5, dtype=np.float32)
        return rgb, depth, float(self.calls) / 30.0


def test_warmup_consumes_frames():
    be = FakeRs()
    LiveRgbdCamera(backend=be)
    assert be.calls == WARMUP_FRAMES  # 30-frame warmup (:15-26)


def test_iterator_contract_and_intrinsics():
    be = FakeRs()
    cam = LiveRgbdCamera(backend=be, max_frames=3, warmup=0)
    frames = list(cam)
    assert len(frames) == 3
    rgb, depth, ts = frames[0]
    assert rgb.dtype == np.uint8 and rgb.shape == (48, 64, 3)
    assert depth.dtype == np.float32
    assert isinstance(ts, float)
    assert cam.camera.fx == 600.0
    assert cam.camera.depth_factor == REALSENSE_DEPTH_FACTOR


def test_missing_sdk_raises_clear_error():
    with pytest.raises(RuntimeError, match="pyrealsense2"):
        LiveRgbdCamera()


def test_registry_exposes_realsense():
    from modular_slam_tpu.utils import registry

    assert "realsense" in registry.available("data_provider")
