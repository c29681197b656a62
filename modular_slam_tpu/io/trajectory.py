"""Trajectory export in TUM and KITTI formats.

Parity with the reference viewer's dumpers
(/root/reference/src/app/viewer/viewer.cpp:105-164):
- TUM: `timestamp x y z qx qy qz qw` per line (:137-164)
- KITTI: row-major 3x4 [R|t] per line (:105-135)
"""

from __future__ import annotations

from typing import IO, Optional

import numpy as np

from modular_slam_tpu.geometry.se3 import Pose, quat_to_matrix


class TumTrajectoryWriter:
    def __init__(self, path: str):
        self.path = path
        self._f: Optional[IO] = open(path, "w")

    def write(self, timestamp: float, pose: Pose) -> None:
        q = np.asarray(pose.q, dtype=np.float64)  # wxyz
        t = np.asarray(pose.t, dtype=np.float64)
        self._f.write(
            f"{timestamp:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
            f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n"
        )

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class KittiTrajectoryWriter:
    def __init__(self, path: str):
        self.path = path
        self._f: Optional[IO] = open(path, "w")

    def write(self, timestamp: float, pose: Pose) -> None:
        R = np.asarray(quat_to_matrix(pose.q), dtype=np.float64)
        t = np.asarray(pose.t, dtype=np.float64)
        m = np.concatenate([R, t[:, None]], axis=1).reshape(-1)
        self._f.write(" ".join(f"{v:.9f}" for v in m) + "\n")

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_tum_trajectory(path: str) -> np.ndarray:
    """Read a TUM trajectory file -> [N, 8] (t x y z qx qy qz qw)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.split()]
            if len(vals) >= 8:
                rows.append(vals[:8])
    return np.array(rows, dtype=np.float64)
