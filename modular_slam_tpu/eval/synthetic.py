"""Synthetic RGB-D sequence generation with exact ground truth.

A textured plane at z = plane_z in the world is viewed by a moving pinhole
camera; every frame is rendered by exact ray-plane intersection, giving
geometrically consistent RGB + depth + ground-truth poses.  Used by the
test-suite and benchmarks in place of TUM downloads (this environment has
no network), mirroring the role of the reference's bundled 2-frame sample
(/root/reference/data) but with arbitrary length and motion.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from modular_slam_tpu.config import CameraConfig
from modular_slam_tpu.geometry.se3 import Pose, quat_to_matrix, quat_from_axis_angle

import jax.numpy as jnp


def _texture(size: int, seed: int) -> np.ndarray:
    """High-contrast blobby texture with plenty of corners."""
    rng = np.random.default_rng(seed)
    tex = np.full((size, size), 128.0, np.float32)
    n = (size // 8) ** 2
    ys = rng.integers(0, size - 12, n)
    xs = rng.integers(0, size - 12, n)
    for y, x in zip(ys, xs):
        s = int(rng.integers(3, 10))
        tex[y:y + s, x:x + s] = float(rng.uniform(0, 255))
    try:
        import cv2

        tex = cv2.GaussianBlur(tex, (3, 3), 0.8)
    except Exception:
        pass
    return tex


class PlaneSceneGenerator:
    """Render RGB-D frames of a textured plane from arbitrary poses."""

    def __init__(self, camera: CameraConfig | None = None,
                 plane_z: float = 2.0, texture_ppm: float = 400.0,
                 texture_size: int = 4096, seed: int = 0,
                 depth_noise: float = 0.0):
        self.camera = camera or CameraConfig()
        self.plane_z = plane_z
        self.ppm = texture_ppm  # texture pixels per meter
        self.tex = _texture(texture_size, seed)
        # per-pixel gaussian depth noise (meters).  Injects realistic
        # sensor error so odometry accumulates drift — used by the
        # loop-closure tests to create something worth correcting.
        self.depth_noise = depth_noise
        self._noise_rng = np.random.default_rng(seed + 1)

    def render(self, pose: Pose) -> Tuple[np.ndarray, np.ndarray]:
        """-> (rgb [H,W,3] uint8, depth [H,W] float32 meters)."""
        cam = self.camera
        H, W = cam.height, cam.width
        R = np.asarray(quat_to_matrix(pose.q), np.float64)
        t = np.asarray(pose.t, np.float64)

        us, vs = np.meshgrid(np.arange(W, dtype=np.float64),
                             np.arange(H, dtype=np.float64))
        dirs_cam = np.stack(
            [(us - cam.cx) / cam.fx, (vs - cam.cy) / cam.fy,
             np.ones_like(us)], axis=-1)
        dirs_world = dirs_cam @ R.T
        rz = dirs_world[..., 2]
        lam = (self.plane_z - t[2]) / np.where(np.abs(rz) < 1e-9, 1e-9, rz)
        hit = lam > 0.05
        pts = t[None, None, :] + lam[..., None] * dirs_world

        tex_x = pts[..., 0] * self.ppm + self.tex.shape[1] / 2
        tex_y = pts[..., 1] * self.ppm + self.tex.shape[0] / 2
        inside = (
            hit & (tex_x >= 0) & (tex_x < self.tex.shape[1] - 1)
            & (tex_y >= 0) & (tex_y < self.tex.shape[0] - 1)
        )

        x0 = np.clip(tex_x.astype(np.int64), 0, self.tex.shape[1] - 2)
        y0 = np.clip(tex_y.astype(np.int64), 0, self.tex.shape[0] - 2)
        fx_ = np.clip(tex_x - x0, 0, 1)
        fy_ = np.clip(tex_y - y0, 0, 1)
        t00 = self.tex[y0, x0]
        t01 = self.tex[y0, x0 + 1]
        t10 = self.tex[y0 + 1, x0]
        t11 = self.tex[y0 + 1, x0 + 1]
        val = (t00 * (1 - fx_) * (1 - fy_) + t01 * fx_ * (1 - fy_)
               + t10 * (1 - fx_) * fy_ + t11 * fx_ * fy_)
        gray = np.where(inside, val, 0.0).astype(np.float32)

        depth = np.where(inside, lam, 0.0).astype(np.float32)
        if self.depth_noise > 0.0:
            noise = self._noise_rng.normal(
                0.0, self.depth_noise, depth.shape).astype(np.float32)
            depth = np.where(depth > 0, np.maximum(depth + noise, 0.05), 0.0)
        rgb = np.repeat(gray[..., None], 3, axis=-1).astype(np.uint8)
        return rgb, depth

    def trajectory(self, n_frames: int, step_t=(0.02, 0.0, 0.0),
                   step_rot=(0.0, 0.0, 0.0)) -> List[Pose]:
        poses = []
        for k in range(n_frames):
            q = quat_from_axis_angle(jnp.asarray(np.array(step_rot) * k,
                                                 dtype=jnp.float32))
            t = jnp.asarray(np.array(step_t) * k, dtype=jnp.float32)
            poses.append(Pose(q=q, t=t))
        return poses

    def loop_trajectory(self, n_frames: int, radius: float = 0.6,
                        center=(0.0, 0.0)) -> List[Pose]:
        """Closed circular loop in the x-y plane facing the textured
        plane: the camera translates around a circle (no rotation, so the
        plane stays in view) and returns exactly to the start — the
        canonical loop-closure scenario."""
        poses = []
        for k in range(n_frames):
            a = 2.0 * np.pi * k / n_frames
            t = jnp.asarray(
                [center[0] + radius * np.sin(a),
                 center[1] + radius * (1.0 - np.cos(a)), 0.0],
                dtype=jnp.float32)
            q = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=jnp.float32)
            poses.append(Pose(q=q, t=t))
        return poses

    def sequence(self, poses: List[Pose]):
        """Yield (rgb, depth, timestamp) like TumRgbdDataset."""
        for k, p in enumerate(poses):
            rgb, depth = self.render(p)
            yield rgb, depth, float(k) / 30.0
