"""Pinhole camera model as pure jnp functions.

Reference parity: projectOnImage / toCameraCoordinates / isVisibleInFrame
(/root/reference/src/lib/modular_slam/projection.cpp:6-62) and depth
back-projection (rgbd_feature_frontend.cpp:101-114 reconstructPoint).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from modular_slam_tpu.config import CameraConfig
from modular_slam_tpu.geometry.se3 import Pose, pose_apply_inverse

Array = jnp.ndarray


class Camera(NamedTuple):
    """Intrinsics as device scalars — a pytree, safe to close over or pass
    to jitted functions without retracing on value changes."""

    fx: Array
    fy: Array
    cx: Array
    cy: Array
    width: int   # static
    height: int  # static


def camera_from_config(cfg: CameraConfig) -> Camera:
    f32 = jnp.float32
    return Camera(
        fx=f32(cfg.fx), fy=f32(cfg.fy), cx=f32(cfg.cx), cy=f32(cfg.cy),
        width=cfg.width, height=cfg.height,
    )


def project(cam: Camera, pts_cam: Array) -> Array:
    """Camera-frame points [..., 3] -> pixel coords [..., 2].

    Matches projectOnImage (projection.cpp:6-11): uv = xy/z * f + pp.
    z <= 0 yields garbage values; callers must mask with `is_visible`.
    """
    z = pts_cam[..., 2:3]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xy = pts_cam[..., :2] * inv_z
    f = jnp.stack([cam.fx, cam.fy])
    pp = jnp.stack([cam.cx, cam.cy])
    return xy * f + pp


def project_world(cam: Camera, pose: Pose, pts_world: Array) -> Array:
    """World points -> pixels through a camera-to-world pose
    (projection.cpp:35-40)."""
    return project(cam, pose_apply_inverse(pose, pts_world))


def backproject(cam: Camera, uv: Array, depth: Array) -> Array:
    """Pixels [..., 2] + depth [...] -> camera-frame 3D points [..., 3].

    Matches reconstructPoint (rgbd_feature_frontend.cpp:101-114):
    x = (u - cx) * z / fx, y = (v - cy) * z / fy.
    """
    z = depth
    x = (uv[..., 0] - cam.cx) * z / cam.fx
    y = (uv[..., 1] - cam.cy) * z / cam.fy
    return jnp.stack([x, y, z], axis=-1)


def is_visible(cam: Camera, pts_cam: Array) -> Array:
    """Visibility mask (projection.cpp:42-49): projects inside the image
    and z > 0."""
    uv = project(cam, pts_cam)
    inside = (
        (uv[..., 0] >= 0)
        & (uv[..., 0] < cam.width)
        & (uv[..., 1] >= 0)
        & (uv[..., 1] < cam.height)
    )
    return inside & (pts_cam[..., 2] > 0.0)
