"""PLY export of the map: landmark cloud + keyframe frusta.

Lightweight stand-in for the reference's OpenGL viewer geometry
(pointcloud_viewer.cpp landmark points + keyframe frusta): dump the map
as ASCII PLY for any external viewer (meshlab/CloudCompare/Open3D).
A Qt/OpenGL port is explicitly out of scope (SURVEY.md §7 step 10).
"""

from __future__ import annotations

import numpy as np

from modular_slam_tpu.geometry.se3 import Pose, quat_to_matrix


def export_map_ply(path: str, arena, frustum_scale: float = 0.1) -> int:
    """Write landmarks (white) + keyframe frustum corners (red) + camera
    centers (green).  Returns the number of points written."""
    lm_valid = np.asarray(arena.lm_valid)
    lms = np.asarray(arena.lm_pos)[lm_valid]
    kf_valid = np.asarray(arena.kf_valid)
    kf_q = np.asarray(arena.kf_q)[kf_valid]
    kf_t = np.asarray(arena.kf_t)[kf_valid]

    pts = [(p, (200, 200, 200)) for p in lms]
    # frustum corners in camera frame
    s = frustum_scale
    corners = np.array([
        [0, 0, 0], [-s, -s, 2 * s], [s, -s, 2 * s], [s, s, 2 * s],
        [-s, s, 2 * s],
    ])
    import jax.numpy as jnp

    for q, t in zip(kf_q, kf_t):
        R = np.asarray(quat_to_matrix(jnp.asarray(q)))
        world = corners @ R.T + t
        pts.append((world[0], (0, 255, 0)))
        for c in world[1:]:
            pts.append((c, (255, 0, 0)))

    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        for p, (r, g, b) in pts:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {r} {g} {b}\n")
    return len(pts)
