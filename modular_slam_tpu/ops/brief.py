"""Rotated BRIEF-256 descriptor extraction.

Reference: steered BRIEF over a blurred level image with a 256-pair
pattern (distributed_cv_feature.cpp:572-630): each bit is
I(p + R(theta) a_i) < I(p + R(theta) b_i) with rotated, rounded offsets.
We use our own deterministic pattern (ops/brief_pattern.py) and gather
all 512 sample points per keypoint from a 37x37 patch.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from modular_slam_tpu.ops.brief_pattern import PATTERN
from modular_slam_tpu.ops.orient import gather_patches

Array = jnp.ndarray

# rotated endpoint radius <= 13*sqrt(2) ~= 18.39 -> 37x37 patch
BRIEF_PATCH = 37
_R = BRIEF_PATCH // 2  # 18


def brief_descriptors(blurred: Array, yx: Array, angles: Array) -> Array:
    """Compute [N, 256] descriptor bits (uint8 0/1).

    blurred: [H, W] blurred level image
    yx:      [N, 2] int32 keypoint centers (y, x) in level coords
    angles:  [N] float32 IC angles (radians)
    """
    pat = jnp.asarray(PATTERN, dtype=jnp.float32)  # [256, 4] x1 y1 x2 y2
    cos = jnp.cos(angles)[:, None]
    sin = jnp.sin(angles)[:, None]

    x1, y1, x2, y2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]
    # rotate offsets: x' = cos*x - sin*y ; y' = sin*x + cos*y (per keypoint)
    rx1 = jnp.round(cos * x1 - sin * y1).astype(jnp.int32)
    ry1 = jnp.round(sin * x1 + cos * y1).astype(jnp.int32)
    rx2 = jnp.round(cos * x2 - sin * y2).astype(jnp.int32)
    ry2 = jnp.round(sin * x2 + cos * y2).astype(jnp.int32)

    patches = gather_patches(blurred, yx, BRIEF_PATCH)  # [N, 37, 37]
    flat = patches.reshape(patches.shape[0], -1)        # [N, 1369]

    idx1 = (ry1 + _R) * BRIEF_PATCH + (rx1 + _R)        # [N, 256]
    idx2 = (ry2 + _R) * BRIEF_PATCH + (rx2 + _R)
    v1 = jnp.take_along_axis(flat, idx1, axis=1)
    v2 = jnp.take_along_axis(flat, idx2, axis=1)
    return (v1 < v2).astype(jnp.uint8)


def rotated_offsets(angles: Array):
    """Rotate the pattern for each angle.  -> (ry1, rx1, ry2, rx2), each
    [N, 256] int32."""
    pat = jnp.asarray(PATTERN, dtype=jnp.float32)
    cos = jnp.cos(angles)[:, None]
    sin = jnp.sin(angles)[:, None]
    x1, y1, x2, y2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]
    rx1 = jnp.round(cos * x1 - sin * y1).astype(jnp.int32)
    ry1 = jnp.round(sin * x1 + cos * y1).astype(jnp.int32)
    rx2 = jnp.round(cos * x2 - sin * y2).astype(jnp.int32)
    ry2 = jnp.round(sin * x2 + cos * y2).astype(jnp.int32)
    return ry1, rx1, ry2, rx2


def brief_from_atlas(
    blur_atlas: Array,   # [n_levels, H, W] padded blurred pyramid
    level: Array,        # [N] int32
    yx: Array,           # [N, 2] int32 level coords
    angles: Array,       # [N]
) -> Array:
    """Descriptor bits via ONE flat gather from the padded pyramid atlas —
    no per-keypoint patch materialization (the gather-bound path that
    dominated the first detector implementation)."""
    nlev, H, W = blur_atlas.shape
    ry1, rx1, ry2, rx2 = rotated_offsets(angles)
    base = level.astype(jnp.int32) * (H * W)
    y = yx[:, 0:1]
    x = yx[:, 1:2]
    idx1 = base[:, None] + (y + ry1) * W + (x + rx1)
    idx2 = base[:, None] + (y + ry2) * W + (x + rx2)
    flat = blur_atlas.reshape(-1)
    v1 = jnp.take(flat, idx1)
    v2 = jnp.take(flat, idx2)
    return (v1 < v2).astype(jnp.uint8)
