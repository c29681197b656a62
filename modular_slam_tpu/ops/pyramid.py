"""Image pyramid construction.

Reference: 8 levels, scale 1.2, each level resized from the previous with
bilinear interpolation (distributed_cv_feature.cpp:830-841; stella-style
resize chain).  Level shapes are static functions of the base shape and
config, so everything jits with fixed shapes.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from modular_slam_tpu.config import DetectorConfig

Array = jnp.ndarray


def pyramid_shapes(h: int, w: int, cfg: DetectorConfig) -> List[Tuple[int, int]]:
    shapes = [(h, w)]
    for lvl in range(1, cfg.n_levels):
        s = cfg.scale_factor ** lvl
        shapes.append((int(round(h / s)), int(round(w / s))))
    return shapes


def level_scale(cfg: DetectorConfig, level: int) -> float:
    return cfg.scale_factor ** level


def build_pyramid(gray: Array, cfg: DetectorConfig) -> List[Array]:
    """gray [H, W] float32 -> list of n_levels arrays, resize-chained."""
    h, w = gray.shape
    shapes = pyramid_shapes(h, w, cfg)
    levels = [gray]
    for lvl in range(1, cfg.n_levels):
        prev = levels[-1]
        levels.append(
            jax.image.resize(prev, shapes[lvl], method="linear", antialias=False)
        )
    return levels
