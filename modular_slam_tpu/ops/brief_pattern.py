"""Deterministic BRIEF-256 sampling pattern.

The reference hardcodes OpenCV's learned 256-pair ORB pattern
(distributed_cv_feature.cpp:25-282).  We deliberately do NOT copy that
table; instead we generate a classic BRIEF G-II pattern (Calonder et al.):
both endpoints i.i.d. N(0, (patch/5)^2), clipped to the 27x27 inner box of
the 31px patch, from a fixed seed — deterministic across runs.  Matching
is self-consistent (the same pattern describes every frame), so SLAM
behavior is preserved; descriptors are simply not byte-identical to
OpenCV's, which only matters for cross-library descriptor exchange.
"""

from __future__ import annotations

import numpy as np

_PATCH_RADIUS = 13  # endpoints within [-13, 13]; rotated radius <= 18.4
_SEED = 0x0B5E55ED


def make_pattern(n_pairs: int = 256, seed: int = _SEED) -> np.ndarray:
    """[n_pairs, 4] int32: (x1, y1, x2, y2) offsets from the patch center."""
    rng = np.random.default_rng(seed)
    sigma = 31.0 / 5.0
    pts = rng.normal(0.0, sigma, size=(n_pairs, 4))
    pts = np.clip(np.round(pts), -_PATCH_RADIUS, _PATCH_RADIUS).astype(np.int32)
    # avoid degenerate pairs (identical endpoints): nudge x2 by +1
    same = (pts[:, 0] == pts[:, 2]) & (pts[:, 1] == pts[:, 3])
    pts[same, 2] = np.clip(pts[same, 2] + 1, -_PATCH_RADIUS, _PATCH_RADIUS)
    return pts


PATTERN = make_pattern()
