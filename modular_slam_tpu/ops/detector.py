"""ORB-style feature detection over an image pyramid — the frontend's hot
path, fully jittable with static shapes.

Reference pipeline (distributed_cv_feature.cpp, OrbExtractorPimpl::extract
:719-809): pyramid -> per-cell FAST (threshold 20 falling back to 7)
-> quadtree spatial distribution keeping the max-response keypoint per
leaf -> IC orientation -> per-level Gaussian blur -> rotated BRIEF-256
-> scale correction to level-0 coords.

TPU-native redesign (same goals, static shapes; SURVEY.md §7 step 3):
- one FAST *score map* per level serves both thresholds (ops/fast.py);
- the quadtree becomes a fixed grid: per `cell_size` cell keep the top
  `max_per_cell` NMS survivors — the quadtree's ~1-keypoint-per-1000px²
  uniform density with a static candidate count;
- all per-level candidates (fixed count) get IC angle + BRIEF, then one
  global response top-k selects `max_keypoints`;
- depth is sampled at level-0 coords from the depth map.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from modular_slam_tpu.config import DetectorConfig
from modular_slam_tpu.ops.blur import gaussian_blur
from modular_slam_tpu.ops.brief import brief_descriptors
from modular_slam_tpu.ops.fast import fast_score, nms3x3, border_mask
from modular_slam_tpu.ops.orient import ic_angle
from modular_slam_tpu.ops.pyramid import build_pyramid
from modular_slam_tpu.types import (
    Descriptors,
    Features,
    Keypoints,
    bits_to_pm1,
    pack_bits,
)

Array = jnp.ndarray


def _cell_candidates(
    score: Array, cell: int, top_per_cell: int
) -> Tuple[Array, Array]:
    """Per-cell top-k of a score map.

    Returns (yx [C, 2] int32, resp [C]) with C = n_cells * top_per_cell.
    Remainder rows/cols beyond the last full cell are ignored (they lie
    inside the detector border for any sane cell size).
    """
    h, w = score.shape
    ncy, ncx = h // cell, w // cell
    s = score[: ncy * cell, : ncx * cell]
    s = s.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3)
    s = s.reshape(ncy * ncx, cell * cell)
    resp, idx = jax.lax.top_k(s, top_per_cell)  # [n_cells, k]

    cell_ids = jnp.arange(ncy * ncx, dtype=jnp.int32)
    cy = (cell_ids // ncx)[:, None] * cell
    cx = (cell_ids % ncx)[:, None] * cell
    y = cy + (idx // cell)
    x = cx + (idx % cell)
    yx = jnp.stack([y.reshape(-1), x.reshape(-1)], axis=-1).astype(jnp.int32)
    return yx, resp.reshape(-1)


def detect(
    gray: Array, depth: Array, cfg: DetectorConfig
) -> Features:
    """Detect up to cfg.max_keypoints ORB features.

    gray:  [H, W] float32 luma
    depth: [H, W] float32 meters (0 invalid) — sampled per keypoint
    """
    levels = build_pyramid(gray, cfg)
    thr_low = float(cfg.fast_threshold_low)

    uv0_all: List[Array] = []
    resp_all: List[Array] = []
    ang_all: List[Array] = []
    lvl_all: List[Array] = []
    bits_all: List[Array] = []

    for lvl, img in enumerate(levels):
        h, w = img.shape
        score = fast_score(img)
        score = nms3x3(score) * border_mask(h, w, cfg.border, img.dtype)
        # corner iff score > threshold (strict): floor at the low threshold
        score = jnp.where(score > thr_low, score, 0.0)

        yx, resp = _cell_candidates(score, cfg.cell_size, cfg.max_per_cell)
        angles = ic_angle(img, yx)
        blurred = gaussian_blur(img, cfg.blur_ksize, cfg.blur_sigma)
        bits = brief_descriptors(blurred, yx, angles)

        scale = cfg.scale_factor ** lvl
        uv0 = yx[:, ::-1].astype(jnp.float32) * scale  # (x, y) level-0

        uv0_all.append(uv0)
        resp_all.append(resp)
        ang_all.append(angles)
        lvl_all.append(jnp.full(resp.shape, lvl, dtype=jnp.int32))
        bits_all.append(bits)

    uv0 = jnp.concatenate(uv0_all)
    resp = jnp.concatenate(resp_all)
    ang = jnp.concatenate(ang_all)
    lvls = jnp.concatenate(lvl_all)
    bits = jnp.concatenate(bits_all)

    # global top-k by response (invalid candidates have resp == 0)
    k = cfg.max_keypoints
    n_cand = resp.shape[0]
    if n_cand < k:  # small images: pad candidate pool up to capacity
        pad = k - n_cand
        uv0 = jnp.concatenate([uv0, jnp.zeros((pad, 2), uv0.dtype)])
        resp = jnp.concatenate([resp, jnp.zeros((pad,), resp.dtype)])
        ang = jnp.concatenate([ang, jnp.zeros((pad,), ang.dtype)])
        lvls = jnp.concatenate([lvls, jnp.zeros((pad,), lvls.dtype)])
        bits = jnp.concatenate([bits, jnp.zeros((pad, bits.shape[1]), bits.dtype)])
    sel_resp, sel = jax.lax.top_k(resp, k)
    valid = sel_resp > 0.0

    uv = uv0[sel]
    angles = ang[sel]
    levels_sel = lvls[sel]
    bits_sel = bits[sel]

    # depth lookup at level-0 coords (nearest pixel)
    hh, ww = depth.shape
    ix = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, ww - 1)
    iy = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, hh - 1)
    d = depth[iy, ix]

    kps = Keypoints(
        uv=uv,
        response=jnp.where(valid, sel_resp, 0.0),
        angle=angles,
        level=jnp.where(valid, levels_sel, -1),
        depth=jnp.where(valid, d, 0.0),
        valid=valid,
    )
    packed = pack_bits(bits_sel)
    desc = Descriptors(packed=packed, unpacked=bits_to_pm1(bits_sel))
    return Features(keypoints=kps, descriptors=desc)
