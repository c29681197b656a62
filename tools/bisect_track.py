"""Bisect the jitted slam_step to find where the fused-step time goes.

Builds progressively larger prefixes of the tracking step as separate jits
and times each on the default device.  Run: python tools/bisect_track.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from modular_slam_tpu.config import SlamConfig
from modular_slam_tpu.engine import make_slam_step
from modular_slam_tpu.frontend.tracker import TrackState, _track, initial_state
from modular_slam_tpu.geometry.camera import backproject, camera_from_config
from modular_slam_tpu.map.arena import (
    add_keyframe, add_landmarks, add_observations, empty_arena,
    khop_keyframes, visible_landmarks,
)
from modular_slam_tpu.ops.detector import detect
from modular_slam_tpu.ops.match import dedupe_matches, match_descriptors
from modular_slam_tpu.ops.pnp import ransac_pnp


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = SlamConfig()
    cam = camera_from_config(cfg.camera)
    tcfg = cfg.tracker
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 2.5, (480, 640)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    t = jnp.float32(0.0)

    # build a populated arena via one bootstrap step
    step = make_slam_step(cfg)
    arena = empty_arena(cfg.map)
    state = initial_state()
    arena, state, _, feats0 = step(arena, state, gray, depth, t, key)
    jax.block_until_ready(arena)

    print(f"device: {jax.devices()[0]}  kf={int(arena.n_kf)} lm={int(arena.n_lm)}")

    # --- stage prefixes -----------------------------------------------------
    @jax.jit
    def p1(gray, depth):
        return detect(gray, depth, cfg.detector)

    @jax.jit
    def p2(arena, state, gray, depth):
        feats = detect(gray, depth, cfg.detector)
        kf_mask = khop_keyframes(arena, state.ref_kf, tcfg.covis_depth_tracking)
        lm_mask = visible_landmarks(arena, kf_mask)
        return feats, kf_mask, lm_mask

    @jax.jit
    def p3(arena, state, gray, depth):
        feats, kf_mask, lm_mask = p2.__wrapped__(arena, state, gray, depth)
        kps = feats.keypoints
        matches = match_descriptors(feats.descriptors.unpacked, kps.valid,
                                    arena.lm_desc, lm_mask, cfg.matcher)
        matches = dedupe_matches(matches, arena.max_landmarks)
        return matches

    @jax.jit
    def p4(arena, state, gray, depth, key):
        feats = detect(gray, depth, cfg.detector)
        kps = feats.keypoints
        kf_mask = khop_keyframes(arena, state.ref_kf, tcfg.covis_depth_tracking)
        lm_mask = visible_landmarks(arena, kf_mask)
        matches = match_descriptors(feats.descriptors.unpacked, kps.valid,
                                    arena.lm_desc, lm_mask, cfg.matcher)
        matches = dedupe_matches(matches, arena.max_landmarks)
        m_ok = matches.valid & (kps.depth > 0.0)
        pts_world = arena.lm_pos[matches.lm_slot]
        pts_cam = backproject(cam, kps.uv, kps.depth)
        pnp = ransac_pnp(cam, pts_world, kps.uv, pts_cam, m_ok,
                         state.pose, key, cfg.pnp)
        return pnp

    @jax.jit
    def p5(arena, state, gray, depth, key):
        feats = detect(gray, depth, cfg.detector)
        return _track(arena, state, feats, cam, cfg, t, key)

    step_nodonate = jax.jit(lambda a, s, g, d, tt, k: step.__wrapped__(a, s, g, d, tt, k))

    print(f"p1 detect                : {timeit(p1, gray, depth):7.2f} ms")
    print(f"p2 +khop/visible         : {timeit(p2, arena, state, gray, depth):7.2f} ms")
    print(f"p3 +match/dedupe         : {timeit(p3, arena, state, gray, depth):7.2f} ms")
    print(f"p4 +pnp                  : {timeit(p4, arena, state, gray, depth, key):7.2f} ms")
    print(f"p5 full _track           : {timeit(p5, arena, state, gray, depth, key):7.2f} ms")
    print(f"p6 slam_step (no donate) : {timeit(step_nodonate, arena, state, gray, depth, t, key):7.2f} ms")

    # donated step needs fresh arena copies per call: time differently
    def run_donated():
        a = jax.tree.map(lambda x: x.copy() if hasattr(x, 'copy') else x, arena)
        return step(a, state, gray, depth, t, key)
    for _ in range(3):
        out = run_donated()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = run_donated()
    jax.block_until_ready(out)
    print(f"p7 slam_step (donate+copy): {(time.perf_counter()-t0)/10*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
