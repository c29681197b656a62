"""Per-stage device microbenchmark on the real chip.

Times each hot stage of the pipeline in isolation (steady-state, after
warmup) so optimization effort targets the actual bottleneck.  Run:

    python tools/stage_bench.py [--csv out.csv]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    from modular_slam_tpu.config import SlamConfig
    from modular_slam_tpu.frontend.tracker import initial_state, track_frame
    from modular_slam_tpu.geometry.camera import camera_from_config
    from modular_slam_tpu.map.arena import empty_arena
    from modular_slam_tpu.ops import blur, fast, orient, pyramid
    from modular_slam_tpu.ops.brief import brief_from_atlas
    from modular_slam_tpu.ops.detector import detect
    from modular_slam_tpu.ops.match import match_descriptors
    from modular_slam_tpu.types import bits_to_pm1

    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0]}")
    cfg = SlamConfig()
    dcfg = cfg.detector
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 4.0, (480, 640)).astype(np.float32))

    results = {}

    # -- pyramid ----------------------------------------------------------
    f_pyr = jax.jit(lambda g: pyramid.build_pyramid(g, dcfg))
    results["pyramid"] = timeit(f_pyr, gray, n=args.n)
    levels = f_pyr(gray)

    # -- fast score + nms (level 0 only, and full pyramid) ---------------
    f_fast = jax.jit(lambda g: fast.nms3x3(fast.fast_score(g)))
    results["fast+nms L0"] = timeit(f_fast, gray, n=args.n)

    def all_levels_fast(levels):
        return [fast.nms3x3(fast.fast_score(l)) for l in levels]
    f_fast_all = jax.jit(all_levels_fast)
    results["fast+nms all levels"] = timeit(f_fast_all, levels, n=args.n)

    # -- blur -------------------------------------------------------------
    f_blur = jax.jit(
        lambda g: blur.gaussian_blur(g, dcfg.blur_ksize, dcfg.blur_sigma))
    results["blur L0"] = timeit(f_blur, gray, n=args.n)

    def all_levels_blur(levels):
        return [blur.gaussian_blur(l, dcfg.blur_ksize, dcfg.blur_sigma)
                for l in levels]
    results["blur all levels"] = timeit(jax.jit(all_levels_blur), levels,
                                        n=args.n)

    # -- moment maps ------------------------------------------------------
    f_mom = jax.jit(orient.moment_maps)
    results["moments L0"] = timeit(f_mom, gray, n=args.n)

    def all_levels_mom(levels):
        return [orient.moment_maps(l) for l in levels]
    results["moments all levels"] = timeit(jax.jit(all_levels_mom), levels,
                                           n=args.n)

    # -- full detect ------------------------------------------------------
    f_det = jax.jit(lambda g, d: detect(g, d, dcfg))
    results["detect (full)"] = timeit(f_det, gray, depth, n=args.n)
    feats = f_det(gray, depth)

    # -- brief only -------------------------------------------------------
    H0, W0 = gray.shape
    atlas = jnp.stack([jnp.zeros((H0, W0), jnp.float32)] * dcfg.n_levels)
    lvl = jnp.zeros((dcfg.max_keypoints,), jnp.int32)
    yx = jnp.full((dcfg.max_keypoints, 2), 100, jnp.int32)
    ang = jnp.zeros((dcfg.max_keypoints,), jnp.float32)
    f_brief = jax.jit(brief_from_atlas)
    results["brief gather"] = timeit(f_brief, atlas, lvl, yx, ang, n=args.n)

    # -- matcher ----------------------------------------------------------
    a = bits_to_pm1(
        jnp.asarray(rng.integers(0, 2, (512, 256)), dtype=jnp.uint8))
    b = bits_to_pm1(
        jnp.asarray(rng.integers(0, 2, (4096, 256)), dtype=jnp.uint8))
    av = jnp.ones((512,), bool)
    bv = jnp.ones((4096,), bool)
    f_match = jax.jit(
        lambda a, av, b, bv: match_descriptors(a, av, b, bv, cfg.matcher))
    results["match 512x4096"] = timeit(f_match, a, av, b, bv, n=args.n)

    # -- full track step --------------------------------------------------
    cam = camera_from_config(cfg.camera)
    arena = empty_arena(cfg.map)
    state = initial_state()
    key = jax.random.PRNGKey(0)

    @jax.jit
    def step(arena, state, gray, depth, t, key):
        feats = detect(gray, depth, dcfg)
        return track_frame(arena, state, feats, cam, cfg, t, key)

    # bootstrap once so the arena has content, then time steady-state
    arena2, state2, _ = step(arena, state, gray, depth, jnp.float32(0.0), key)
    f_step = lambda: step(arena2, state2, gray, depth, jnp.float32(1.0), key)
    results["slam_step (steady)"] = timeit(lambda: f_step()[2], n=args.n)

    print()
    total_detect = results["detect (full)"]
    for k, v in results.items():
        print(f"{k:24s} {v:8.3f} ms")
    print(f"\ndetect share of step: "
          f"{total_detect / results['slam_step (steady)'] * 100:.0f}%")


if __name__ == "__main__":
    main()
