"""Trustworthy per-op device timing: ops timed INSIDE a lax.scan over
varying inputs.

Why: timing a jitted op by re-dispatching it with the SAME input arrays
(tools/stage_bench.py's original method) under-reports through the axon
tunnel — repeated identical executions return far faster than the op's
real device time, so numbers like "detect = 0.08 ms" appear while the
same op inside the engine scan costs 2.8 ms/frame.  Scanning over a
batch of DIFFERENT inputs in one dispatch measures what the engine
actually pays.

Run: python tools/scan_bench.py [--probe detect|match|all]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def probe(run, args_tree, n, label):
    import jax

    out = run(*args_tree)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(run(*args_tree))
    print(f"{label:28s} {(time.perf_counter() - t0) / n * 1e3:7.3f} "
          f"ms/frame", flush=True)


def scan_probe(body, xs, n, label):
    """body(per-step slices...) -> scalar; xs: tuple of [n, ...] arrays."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*xs):
        def b(c, x):
            return c + body(*x), 0
        return jax.lax.scan(b, jnp.float32(0), xs)[0]

    probe(run, xs, n, label)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default="all",
                    choices=["detect", "match", "all"])
    ap.add_argument("--n", type=int, default=12)
    args = ap.parse_args()

    from modular_slam_tpu.utils import setup_compile_cache

    setup_compile_cache()
    import jax
    import jax.numpy as jnp

    from modular_slam_tpu.config import SlamConfig

    cfg = SlamConfig()
    dcfg = cfg.detector
    n = args.n
    rng = np.random.default_rng(0)
    grays = jnp.asarray(rng.uniform(0, 255, (n, 480, 640)).astype(np.float32))
    depths = jnp.asarray(
        rng.uniform(0.5, 2.5, (n, 480, 640)).astype(np.float32))
    print(f"device: {jax.devices()[0]}", flush=True)

    if args.probe in ("detect", "all"):
        from modular_slam_tpu.ops import blur, fast, orient, pyramid
        from modular_slam_tpu.ops.detector import detect

        scan_probe(lambda g, d: detect(g, d, dcfg).keypoints.response.sum(),
                   (grays, depths), n, "detect (full)")
        scan_probe(
            lambda g, d: sum(l.sum() for l in pyramid.build_pyramid(g, dcfg)),
            (grays, depths), n, "pyramid")

        def fast_all(g, d):
            levels = pyramid.build_pyramid(g, dcfg)
            return sum(fast.nms3x3(fast.fast_score(l)).sum() for l in levels)
        scan_probe(fast_all, (grays, depths), n, "pyramid+fast+nms")

        def blur_all(g, d):
            levels = pyramid.build_pyramid(g, dcfg)
            return sum(blur.gaussian_blur(l, dcfg.blur_ksize,
                                          dcfg.blur_sigma).sum()
                       for l in levels)
        scan_probe(blur_all, (grays, depths), n, "pyramid+blur")

        def mom_all(g, d):
            levels = pyramid.build_pyramid(g, dcfg)
            return sum(orient.moment_maps(l).sum() for l in levels)
        scan_probe(mom_all, (grays, depths), n, "pyramid+moments")

    if args.probe in ("match", "all"):
        from modular_slam_tpu.ops.match import dedupe_matches, \
            match_descriptors
        from modular_slam_tpu.ops.match_pallas import (
            match_descriptors_pallas, pallas_match_supported)

        Nq, L = dcfg.max_keypoints, cfg.map.max_landmarks
        qs = jnp.asarray(
            rng.integers(0, 2, (n, Nq, 256)).astype(np.int8) * 2 - 1)
        t = jnp.asarray(rng.integers(0, 2, (L, 256)).astype(np.int8) * 2 - 1)
        qv = jnp.ones((Nq,), bool)
        tv = jnp.asarray(rng.random(L) > 0.1)

        scan_probe(
            lambda q: match_descriptors(q, qv, t, tv, cfg.matcher)
            .distance.sum(), (qs,), n, f"match XLA {Nq}x{L}")
        if pallas_match_supported(Nq, L, 256):
            scan_probe(
                lambda q: match_descriptors_pallas(q, qv, t, tv, cfg.matcher)
                .distance.sum(), (qs,), n, f"match Pallas {Nq}x{L}")

        def with_dedupe(match_fn):
            def f(q):
                m = match_fn(q, qv, t, tv, cfg.matcher)
                return dedupe_matches(m, L).distance.sum()
            return f
        scan_probe(with_dedupe(match_descriptors), (qs,), n,
                   "match XLA + dedupe")
        if pallas_match_supported(Nq, L, 256):
            scan_probe(with_dedupe(match_descriptors_pallas), (qs,), n,
                       "match Pallas + dedupe")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
