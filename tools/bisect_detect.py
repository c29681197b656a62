"""Bisect detect() stages on the device.  Run with PYTHONPATH incl. repo."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from modular_slam_tpu.config import SlamConfig
from modular_slam_tpu.ops.blur import gaussian_blur
from modular_slam_tpu.ops.brief import brief_from_atlas
from modular_slam_tpu.ops.detector import _cell_candidates, _pad_to, detect
from modular_slam_tpu.ops.fast import border_mask, fast_score, nms3x3
from modular_slam_tpu.ops.orient import moment_maps
from modular_slam_tpu.ops.pyramid import build_pyramid


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def _warm_sync():
    """Run one slam_step first: on the axon relay, block_until_ready only
    reports true execution time after a first full-step dispatch."""
    from modular_slam_tpu.engine import make_slam_step
    from modular_slam_tpu.frontend.tracker import initial_state
    from modular_slam_tpu.map.arena import empty_arena
    from modular_slam_tpu.config import SlamConfig
    c = SlamConfig()
    step = make_slam_step(c)
    import numpy as _np
    g = jnp.asarray(_np.zeros((480, 640), _np.float32))
    d = jnp.asarray(_np.ones((480, 640), _np.float32))
    a, s, _, _ = step(empty_arena(c.map), initial_state(), g, d,
                      jnp.float32(0.0), jax.random.PRNGKey(0))
    jax.block_until_ready(a)


def main():
    _warm_sync()
    cfg = SlamConfig().detector
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 2.5, (480, 640)).astype(np.float32))

    @jax.jit
    def s1(gray):
        return build_pyramid(gray, cfg)

    @jax.jit
    def s2(gray):
        levels = build_pyramid(gray, cfg)
        outs = []
        for img in levels:
            h, w = img.shape
            sc = nms3x3(fast_score(img)) * border_mask(h, w, cfg.border, img.dtype)
            outs.append(jnp.where(sc > float(cfg.fast_threshold_low), sc, 0.0))
        return outs

    @jax.jit
    def s3(gray):
        scores = s2.__wrapped__(gray)
        return [_cell_candidates(s, cfg.cell_size, cfg.max_per_cell)
                for s in scores]

    @jax.jit
    def s4(gray):
        levels = build_pyramid(gray, cfg)
        return [gaussian_blur(img, cfg.blur_ksize, cfg.blur_sigma)
                for img in levels]

    @jax.jit
    def s5(gray):
        levels = build_pyramid(gray, cfg)
        return [moment_maps(img) for img in levels]

    @jax.jit
    def s6(gray, depth):
        return detect(gray, depth, cfg)

    print(f"pyramid            : {timeit(s1, gray):7.2f} ms")
    print(f"+fast/nms          : {timeit(s2, gray):7.2f} ms")
    print(f"+cell cands        : {timeit(s3, gray):7.2f} ms")
    print(f"pyramid+blur       : {timeit(s4, gray):7.2f} ms")
    print(f"pyramid+moments    : {timeit(s5, gray):7.2f} ms")
    print(f"full detect        : {timeit(s6, gray, depth):7.2f} ms")


if __name__ == "__main__":
    main()
