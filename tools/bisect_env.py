"""Is the ~70ms a property of the op or of the process state?

Times a trivial add and detect before and after running one full
slam_step, in the same process.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from modular_slam_tpu.config import SlamConfig
from modular_slam_tpu.engine import make_slam_step
from modular_slam_tpu.frontend.tracker import initial_state
from modular_slam_tpu.map.arena import empty_arena
from modular_slam_tpu.ops.detector import detect


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
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 2.5, (480, 640)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    t = jnp.float32(0.0)

    add = jax.jit(lambda a, b: a + b)
    det = jax.jit(lambda g, d: detect(g, d, cfg.detector))

    print(f"add    before: {timeit(add, gray, depth):7.2f} ms")
    print(f"detect before: {timeit(det, gray, depth):7.2f} ms")

    step = make_slam_step(cfg)
    arena = empty_arena(cfg.map)
    state = initial_state()
    arena, state, _, _ = step(arena, state, gray, depth, t, key)
    jax.block_until_ready(arena)
    print("ran one slam_step (bootstrap)")

    print(f"add    after : {timeit(add, gray, depth):7.2f} ms")
    print(f"detect after : {timeit(det, gray, depth):7.2f} ms")

    # run a second (tracking-path) step too
    arena2, state2, _, _ = step(arena, state, gray, depth, t, key)
    jax.block_until_ready(arena2)
    print("ran second slam_step (track)")
    print(f"add    after2: {timeit(add, gray, depth):7.2f} ms")
    print(f"detect after2: {timeit(det, gray, depth):7.2f} ms")

    # and time the step itself without donation hazards: fresh jit
    from modular_slam_tpu.frontend.tracker import track_frame
    from modular_slam_tpu.geometry.camera import camera_from_config
    cam = camera_from_config(cfg.camera)

    @jax.jit
    def step_nodonate(arena, state, gray, depth, tt, k):
        feats = detect(gray, depth, cfg.detector)
        return track_frame(arena, state, feats, cam, cfg, tt, k)

    print(f"step nodonate: {timeit(step_nodonate, arena2, state2, gray, depth, t, key):7.2f} ms")
    print(f"add    after3: {timeit(add, gray, depth):7.2f} ms")


if __name__ == "__main__":
    main()
