"""Profile local BA on a realistic tracking-produced arena.

Times the full make_local_ba call and its pieces (compaction, dense LM
core at various iteration counts, arena scatter-back) so optimization
targets the real cost, not a guess.  Run on the real device:

    python tools/ba_bench.py
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from modular_slam_tpu.config import SlamConfig
from modular_slam_tpu.engine import make_slam_scan
from modular_slam_tpu.eval.synthetic import PlaneSceneGenerator
from modular_slam_tpu.frontend.tracker import initial_state
from modular_slam_tpu.map.arena import MapArena, empty_arena
from modular_slam_tpu.utils import setup_compile_cache


def timeit(fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def build_arena(cfg, n_frames=48):
    gen = PlaneSceneGenerator(cfg.camera, seed=42)
    poses = gen.trajectory(n_frames, step_t=(0.05, 0.02, 0.01),
                           step_rot=(0.004, 0.008, 0.004))
    frames = [(rgb, depth, ts) for rgb, depth, ts in gen.sequence(poses)]
    w = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)
    grays = jnp.stack([
        jnp.tensordot(jnp.asarray(rgb).astype(jnp.float32), w, 1)
        for rgb, _, _ in frames])
    depths = jnp.stack([jnp.asarray(d) for _, d, _ in frames])
    times = jnp.asarray([ts for _, _, ts in frames], jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), len(frames))
    scan = make_slam_scan(cfg)
    arena, state, res = scan(empty_arena(cfg.map), initial_state(),
                             grays, depths, times, keys)
    jax.block_until_ready(arena)
    kf_slots = np.asarray(res.kf_slot)
    new_kf = np.asarray(res.new_keyframe)
    last_kf = int(kf_slots[np.nonzero(new_kf)[0][-1]])
    print(f"arena: {int(arena.n_kf)} kf, {int(arena.n_lm)} lm, "
          f"{int(arena.n_obs)} obs; last kf_slot={last_kf}", file=sys.stderr)
    return arena, state, last_kf


def main():
    setup_compile_cache()
    cfg = SlamConfig()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    arena, state, kf_slot = build_arena(cfg)
    slot = jnp.int32(kf_slot)

    from modular_slam_tpu.backend.ba import make_local_ba, ba_core_dense
    from modular_slam_tpu.backend import ba as ba_mod

    # --- full local BA (non-donating so it can be re-timed) ---------------
    ba = make_local_ba(cfg)
    ba_nd = jax.jit(ba.__wrapped__)
    print(f"local_ba total: {timeit(lambda: ba_nd(arena, state, slot)):.2f} ms")

    # --- compaction only (the real extract_window) -------------------------
    from modular_slam_tpu.backend.ba import extract_window
    from modular_slam_tpu.geometry.camera import camera_from_config
    import dataclasses

    cam = camera_from_config(cfg.camera)
    bcfg = dataclasses.replace(
        cfg.backend, max_iterations=cfg.backend.local_max_iterations)

    def compact(arena, kf_slot):
        p = extract_window(cam, arena, kf_slot, bcfg)
        return (p.kf_q, p.kf_t, p.lm_pos, p.obs, p.pose_free, p.lm_ok)

    compact_j = jax.jit(compact)
    print(f"compact only: {timeit(lambda: compact_j(arena, slot)):.2f} ms")

    kf_q, kf_t, lm_pos, obs, pose_free, lm_ok = jax.block_until_ready(
        compact_j(arena, slot))
    print(f"window: {int(pose_free.sum())+1} kf, {int(lm_ok.sum())} lm, "
          f"{int((obs.w > 0).sum())} obs", file=sys.stderr)

    # --- dense core at various iteration counts ----------------------------
    for iters in (1, 2, 5, 10):
        b = dataclasses.replace(bcfg, max_iterations=iters)
        core = jax.jit(lambda q, t, l, o, b=b: ba_core_dense(
            cam, q, t, l, o, pose_free, lm_ok, b,
            residual_type=bcfg.local_residual))
        ms = timeit(lambda: core(kf_q, kf_t, lm_pos, obs), n=10)
        print(f"dense core {iters:2d} iters: {ms:.2f} ms")


if __name__ == "__main__":
    main()
