"""Benchmark: SLAM tracking throughput, frames/s/chip, on real hardware.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference publishes no numbers (BASELINE.md), and its C++
build (conan/OpenCV/Ceres/Qt toolchain) is not reproducible in this image,
so the baseline is the reference pipeline's own hot path executed through
the same OpenCV library it uses — cv::ORB(1000) detect (orb_feature.cpp:25)
+ BRUTEFORCE_HAMMING 2-NN knnMatch (:81-117) + cv::solvePnPRansac
(cv_ransac_pnp.cpp:56-57) — timed on this host's CPU over the same frames.
That is the work KeypointSlam::process does per tracked frame
(slam.hpp:74-99) minus map bookkeeping.

Ours: the jitted slam_step (detect + match + RANSAC PnP + arena update)
on the default device (TPU via axon when available), steady-state after
warmup, async dispatch pipelined across frames.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_FRAMES = 67
WARMUP = 3
CHUNK = 16  # frames per device dispatch (amortizes host/tunnel latency)


def _sequence():
    from modular_slam_tpu.config import SlamConfig
    from modular_slam_tpu.eval.synthetic import PlaneSceneGenerator

    cfg = SlamConfig()
    gen = PlaneSceneGenerator(cfg.camera, seed=42)
    poses = gen.trajectory(N_FRAMES, step_t=(0.01, 0.004, 0.002),
                           step_rot=(0.001, 0.002, 0.001))
    frames = [(rgb, depth, ts) for rgb, depth, ts in gen.sequence(poses)]
    return cfg, frames


def bench_ours(cfg, frames) -> float:
    import jax
    import jax.numpy as jnp

    from modular_slam_tpu.engine import make_slam_scan
    from modular_slam_tpu.frontend.tracker import initial_state
    from modular_slam_tpu.map.arena import empty_arena

    scan = make_slam_scan(cfg)
    arena = empty_arena(cfg.map)
    state = initial_state()
    key = jax.random.PRNGKey(0)

    # pre-stage device arrays (host loader is not what we are measuring)
    w = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)
    grays = jnp.stack([
        jnp.tensordot(jnp.asarray(rgb).astype(jnp.float32), w, 1)
        for rgb, _, _ in frames])
    depths = jnp.stack([jnp.asarray(d) for _, d, _ in frames])
    times = jnp.asarray([ts for _, _, ts in frames], jnp.float32)
    keys = jax.random.split(key, len(frames))
    jax.block_until_ready((grays, depths))

    def chunk(a, s, lo, hi):
        return scan(a, s, grays[lo:hi], depths[lo:hi], times[lo:hi],
                    keys[lo:hi])

    # warmup (bootstrap + compile both chunk shapes)
    arena, state, _ = chunk(arena, state, 0, WARMUP)
    arena, state, r0 = chunk(arena, state, WARMUP, WARMUP + CHUNK)
    jax.block_until_ready(state)

    n = len(frames) - WARMUP - CHUNK
    assert n % CHUNK == 0, (n, CHUNK)
    oks = []
    t0 = time.perf_counter()
    for lo in range(WARMUP + CHUNK, len(frames), CHUNK):
        arena, state, res = chunk(arena, state, lo, lo + CHUNK)
        oks.append(res.tracking_ok)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    ok = int(jnp.concatenate(oks).sum())
    print(f"ours: {n} frames in {dt:.3f}s, {ok}/{n} tracked ok",
          file=sys.stderr)
    return n / dt


def bench_opencv_baseline(cfg, frames) -> float:
    """The reference's per-frame hot path via OpenCV (see module doc)."""
    import cv2

    cam = cfg.camera
    Kmat = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                    np.float32)
    orb = cv2.ORB_create(1000)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING)

    # bootstrap on frame 0: detect + backproject to 3D
    grays = [cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY) for rgb, _, _ in frames]
    kp0, des0 = orb.detectAndCompute(grays[0], None)
    depth0 = frames[0][1]
    pts3d, desc_ref = [], []
    for k, d in zip(kp0, des0):
        u, v = int(round(k.pt[0])), int(round(k.pt[1]))
        z = float(depth0[min(v, depth0.shape[0] - 1),
                         min(u, depth0.shape[1] - 1)])
        if z > 0:
            pts3d.append([(k.pt[0] - cam.cx) * z / cam.fx,
                          (k.pt[1] - cam.cy) * z / cam.fy, z])
            desc_ref.append(d)
    pts3d = np.array(pts3d, np.float32)
    desc_ref = np.array(desc_ref)

    t0 = time.perf_counter()
    n = 0
    for gray in grays[WARMUP:]:
        kp, des = orb.detectAndCompute(gray, None)
        if des is None or len(des) < 10:
            continue
        matches = bf.knnMatch(des, desc_ref, k=2)
        good = [m for m, s in (p for p in matches if len(p) == 2)
                if m.distance < 0.7 * s.distance]
        if len(good) >= 10:
            obj = pts3d[[m.trainIdx for m in good]]
            img = np.array([kp[m.queryIdx].pt for m in good], np.float32)
            cv2.solvePnPRansac(obj, img, Kmat, None, iterationsCount=100,
                               reprojectionError=5.0, confidence=0.99)
        n += 1
    dt = time.perf_counter() - t0
    print(f"opencv baseline: {n} frames in {dt:.3f}s", file=sys.stderr)
    return n / dt


def main() -> int:
    from modular_slam_tpu.utils import setup_compile_cache

    setup_compile_cache()
    import jax

    cfg, frames = _sequence()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    fps = bench_ours(cfg, frames)
    base_fps = bench_opencv_baseline(cfg, frames)

    print(json.dumps({
        "metric": "tracking_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / base_fps, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
