"""Multi-sequence batched SLAM (BASELINE config 5 harness).

Runs B independent sequences lock-step through the batched engine step
(parallel/dp.py) on a device mesh, then reports per-sequence
trajectories and the scaling-efficiency metric
throughput(N devices) / (N * throughput(1 device)).
"""

from __future__ import annotations

import time
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from modular_slam_tpu.config import SlamConfig
from modular_slam_tpu.geometry.se3 import Pose
from modular_slam_tpu.parallel.dp import make_batch_init, make_batch_slam_step
from modular_slam_tpu.parallel.mesh import make_mesh


class MultiSequenceRunner:
    """Lock-step batched odometry over B sequences."""

    def __init__(self, cfg: SlamConfig, batch: int, mesh=None, seed: int = 0):
        self.cfg = cfg
        self.batch = batch
        self.mesh = mesh or make_mesh(seq=1)
        self._step = make_batch_slam_step(cfg, self.mesh)
        self.arenas, self.states = make_batch_init(cfg, self.mesh, batch)
        self._key = jax.random.PRNGKey(seed)
        self.trajectories: List[List[Tuple[float, Pose]]] = [
            [] for _ in range(batch)]

    def process_batch(self, grays, depths, times) -> None:
        """grays/depths: [B, H, W] device or numpy; times: [B]."""
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self.batch)
        self.arenas, self.states, results = self._step(
            self.arenas, self.states, jnp.asarray(grays),
            jnp.asarray(depths), jnp.asarray(times), keys)
        q = np.asarray(results.pose.q)
        t = np.asarray(results.pose.t)
        ts = np.asarray(times)
        for b in range(self.batch):
            self.trajectories[b].append(
                (float(ts[b]),
                 Pose(q=jnp.asarray(q[b]), t=jnp.asarray(t[b]))))

    def run(self, sequences: Sequence, max_frames: int | None = None) -> dict:
        """sequences: list of B iterables of (rgb, depth, ts).  Shorter
        sequences repeat their last frame (lock-step batching)."""
        iters = [list(s) for s in sequences]
        n = min(len(s) for s in iters)
        if max_frames is not None:
            n = min(n, max_frames)
        w = np.array([0.299, 0.587, 0.114], np.float32)

        t0 = time.perf_counter()
        for i in range(n):
            grays = np.stack([s[i][0].astype(np.float32) @ w for s in iters])
            depths = np.stack([s[i][1] for s in iters])
            times = np.array([s[i][2] for s in iters], np.float32)
            self.process_batch(grays, depths, times)
        jax.block_until_ready(self.states)
        dt = time.perf_counter() - t0
        return {
            "frames_per_sequence": n,
            "total_frames": n * self.batch,
            "wall_s": dt,
            "frames_per_s": n * self.batch / dt,
        }


def scaling_efficiency(throughput_n: float, throughput_1: float,
                       n_devices: int) -> float:
    """BASELINE.md metric: throughput(N) / (N * throughput(1))."""
    return throughput_n / (n_devices * throughput_1)
