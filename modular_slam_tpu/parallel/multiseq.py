"""Multi-sequence batched SLAM (BASELINE config 5 harness).

Runs B independent sequences lock-step through the batched engine scan
(parallel/dp.py) on a device mesh — C frames of all B sequences per
dispatch, one host sync at the end — then reports per-sequence
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
from modular_slam_tpu.parallel.dp import (
    make_batch_init,
    make_batch_slam_scan,
    make_batch_slam_step,
)
from modular_slam_tpu.parallel.mesh import make_mesh


class MultiSequenceRunner:
    """Lock-step batched odometry over B sequences (chunked dispatch)."""

    def __init__(self, cfg: SlamConfig, batch: int, mesh=None, seed: int = 0,
                 chunk: int = 8):
        self.cfg = cfg
        self.batch = batch
        self.chunk = chunk
        self.mesh = mesh or make_mesh(seq=1)
        self._step = make_batch_slam_step(cfg, self.mesh)
        self._scan = make_batch_slam_scan(cfg, self.mesh)
        self.arenas, self.states = make_batch_init(cfg, self.mesh, batch)
        self._key = jax.random.PRNGKey(seed)
        self.trajectories: List[List[Tuple[float, Pose]]] = [
            [] for _ in range(batch)]

    def process_batch(self, grays, depths, times) -> None:
        """One frame of every sequence: grays/depths [B, H, W]; times [B]."""
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self.batch)
        self.arenas, self.states, results = self._step(
            self.arenas, self.states, jnp.asarray(grays),
            jnp.asarray(depths), jnp.asarray(times), keys)
        self._collect(results.pose.q[None], results.pose.t[None],
                      np.asarray(times)[None])

    def process_chunk(self, grays, depths, times) -> None:
        """C frames of every sequence in ONE dispatch: grays/depths
        [C, B, H, W]; times [C, B]."""
        C = grays.shape[0]
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, C * self.batch).reshape(
            C, self.batch, 2)
        self.arenas, self.states, results = self._scan(
            self.arenas, self.states, jnp.asarray(grays),
            jnp.asarray(depths), jnp.asarray(times), keys)
        self._collect(results.pose.q, results.pose.t, np.asarray(times))

    def _collect(self, q, t, ts) -> None:
        """Append [C, B] pose arrays to the per-sequence trajectories
        (one host transfer per call)."""
        q, t = np.asarray(q), np.asarray(t)
        for i in range(q.shape[0]):
            for b in range(self.batch):
                self.trajectories[b].append(
                    (float(ts[i, b]),
                     Pose(q=jnp.asarray(q[i, b]), t=jnp.asarray(t[i, b]))))

    def run(self, sequences: Sequence, max_frames: int | None = None) -> dict:
        """sequences: list of B iterables of (rgb, depth, ts).  Frames are
        host-staged once, then dispatched `chunk` frames at a time; a
        final partial chunk runs through the per-frame step."""
        iters = [list(s) for s in sequences]
        n = min(len(s) for s in iters)
        if max_frames is not None:
            n = min(n, max_frames)
        from modular_slam_tpu.types import LUMA_WEIGHTS

        w = np.array(LUMA_WEIGHTS, np.float32)
        grays = np.stack([
            np.stack([s[i][0].astype(np.float32) @ w for s in iters])
            for i in range(n)])                          # [n, B, H, W]
        depths = np.stack([
            np.stack([s[i][1] for s in iters]) for i in range(n)])
        times = np.array([[s[i][2] for s in iters] for i in range(n)],
                         np.float32)                     # [n, B]

        t0 = time.perf_counter()
        lo = 0
        while lo + self.chunk <= n:
            hi = lo + self.chunk
            self.process_chunk(grays[lo:hi], depths[lo:hi], times[lo:hi])
            lo = hi
        for i in range(lo, n):
            self.process_batch(grays[i], depths[i], times[i])
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
