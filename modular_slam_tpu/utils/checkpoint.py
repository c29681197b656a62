"""Checkpoint / resume for the SLAM system.

The reference has no persistence at all (SURVEY.md §5: the map is never
serialized).  The tensor arena makes this trivial: every piece of engine
state is a flat pytree of arrays — dump to one .npz, restore
functionally.  Covers: map arena, tracking state, BoW database,
pose-graph edges, trajectory, RNG key, config echo.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict

import numpy as np
import jax.numpy as jnp


def _flatten(prefix: str, tree: Any, out: Dict[str, np.ndarray]) -> None:
    if hasattr(tree, "_fields"):  # NamedTuple
        for name in tree._fields:
            _flatten(f"{prefix}{name}.", getattr(tree, name), out)
    else:
        out[prefix.rstrip(".")] = np.asarray(tree)


def _config_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def save_checkpoint(path: str, system) -> None:
    """Serialize a SlamSystem to `path` (.npz)."""
    # deferred chunk bookkeeping / in-flight async BA must land first
    system.flush_backend()
    out: Dict[str, np.ndarray] = {}
    _flatten("arena.", system.arena, out)
    _flatten("state.", system.state, out)
    out["key"] = np.asarray(system._key)
    if system._loop is not None:
        _flatten("loopdb.", system._loop.db, out)
        _flatten("edges.", system._loop.edges, out)
        out["loop.n_edges"] = np.int64(system._loop._n_edges)
        out["loop.prev_kf"] = np.int64(
            -1 if system._loop._prev_kf is None else system._loop._prev_kf)
        out["loop.n_global_ba"] = np.int64(system._loop.n_global_ba)
        # closure-cooldown state (round 5): a resumed run must not
        # re-fire a closure the cooldown was suppressing
        out["loop.kf_counter"] = np.int64(system._loop._kf_counter)
        out["loop.last_closure_at"] = np.int64(
            system._loop._last_closure_at)
        # the database histograms are only meaningful against the codebook
        # that produced them — ship it with the checkpoint so a resume on
        # an install with a different/missing packaged vocab still scores
        # consistently (restore swaps it in via LoopPipeline.set_vocab)
        out["loop.vocab"] = np.asarray(system._loop._vocab, np.int8)
    # engine counters (a resumed run continues its statistics)
    out["counters"] = np.array([
        system.n_loop_closures, system.n_relocalizations,
        system._kf_since_ba], np.int64)
    # live-tuned runtime parameter values (utils/params.py): a resumed
    # run keeps e.g. a tuned lba_max_num_iterations instead of silently
    # reverting to the config default
    out["params_json"] = np.frombuffer(json.dumps(
        {k: system.params.get(k) for k in system.params.names()}
    ).encode(), dtype=np.uint8)
    traj = np.array(
        [[t, *np.asarray(p.t), *np.asarray(p.q)] for t, p in system.trajectory],
        dtype=np.float64,
    ).reshape(-1, 8)
    out["trajectory"] = traj
    out["config_json"] = np.frombuffer(
        json.dumps(_config_dict(system.cfg)).encode(), dtype=np.uint8)
    np.savez_compressed(path, **out)


def _unflatten(cls, prefix: str, data) -> Any:
    kwargs = {}
    for name, field_type in cls.__annotations__.items():
        full = f"{prefix}{name}"
        kwargs[name] = jnp.asarray(data[full])
    return cls(**kwargs)


def load_checkpoint(path: str, system) -> None:
    """Restore arena/state/loop-state into an existing SlamSystem built
    with the SAME config (capacities must match; enforced by shapes)."""
    from modular_slam_tpu.geometry.se3 import Pose
    from modular_slam_tpu.frontend.tracker import TrackState
    from modular_slam_tpu.map.arena import MapArena

    data = np.load(path)
    arena = _unflatten(MapArena, "arena.", data)
    for a, b in zip(arena, system.arena):
        if hasattr(b, "shape") and a.shape != b.shape:
            raise ValueError(
                f"checkpoint capacity mismatch: {a.shape} vs {b.shape}")
    system.arena = arena
    system.state = TrackState(
        pose=Pose(q=jnp.asarray(data["state.pose.q"]),
                  t=jnp.asarray(data["state.pose.t"])),
        ref_kf=jnp.asarray(data["state.ref_kf"]),
        frame_idx=jnp.asarray(data["state.frame_idx"]),
        lost=jnp.asarray(data["state.lost"]),
        since_kf=(jnp.asarray(data["state.since_kf"])
                  if "state.since_kf" in data else jnp.int32(0)),
    )
    system._key = jnp.asarray(data["key"])
    if system._loop is not None and "loopdb.hists" in data:
        from modular_slam_tpu.loop.detector import LoopDatabase
        from modular_slam_tpu.backend.posegraph import PoseGraphEdges

        if "loop.vocab" in data:
            saved_vocab = np.asarray(data["loop.vocab"], np.int8)
            if not np.array_equal(saved_vocab,
                                  np.asarray(system._loop._vocab, np.int8)):
                system._loop.set_vocab(saved_vocab)
                # the chunked scan bakes the vocab into its in-scan
                # relocalizer — rebuild it against the restored codebook
                system._scan = None
                system._scan_takes_db = False
        system._loop.db = _unflatten(LoopDatabase, "loopdb.", data)
        system._loop.edges = _unflatten(PoseGraphEdges, "edges.", data)
        system._loop._n_edges = int(data["loop.n_edges"])
        pk = int(data["loop.prev_kf"])
        system._loop._prev_kf = None if pk < 0 else pk
        if "loop.n_global_ba" in data:
            system._loop.n_global_ba = int(data["loop.n_global_ba"])
        if "loop.kf_counter" in data:
            system._loop._kf_counter = int(data["loop.kf_counter"])
            system._loop._last_closure_at = int(
                data["loop.last_closure_at"])
    if "counters" in data:
        c = data["counters"]
        system.n_loop_closures = int(c[0])
        system.n_relocalizations = int(c[1])
        system._kf_since_ba = int(c[2])
    if "params_json" in data:
        vals = json.loads(bytes(data["params_json"]).decode())
        for k, v in vals.items():
            if k in system.params.names() and system.params.get(k) != v:
                system.params.set(k, v)  # re-tunes + rebuilds the step
    traj = data["trajectory"]
    system.trajectory = [
        (float(r[0]), Pose(q=jnp.asarray(r[4:8], dtype=jnp.float32),
                           t=jnp.asarray(r[1:4], dtype=jnp.float32)))
        for r in traj
    ]
