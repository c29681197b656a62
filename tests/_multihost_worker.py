"""Worker process for the 2-process multi-host smoke test.

Launched by tests/test_multihost.py with SLAM_COORDINATOR /
SLAM_NUM_PROCESSES / SLAM_PROCESS_ID set; each process brings 4 virtual
CPU devices, so the bootstrap yields a REAL process-spanning 8-device
mesh with gloo cross-process collectives — the same shard_map + psum
pattern the distributed Schur-complement BA uses (backend/ba.py
`allreduce`), without TPU hardware.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# the axon site config forces its own platform; override AFTER import,
# BEFORE backend init (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.ops import segment_sum  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> int:
    from modular_slam_tpu.parallel.bootstrap import (
        global_mesh, initialize_distributed, process_info)

    assert initialize_distributed(cpu_gloo=True), "env bootstrap missed"
    info = process_info()
    assert info["num_processes"] == 2, info
    assert info["global_devices"] == 8, info
    mesh = global_mesh(seq=1, obs=8)

    # the BA reduction pattern: obs-sharded segment_sum + psum == the
    # unsharded global segment sum
    O, K = 64, 4
    rng = np.random.default_rng(0)
    vals = rng.normal(size=(O,)).astype(np.float32)
    seg = rng.integers(0, K, size=(O,)).astype(np.int32)
    sh = NamedSharding(mesh, P("obs"))
    gvals = jax.make_array_from_callback((O,), sh, lambda i: vals[i])
    gseg = jax.make_array_from_callback((O,), sh, lambda i: seg[i])

    def body(v, s):
        return jax.lax.psum(segment_sum(v, s, num_segments=K), "obs")

    f = jax.jit(jax.shard_map(body, mesh=mesh,
                              in_specs=(P("obs"), P("obs")),
                              out_specs=P()))
    out = np.asarray(f(gvals, gseg))
    want = np.zeros(K, np.float32)
    np.add.at(want, seg, vals)
    np.testing.assert_allclose(out, want, rtol=1e-5)
    print(f"MH OK rank={info['process_id']}", flush=True)

    # --- the REAL distributed Schur-complement BA across processes ------
    # halo-sharded global BA (parallel/halo_ba.py) over the spanning
    # 8-device mesh: ppermute window exchange + far-channel psum run as
    # gloo cross-process collectives — BASELINE config 5's "distributed
    # Schur-complement BA across >= 2 hosts" exercised with 2 real
    # processes (CPU-mesh proxy for the fabric).
    from jax.sharding import NamedSharding as _NS

    from modular_slam_tpu.config import (BackendConfig, CameraConfig,
                                         MapConfig, SlamConfig)
    from modular_slam_tpu.geometry.camera import camera_from_config, project
    from modular_slam_tpu.geometry.se3 import (Pose, pose_apply_inverse,
                                               quat_from_axis_angle)
    from modular_slam_tpu.map import (add_keyframe, add_landmarks,
                                      add_observations, empty_arena)
    from modular_slam_tpu.parallel import make_halo_sharded_global_ba
    from modular_slam_tpu.parallel.mesh import make_kf_mesh

    cam_cfg = CameraConfig(fx=300.0, fy=300.0, cx=159.5, cy=119.5,
                           width=320, height=240)
    cfg = SlamConfig(camera=cam_cfg,
                     backend=BackendConfig(max_iterations=8))
    cam = camera_from_config(cam_cfg)
    mcfg = MapConfig(max_keyframes=16, max_landmarks=256,
                     max_observations=2048, descriptor_bits=16)
    rng = np.random.default_rng(7)  # identical on both processes
    arena = empty_arena(mcfg)
    gt = []
    for k in range(5):
        q = quat_from_axis_angle(jnp.asarray(
            rng.normal(size=3).astype(np.float32) * 0.01))
        t = jnp.asarray(np.array([0.05 * k, 0, 0], np.float32))
        gt.append(Pose(q=q, t=t))
        noise = (rng.normal(size=3).astype(np.float32) * 0.02
                 if k else np.zeros(3, np.float32))
        arena, _ = add_keyframe(
            arena, Pose(q=q, t=t + jnp.asarray(noise)), jnp.float32(k))
    lm_gt = np.stack([rng.uniform(-0.8, 1.0, 120),
                      rng.uniform(-0.6, 0.6, 120),
                      rng.uniform(1.5, 3.0, 120)], 1).astype(np.float32)
    desc = jnp.asarray(rng.choice([-1, 1], (120, 16)).astype(np.int8))
    arena, slots = add_landmarks(
        arena, jnp.asarray(lm_gt + rng.normal(
            size=lm_gt.shape).astype(np.float32) * 0.02),
        desc, jnp.ones(120, bool))
    for k, p in enumerate(gt):
        pc = np.asarray(pose_apply_inverse(p, jnp.asarray(lm_gt)))
        uv = np.asarray(project(cam, jnp.asarray(pc)))
        vis = ((uv[:, 0] >= 5) & (uv[:, 0] < 315) & (uv[:, 1] >= 5)
               & (uv[:, 1] < 235) & (pc[:, 2] > 0.1))
        arena = add_observations(
            arena, jnp.int32(k), slots, jnp.asarray(uv),
            jnp.asarray(pc[:, 2]), desc, jnp.asarray(vis))

    kf_mesh = make_kf_mesh(kf=8, obs=1)
    rep = _NS(kf_mesh, P())
    arena_g = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            np.asarray(x).shape, rep,
            lambda idx, a=np.asarray(x): a[idx]),
        arena)
    # this dense toy has NO temporal locality (every keyframe observes
    # every landmark), so most observations ride the far channel —
    # size it for the union of out-of-window landmarks
    halo = make_halo_sharded_global_ba(cfg, kf_mesh, halo=1, far_cap=128)
    arena2, stats, diag = halo(arena_g)
    c0, c1 = float(stats.initial_cost), float(stats.final_cost)
    assert np.isfinite(c1) and c1 <= c0 * 0.05, (c0, c1)
    assert int(jax.device_get(diag["n_dropped_obs"])) == 0
    print(f"MH HALO OK rank={info['process_id']} "
          f"cost {c0:.3e}->{c1:.3e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
