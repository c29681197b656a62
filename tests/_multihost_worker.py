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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
