from modular_slam_tpu.parallel.mesh import (  # noqa: F401
    make_kf_mesh,
    make_mesh,
    obs_sharded_specs,
)
from modular_slam_tpu.parallel.sharded_ba import make_sharded_global_ba  # noqa: F401
from modular_slam_tpu.parallel.kf_sharded_ba import (  # noqa: F401
    make_kf_sharded_global_ba,
)
from modular_slam_tpu.parallel.halo_ba import (  # noqa: F401
    halo_comms_table,
    make_halo_sharded_global_ba,
)
from modular_slam_tpu.parallel.dp import (  # noqa: F401
    make_batch_slam_scan,
    make_batch_slam_step,
)
