from modular_slam_tpu.io.associate import associate  # noqa: F401
from modular_slam_tpu.io.tum import (  # noqa: F401
    TumRgbdDataset,
    load_rgb,
    load_depth,
    frame_to_device,
)
from modular_slam_tpu.io.trajectory import (  # noqa: F401
    TumTrajectoryWriter,
    KittiTrajectoryWriter,
    read_tum_trajectory,
)
