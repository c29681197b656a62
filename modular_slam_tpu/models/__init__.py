from modular_slam_tpu.models.pipelines import (  # noqa: F401
    odometry_pipeline,
    slam_pipeline,
    full_slam_pipeline,
    make_pipeline,
    PIPELINES,
)
from modular_slam_tpu.models.builder import SlamBuilder  # noqa: F401
