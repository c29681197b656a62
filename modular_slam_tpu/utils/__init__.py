from modular_slam_tpu.utils.jaxtools import (  # noqa: F401
    setup_compile_cache,
    force_cpu,
)
