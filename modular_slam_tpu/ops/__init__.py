from modular_slam_tpu.ops.pyramid import build_pyramid, pyramid_shapes  # noqa: F401
from modular_slam_tpu.ops.fast import fast_score, nms3x3  # noqa: F401
from modular_slam_tpu.ops.blur import gaussian_blur  # noqa: F401
from modular_slam_tpu.ops.detector import detect  # noqa: F401
from modular_slam_tpu.ops.match import match_descriptors, hamming_matrix  # noqa: F401
from modular_slam_tpu.ops.pnp import ransac_pnp  # noqa: F401
