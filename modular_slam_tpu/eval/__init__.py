from modular_slam_tpu.eval.ate import ate_rmse, align_umeyama  # noqa: F401
from modular_slam_tpu.eval.synthetic import PlaneSceneGenerator  # noqa: F401
