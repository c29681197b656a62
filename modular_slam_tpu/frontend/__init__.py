from modular_slam_tpu.frontend.tracker import (  # noqa: F401
    TrackState,
    initial_state,
    track_frame,
)
