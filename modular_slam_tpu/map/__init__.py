from modular_slam_tpu.map.arena import (  # noqa: F401
    MapArena,
    empty_arena,
    add_keyframe,
    add_landmarks,
    add_observations,
    covis_counts,
    khop_keyframes,
    visible_landmarks,
    apply_backend_update,
)
