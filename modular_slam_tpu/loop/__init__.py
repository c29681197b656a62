from modular_slam_tpu.loop.vocab import make_vocab, bow_histogram  # noqa: F401
from modular_slam_tpu.loop.detector import (  # noqa: F401
    LoopDatabase,
    empty_database,
    add_keyframe_bow,
    query_candidates,
    geometric_verify,
)
from modular_slam_tpu.loop.relocalizer import make_relocalizer  # noqa: F401
