from modular_slam_tpu.loop.vocab import (  # noqa: F401
    bow_histogram,
    load_trained_vocab,
    make_vocab,
    train_vocab,
)
from modular_slam_tpu.loop.detector import (  # noqa: F401
    LoopDatabase,
    empty_database,
    add_keyframe_bow,
    query_candidates,
    geometric_verify,
)
from modular_slam_tpu.loop.relocalizer import make_relocalizer  # noqa: F401
