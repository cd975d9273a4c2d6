from action_segmentation_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    build_sharded_train_step,
    build_sharded_decode_step,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "build_sharded_train_step",
    "build_sharded_decode_step",
]
