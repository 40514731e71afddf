from .mesh import (
    batch_sharding,
    make_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    make_parallel_train_step_2d3d,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "make_parallel_train_step",
    "make_parallel_train_step_2d3d",
    "make_parallel_eval_step",
]
