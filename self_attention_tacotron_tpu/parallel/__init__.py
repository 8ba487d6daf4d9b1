from .mesh import create_mesh, batch_sharding, replicated_sharding
from .multihost import (assemble_global_batch, initialize_distributed,
                        is_coordinator, local_batch_size, shard_files)
from .train_step import (TrainState, create_train_state, make_train_step,
                         make_eval_step, make_predict_step, make_optimizer)

__all__ = [
    "create_mesh", "batch_sharding", "replicated_sharding",
    "TrainState", "create_train_state", "make_train_step", "make_eval_step",
    "make_predict_step", "make_optimizer",
    "initialize_distributed", "is_coordinator", "shard_files",
    "local_batch_size", "assemble_global_batch",
]
