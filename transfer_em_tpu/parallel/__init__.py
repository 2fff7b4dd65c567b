from .distributed import initialize, process_info
from .dp import host_local_batch, make_dp_train_step, shard_batch, shard_state
from .halo import halo_predict, halo_predict_fn
from .mesh import (DATA_AXIS, SPACE_AXIS, batch_sharding, make_mesh,
                   replicated, space_sharding)

__all__ = [
    "initialize", "process_info",
    "host_local_batch", "make_dp_train_step", "shard_batch", "shard_state",
    "halo_predict", "halo_predict_fn",
    "DATA_AXIS", "SPACE_AXIS", "batch_sharding", "make_mesh", "replicated",
    "space_sharding",
]
