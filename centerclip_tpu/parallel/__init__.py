# coding=utf-8
from .mesh import (DATA_AXIS, MODEL_AXIS, create_mesh, batch_sharding,
                   replicated, shard_batch, replicate, param_shardings,
                   shard_params)
from .collectives import all_gather, all_gather_local_grads, psum
