# coding=utf-8
from .mesh import (DATA_AXIS, create_mesh, batch_sharding, replicated,
                   shard_batch, replicate)
from .collectives import all_gather, all_gather_local_grads, psum
