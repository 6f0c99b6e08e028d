from nnal_tpu.parallel.mesh import make_mesh, default_mesh_shape
from nnal_tpu.parallel.sharding import (
    param_partition_specs,
    shard_params,
    make_sharded_train_step,
    sharded_pool_topk,
)
