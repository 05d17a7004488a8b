from tvts_tpu.parallel.mesh import batch_sharding, create_mesh, replicated_sharding
from tvts_tpu.parallel.partition import (
    param_partition_spec,
    param_shardings,
    shard_batch,
    shard_params,
)
