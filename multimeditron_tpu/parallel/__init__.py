from multimeditron_tpu.parallel.mesh import make_mesh
from multimeditron_tpu.parallel.sharding import (
    batch_sharding,
    param_sharding_rules,
    shard_params,
)

__all__ = ["make_mesh", "param_sharding_rules", "shard_params", "batch_sharding"]
