from visuelle2_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding
from visuelle2_tpu.parallel.sharding import infer_param_sharding, shard_variables

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding",
    "infer_param_sharding", "shard_variables",
]
