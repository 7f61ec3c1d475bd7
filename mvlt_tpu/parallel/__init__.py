from mvlt_tpu.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from mvlt_tpu.parallel.sharding import (
    batch_sharding, param_shardings, shard_batch, state_shardings,
)

__all__ = [
    "make_mesh", "DATA_AXIS", "MODEL_AXIS",
    "batch_sharding", "param_shardings", "shard_batch", "state_shardings",
]
