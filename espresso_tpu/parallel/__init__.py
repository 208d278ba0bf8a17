from espresso_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    partition_params,
    replicated,
)

__all__ = ["make_mesh", "batch_sharding", "partition_params", "replicated"]
