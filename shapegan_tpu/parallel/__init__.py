from shapegan_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    data_sharding,
    points_sharding,
    replicated,
    shard_batch,
    DATA_AXIS,
    POINTS_AXIS,
)
