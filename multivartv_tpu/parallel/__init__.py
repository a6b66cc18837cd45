from multivartv_tpu.parallel.sharding import (
    make_device_mesh,
    lattice_sharding,
    batch_sharding,
    shard_problem,
    shard_state,
)
