from transferable3d_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, data_parallel_mesh, replicate, shard_batch)
