from tpu_yolo.parallel.mesh import (
    DataParallel,
    batch_sharding,
    make_mesh,
    make_spatial_mesh,
    replicated_sharding,
    spatial_batch_sharding,
)

__all__ = ["DataParallel", "make_mesh", "make_spatial_mesh",
           "batch_sharding", "replicated_sharding",
           "spatial_batch_sharding"]
