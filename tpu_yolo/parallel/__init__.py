from tpu_yolo.parallel.mesh import (
    DataParallel,
    batch_sharding,
    make_mesh,
    replicated_sharding,
)

__all__ = ["DataParallel", "make_mesh", "batch_sharding", "replicated_sharding"]
