from .mesh import make_mesh, replicate, shard_rays, sharded_train_step
from .multihost import (
    fetch_replicated, is_multiprocess, is_primary, maybe_initialize,
    put_global,
)
