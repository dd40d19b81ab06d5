from .mesh import make_mesh, replicate, shard_rays, sharded_train_step
