from .mesh import (data_sharded, make_mesh, replicated, shard_lanes,
                   sharded_train_iteration)
