from . import distributed
from .mesh import (data_sharded, data_size, make_mesh, put_data_sharded,
                   put_params_model_sharded, put_replicated, replicated, to_host,
                   shard_axis, shard_lanes, sharded_train_iteration)
