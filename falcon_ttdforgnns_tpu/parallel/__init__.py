from .mesh import make_mesh, batch_sharding, replicated, node_sharding, shard_batch, replicate
from .data_parallel import make_dp_train_step, scaling_efficiency
