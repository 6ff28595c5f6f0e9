from .mesh import (make_mesh, make_global_mesh, init_multihost,
                   batch_sharding, replicated, node_sharding, shard_batch,
                   replicate)
from .data_parallel import (make_dp_train_step, make_dp_multi_step,
                            scaling_efficiency)
from .node_sharding import (partition_edges_by_block, ring_spmm,
                            sharded_layerwise_inference)
