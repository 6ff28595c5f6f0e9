from .mesh import (make_mesh, make_global_mesh, init_multihost,
                   batch_sharding, replicated, node_sharding, shard_batch,
                   replicate)
from .data_parallel import (make_dp_train_step, make_dp_multi_step,
                            scaling_efficiency)
from .node_sharding import (RaggedRingLayout, balanced_row_assignment,
                            partition_edges_by_block, partition_edges_ragged,
                            ring_spmm, ring_spmm_ragged,
                            sharded_layerwise_inference,
                            sharded_layerwise_inference_ragged)
