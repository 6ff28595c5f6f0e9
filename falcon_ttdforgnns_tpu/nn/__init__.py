from .layers import SAGEConv, GraphConv, GATConv, Bias, segment_mean
from .tt_embedding import (TTEmbeddingBag, TableBatchedTTEmbeddingBag,
                           DenseEmbedding, AccessCountingEmbedding,
                           FixedFeatureEmbedding)
