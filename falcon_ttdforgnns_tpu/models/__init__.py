from .sage import SAGE, make_embed_layer
from .gcn import GCN
from .gat import GAT
from .rgat import RGAT, RGATLayer
from .gin import MolGNN, GNNNode, GINConv, MolGCNConv, BondEncoder, graph_pool, AttentionPool
