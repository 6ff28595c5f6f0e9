from .sage import SAGE, make_embed_layer
from .gcn import GCN
from .gat import GAT
