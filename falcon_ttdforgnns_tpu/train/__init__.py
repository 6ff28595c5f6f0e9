from .optim import make_optimizer, rowwise_adagrad, cache_populate_apply
from .trainer import SageTrainer, TrainConfig
from .full_graph import FullGraphTrainer, FullGraphConfig, log_eps_cross_entropy
