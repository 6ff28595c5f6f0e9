from .optim import make_optimizer, rowwise_adagrad, cache_populate_apply
from .trainer import SageTrainer, TrainConfig
