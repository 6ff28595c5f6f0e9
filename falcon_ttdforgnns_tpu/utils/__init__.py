from .logger import get_logger
from .evaluator import get_evaluator, accuracy, f1_score
from .host_cache import LRUCache, TensorCache
