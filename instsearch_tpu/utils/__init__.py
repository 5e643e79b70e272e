from .checkpoint import load_pytree, save_pytree
from .observe import COUNTERS, Counters, annotate, get_logger, trace

__all__ = ["load_pytree", "save_pytree", "COUNTERS", "Counters", "annotate",
           "get_logger", "trace"]
