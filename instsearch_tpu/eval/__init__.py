from .datasets import (
    RetrievalDataset, load_classic, load_dataset, load_revisited,
    make_mini_dataset,
)
from .revisited import compute_ap, evaluate_ranks, evaluate_scores, precision_at

__all__ = [
    "RetrievalDataset", "load_classic", "load_dataset", "load_revisited",
    "make_mini_dataset", "compute_ap", "evaluate_ranks", "evaluate_scores",
    "precision_at",
]
