from .bruteforce import all_scores, search_topk

__all__ = ["all_scores", "search_topk"]
