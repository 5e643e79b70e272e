from .bruteforce import all_scores, search_topk
from .qe import alpha_query_expansion
from .rerank import regional_rerank, regional_rerank_scores

__all__ = ["all_scores", "search_topk", "alpha_query_expansion",
           "regional_rerank", "regional_rerank_scores"]
