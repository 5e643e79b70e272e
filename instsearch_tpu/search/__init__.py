from .bruteforce import all_scores, search_topk
from .dba import dba_augment
from .diffusion import (diffuse_from_candidates,
                        diffusion_rerank_from_candidates,
                        diffusion_rerank_scores)
from .ivf import IVFIndex
from .lw_rerank import (LocalWhiteningView, lw_rescore_from_candidates,
                        whiten_all_clusters)
from .qe import alpha_query_expansion, expand_from_candidates
from .rerank import (regional_rerank_scores, rerank_from_candidates,
                     region_match_scores)
from .subset import SubsetFilter, build_position_mask

__all__ = ["all_scores", "search_topk", "alpha_query_expansion",
           "expand_from_candidates", "regional_rerank_scores",
           "rerank_from_candidates", "region_match_scores", "IVFIndex",
           "dba_augment", "diffuse_from_candidates",
           "LocalWhiteningView", "lw_rescore_from_candidates",
           "whiten_all_clusters",
           "diffusion_rerank_from_candidates", "diffusion_rerank_scores",
           "SubsetFilter", "build_position_mask"]
