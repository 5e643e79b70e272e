from .mesh import make_mesh, make_mesh_2d, replicate, shard_rows
from .multihost import global_shard_mesh, initialize
from .sharded_index import (
    ShardedIndex, sharded_qe_topk_fn, sharded_rerank_fn, sharded_topk_fn,
)

__all__ = ["make_mesh", "make_mesh_2d", "replicate", "shard_rows",
           "ShardedIndex", "sharded_topk_fn", "sharded_qe_topk_fn",
           "sharded_rerank_fn", "initialize", "global_shard_mesh"]
