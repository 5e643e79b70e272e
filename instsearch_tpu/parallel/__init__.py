from .mesh import make_mesh, make_mesh_2d, replicate, shard_rows
from .sharded_index import ShardedIndex, sharded_topk_fn

__all__ = ["make_mesh", "make_mesh_2d", "replicate", "shard_rows",
           "ShardedIndex", "sharded_topk_fn"]
