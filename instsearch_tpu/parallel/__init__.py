from .mesh import make_mesh, make_mesh_2d, replicate, shard_rows
from .mesh import default_data_mesh, place
from .multihost import (build_multihost_index, global_shard_mesh,
                        initialize, local_row_range, shard_local_rows)
from .sharded_index import (
    ShardedIndex, sharded_qe_topk_fn, sharded_rerank_fn, sharded_topk_fn,
)

__all__ = ["make_mesh", "make_mesh_2d", "replicate", "shard_rows",
           "ShardedIndex", "sharded_topk_fn", "sharded_qe_topk_fn",
           "sharded_rerank_fn", "initialize", "global_shard_mesh",
           "build_multihost_index", "local_row_range", "shard_local_rows",
           "default_data_mesh", "place"]
