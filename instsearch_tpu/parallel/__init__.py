from .mesh import make_mesh, make_mesh_2d, make_mesh_dp_tp, replicate, shard_rows
from .mesh import default_data_mesh, place
from .multihost import (build_multihost_index, global_shard_mesh,
                        initialize, local_row_range, shard_local_rows)
from .sharded_index import (
    ShardedIndex, sharded_ivfpq_fn, sharded_lw_fn, sharded_qe_topk_fn,
    sharded_rerank_fn, sharded_topk_fn,
)
from .ep import expert_whiten_fn, place_ep
from .pp import pipelined_vit_fn, place_pp, stack_layer_params
from .sp import place_sp, sequence_parallel_vit_fn
from .tp import place_tp, tp_param_spec, tp_param_specs

__all__ = ["make_mesh", "make_mesh_2d", "make_mesh_dp_tp", "replicate",
           "shard_rows", "ShardedIndex", "sharded_topk_fn",
           "sharded_qe_topk_fn", "sharded_rerank_fn", "initialize",
           "global_shard_mesh", "build_multihost_index", "local_row_range",
           "shard_local_rows", "default_data_mesh", "place", "place_tp",
           "tp_param_spec", "tp_param_specs", "pipelined_vit_fn",
           "place_pp", "stack_layer_params", "place_sp",
           "sequence_parallel_vit_fn", "place_ep", "expert_whiten_fn",
           "sharded_lw_fn", "sharded_ivfpq_fn"]
