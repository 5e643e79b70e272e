"""Row-sharded distributed search (SURVEY.md N7, §3.2).

The index matrix [N_pad, D] lives row-sharded across the 'shard' mesh axis
(each chip holds N_pad/S rows in its HBM). A query is replicated; each chip
computes scores against its shard and reduces them to a per-shard top-k;
the only cross-chip traffic is one [Q, S*k] candidate all-gather over ICI,
merged redundantly on every chip (k is tiny). This is the TPU-native
replacement for the reference's single-matrix in-RAM scan.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .mesh import make_mesh, replicate, shard_rows


def sharded_topk_fn(mesh: Mesh, k: int, axis: str = "shard",
                    use_pallas: bool = False, interpret: bool = False):
    """Build the jitted sharded search: (descriptors, ids, queries) ->
    (scores [Q,k], global_ids [Q,k]), all-replicated output.

    ``use_pallas`` runs the fused topk_matmul kernel per shard (the
    production TPU path); otherwise the XLA oracle. Row padding is
    contiguous at the tail of the index, so each shard's valid-row count is
    ``clip(num_valid - shard * C, 0, C)``.
    """

    def per_shard(X, ids_s, q, nv):
        # X: [N/S, D] local shard; ids_s: [N/S]; q: [Q, D] replicated
        c = X.shape[0]
        if use_pallas:
            from ..kernels import topk_matmul
            shard_i = jax.lax.axis_index(axis)
            nv_local = jnp.clip(nv[0] - shard_i * c, 0, c)
            s, pos = topk_matmul(X, q, k=k, num_valid=nv_local,
                                 interpret=interpret)
        else:
            scores = jnp.dot(q.astype(X.dtype), X.T,
                             preferred_element_type=jnp.float32)   # [Q, N/S]
            scores = jnp.where(ids_s[None, :] >= 0, scores, -jnp.inf)
            s, pos = jax.lax.top_k(scores, k)                       # [Q, k]
        gids = jnp.where(pos >= 0,
                         jnp.take(ids_s, jnp.maximum(pos, 0)), -1)  # [Q, k]
        # ---- ICI boundary: gather S*k candidates per query ----
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)     # [Q, S*k]
        g_all = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
        s2, p2 = jax.lax.top_k(s_all, k)
        return s2, jnp.take_along_axis(g_all, p2, axis=1)

    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None), P(None)),
        out_specs=(P(None, None), P(None, None)),
        check_rep=False,
    )
    return jax.jit(mapped)


class ShardedIndex:
    """Thin distribution layer over Index storage.

    ``descriptors``/``ids`` are device_put with NamedSharding(P('shard'))
    — on a 1-device mesh this is exactly the single-chip layout, same code
    path (SURVEY.md §7 Phase 4).
    """

    def __init__(self, descriptors: jax.Array, ids: jax.Array,
                 mesh: Mesh | None = None, k: int = 10,
                 use_pallas: bool = False, interpret: bool = False):
        self.mesh = mesh or make_mesh()
        n = descriptors.shape[0]
        s = self.mesh.devices.size
        if n % s:
            raise ValueError(f"padded rows {n} not divisible by {s} shards")
        self.num_valid = int((np.asarray(ids) >= 0).sum())
        self.descriptors = shard_rows(self.mesh, descriptors)
        self.ids = shard_rows(self.mesh, ids)
        self._fns: dict[int, callable] = {}
        self.default_k = k
        self.use_pallas = use_pallas
        self.interpret = interpret

    def search(self, queries: jax.Array, k: int | None = None):
        k = k or self.default_k
        if k not in self._fns:
            self._fns[k] = sharded_topk_fn(self.mesh, k,
                                           use_pallas=self.use_pallas,
                                           interpret=self.interpret)
        q = replicate(self.mesh, jnp.asarray(queries))
        nv = replicate(self.mesh, jnp.asarray([self.num_valid], jnp.int32))
        return self._fns[k](self.descriptors, self.ids, q, nv)
