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
                    use_pallas: bool = False, interpret: bool = False,
                    int8: bool = False):
    """Build the jitted sharded search: (descriptors, ids, queries[, scales])
    -> (scores [Q,k], global_ids [Q,k]), all-replicated output.

    ``use_pallas`` runs the fused topk_matmul kernel per shard (the
    production TPU path); otherwise the XLA oracle. ``int8`` adds a
    row-scales operand (sharded alongside the rows) and scores via the
    int8 kernel / dequantized oracle. Row padding is contiguous at the
    tail of the index, so each shard's valid-row count is
    ``clip(num_valid - shard * C, 0, C)``.
    """

    def _score_topk(X, ids_s, q, nv, scales_s):
        c = X.shape[0]
        if use_pallas:
            shard_i = jax.lax.axis_index(axis)
            nv_local = jnp.clip(nv[0] - shard_i * c, 0, c)
            if int8:
                from ..kernels import topk_matmul_int8
                return topk_matmul_int8(X, scales_s, q, k=k,
                                        num_valid=nv_local,
                                        interpret=interpret)
            from ..kernels import topk_matmul
            return topk_matmul(X, q, k=k, num_valid=nv_local,
                               interpret=interpret)
        if int8:
            scores = jnp.dot(q.astype(jnp.float32), X.T.astype(jnp.float32),
                             preferred_element_type=jnp.float32) * scales_s
        else:
            scores = jnp.dot(q.astype(X.dtype), X.T,
                             preferred_element_type=jnp.float32)   # [Q, N/S]
        scores = jnp.where(ids_s[None, :] >= 0, scores, -jnp.inf)
        return jax.lax.top_k(scores, k)                            # [Q, k]

    def per_shard(X, ids_s, q, nv, scales_s=None):
        s, pos = _score_topk(X, ids_s, q, nv, scales_s)
        gids = jnp.where(pos >= 0,
                         jnp.take(ids_s, jnp.maximum(pos, 0)), -1)  # [Q, k]
        # ---- ICI boundary: gather S*k candidates per query ----
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)     # [Q, S*k]
        g_all = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
        s2, p2 = jax.lax.top_k(s_all, k)
        return s2, jnp.take_along_axis(g_all, p2, axis=1)

    in_specs = [P(axis, None), P(axis), P(None, None), P(None)]
    if int8:
        in_specs.append(P(None, axis))   # scales [1, N] sharded on rows
    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, None), P(None, None)),
        check_rep=False,
    )
    return jax.jit(mapped)


def sharded_qe_topk_fn(mesh: Mesh, k: int, qe_n: int, alpha: float,
                       axis: str = "shard", use_pallas: bool = False,
                       interpret: bool = False):
    """Distributed search with alpha query expansion (SURVEY.md C12 on the
    sharded path), all inside ONE shard_map program:

      round 1: per-shard top-qe_n + local row gather -> allgather of
               (scores, ids, descriptors) candidates over ICI -> replicated
               merge -> expanded query (arXiv:1711.02512 §5)
      round 2: per-shard top-k with the expanded query -> allgather -> merge

    The only cross-chip traffic is the two candidate allgathers
    (S*qe_n*(D+2) and S*k*2 elements per query).
    """

    def _local_topk(X, ids_s, q, nv, kk):
        c = X.shape[0]
        if use_pallas:
            from ..kernels import topk_matmul
            shard_i = jax.lax.axis_index(axis)
            nv_local = jnp.clip(nv[0] - shard_i * c, 0, c)
            s, pos = topk_matmul(X, q, k=kk, num_valid=nv_local,
                                 interpret=interpret)
        else:
            scores = jnp.dot(q.astype(X.dtype), X.T,
                             preferred_element_type=jnp.float32)
            scores = jnp.where(ids_s[None, :] >= 0, scores, -jnp.inf)
            s, pos = jax.lax.top_k(scores, kk)
        gids = jnp.where(pos >= 0, jnp.take(ids_s, jnp.maximum(pos, 0)), -1)
        return s, pos, gids

    def per_shard(X, ids_s, q, nv):
        # ---- round 1: expansion candidates ----
        s, pos, gids = _local_topk(X, ids_s, q, nv, qe_n)
        rows = jnp.take(X, jnp.maximum(pos, 0), axis=0).astype(jnp.float32)
        rows = jnp.where((pos >= 0)[..., None], rows, 0.0)    # [Q, n, D]
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)     # [Q, S*n]
        r_all = jax.lax.all_gather(rows, axis, axis=1, tiled=True)  # [Q, S*n, D]
        top_s, top_j = jax.lax.top_k(s_all, qe_n)
        top_rows = jnp.take_along_axis(r_all, top_j[..., None], axis=1)
        w = jnp.clip(top_s, 0.0, None) ** alpha
        q_exp = q.astype(jnp.float32) + jnp.einsum("qn,qnd->qd", w, top_rows)
        q_exp = q_exp / jnp.maximum(
            jnp.linalg.norm(q_exp, axis=-1, keepdims=True), 1e-6)
        q_exp = q_exp.astype(q.dtype)
        # ---- round 2: final search with expanded query ----
        s2, _, gids2 = _local_topk(X, ids_s, q_exp, nv, k)
        s2_all = jax.lax.all_gather(s2, axis, axis=1, tiled=True)
        g2_all = jax.lax.all_gather(gids2, axis, axis=1, tiled=True)
        fs, fj = jax.lax.top_k(s2_all, k)
        return fs, jnp.take_along_axis(g2_all, fj, axis=1)

    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None), P(None)),
        out_specs=(P(None, None), P(None, None)),
        check_rep=False,
    )
    return jax.jit(mapped)


def sharded_rerank_fn(mesh: Mesh, k: int, depth: int, fuse_weight: float = 1.0,
                      axis: str = "shard"):
    """Distributed regional re-ranking (SURVEY.md C13 on the sharded path),
    exact vs the single-device stage:

      1. per-shard global-descriptor top-``depth`` -> allgather of
         (score, id) candidates -> replicated global top-``depth`` set
      2. each shard computes the regional-match score for its own top-depth
         candidates, masking out those not in the global set
      3. allgather of fused scores -> replicated top-k merge

    The regional einsum runs in parallel across shards on disjoint
    candidates; ICI carries only (S*depth) scalars per query per gather.
    """

    def per_shard(X, reg_s, ids_s, q, qreg, nv):
        del nv
        scores = jnp.dot(q.astype(X.dtype), X.T,
                         preferred_element_type=jnp.float32)      # [Q, N/S]
        scores = jnp.where(ids_s[None, :] >= 0, scores, -jnp.inf)
        s, pos = jax.lax.top_k(scores, depth)                     # [Q, depth]
        gids = jnp.where(s > -jnp.inf,
                         jnp.take(ids_s, jnp.maximum(pos, 0)), -1)
        # ---- global top-depth membership ----
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)   # [Q, S*d]
        g_all = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
        glob_s, glob_j = jax.lax.top_k(s_all, depth)
        glob_ids = jnp.take_along_axis(g_all, glob_j, axis=1)     # [Q, depth]
        member = jnp.any(gids[:, :, None] == glob_ids[:, None, :], axis=2)
        member &= gids >= 0
        # ---- regional match for local candidates ----
        cand = jnp.take(reg_s, jnp.maximum(pos, 0), axis=0)       # [Q, d, R, D]
        sim = jnp.einsum("qrd,qcsd->qcrs", qreg.astype(jnp.float32),
                         cand.astype(jnp.float32))
        match = jnp.sum(jnp.max(sim, axis=-1), axis=-1) / qreg.shape[1]
        fused = jnp.where(member, match + fuse_weight * s, -jnp.inf)
        # ---- final merge ----
        f_all = jax.lax.all_gather(fused, axis, axis=1, tiled=True)
        fs, fj = jax.lax.top_k(f_all, k)
        return fs, jnp.take_along_axis(g_all, fj, axis=1)

    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis),
                  P(None, None), P(None, None, None), P(None)),
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
                 use_pallas: bool = False, interpret: bool = False,
                 regional: "jax.Array | None" = None,
                 scales: "jax.Array | None" = None):
        self.mesh = mesh or make_mesh()
        n = descriptors.shape[0]
        s = self.mesh.devices.size
        if n % s:
            raise ValueError(f"padded rows {n} not divisible by {s} shards")
        if descriptors.dtype == jnp.int8 and scales is None:
            raise ValueError("int8 descriptors need per-row scales")
        self.num_valid = int((np.asarray(ids) >= 0).sum())
        self.descriptors = shard_rows(self.mesh, descriptors)
        self.ids = shard_rows(self.mesh, ids)
        self.int8 = descriptors.dtype == jnp.int8
        self.scales = (jax.device_put(
            scales, NamedSharding(self.mesh, P(None, "shard")))
            if scales is not None else None)
        self.regional = (shard_rows(self.mesh, regional)
                         if regional is not None else None)
        self._fns: dict[int, callable] = {}
        self.default_k = k
        self.use_pallas = use_pallas
        self.interpret = interpret

    def search(self, queries: jax.Array, k: int | None = None):
        k = k or self.default_k
        if k not in self._fns:
            self._fns[k] = sharded_topk_fn(self.mesh, k,
                                           use_pallas=self.use_pallas,
                                           interpret=self.interpret,
                                           int8=self.int8)
        q = replicate(self.mesh, jnp.asarray(queries))
        nv = replicate(self.mesh, jnp.asarray([self.num_valid], jnp.int32))
        if self.int8:
            return self._fns[k](self.descriptors, self.ids, q, nv, self.scales)
        return self._fns[k](self.descriptors, self.ids, q, nv)

    def search_rerank(self, queries: jax.Array, query_regional: jax.Array,
                      k: int | None = None, depth: int = 100,
                      fuse_weight: float = 1.0):
        """Distributed regional re-ranking over the sharded regional store."""
        assert self.regional is not None, "no regional store attached"
        k = k or self.default_k
        depth = min(depth, self.descriptors.shape[0] // self.mesh.devices.size)
        key = ("rerank", k, depth, fuse_weight)
        if key not in self._fns:
            self._fns[key] = sharded_rerank_fn(self.mesh, k, depth, fuse_weight)
        q = replicate(self.mesh, jnp.asarray(queries))
        qreg = replicate(self.mesh, jnp.asarray(query_regional))
        nv = replicate(self.mesh, jnp.asarray([self.num_valid], jnp.int32))
        return self._fns[key](self.descriptors, self.regional, self.ids,
                              q, qreg, nv)

    def search_qe(self, queries: jax.Array, k: int | None = None,
                  qe_n: int = 10, alpha: float = 3.0):
        """Distributed search with alpha query expansion (one program,
        two ICI allgathers)."""
        k = k or self.default_k
        key = ("qe", k, qe_n, alpha)
        if key not in self._fns:
            self._fns[key] = sharded_qe_topk_fn(
                self.mesh, k, qe_n, alpha,
                use_pallas=self.use_pallas, interpret=self.interpret)
        q = replicate(self.mesh, jnp.asarray(queries))
        nv = replicate(self.mesh, jnp.asarray([self.num_valid], jnp.int32))
        return self._fns[key](self.descriptors, self.ids, q, nv)
