"""Row-sharded distributed search (SURVEY.md N7, §3.2).

The index matrix [N_pad, D] lives row-sharded across the 'shard' mesh axis
(each chip holds N_pad/S rows in its HBM). A query is replicated; each chip
computes scores against its shard and reduces them to a per-shard top-k;
the only cross-chip traffic is one [Q, S*k] candidate all-gather over ICI,
merged redundantly on every chip (k is tiny). This is the TPU-native
replacement for the reference's single-matrix in-RAM scan.

Every stage supports the full storage matrix {f32/bf16,
int8-with-row-scales, packed-int4-with-row-scales} x {XLA oracle, fused
Pallas kernel}; quantized rows are dequantized (int4: unpacked) with their
per-row scales (which shard alongside the rows) before any score or gathered
row leaves a shard.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import make_mesh, place, replicate, shard_rows


def _local_topk(X, ids_s, q, nv, kk, scales_s, *, axis: str,
                use_pallas: bool, interpret: bool, int8: bool,
                int4: bool = False, mask_s=None):
    """Per-shard scoring + top-kk, shared by all three distributed stages.

    Returns ``(scores [Q,kk], pos [Q,kk], gids [Q,kk])`` where invalid
    slots (padding rows / empty top-k) carry score=-inf and gid=-1. Row
    padding is contiguous at the index tail, so this shard's valid-row
    count is ``clip(num_valid - shard * C, 0, C)``.

    ``kk`` may exceed the shard's local row count C (small index, many
    shards, e.g. qe_n=10 over 8-row shards): the local top-k is then
    clamped to C and the output padded back to kk columns with (-inf, -1),
    keeping every caller's gather width at S*kk.

    ``int4`` marks X as packed nibble pairs [C, D//2] (always with row
    scales — callers also set int8 so the scales operand binds).
    ``mask_s`` ([1, C] int8, this shard's slice of a subset filter —
    search/subset.py) restricts selection exactly like on one device.
    """
    c = X.shape[0]
    kk_req, kk = kk, min(kk, c)
    if use_pallas:
        shard_i = jax.lax.axis_index(axis)
        nv_local = jnp.clip(nv[0] - shard_i * c, 0, c)
        if int4:
            from ..kernels import topk_matmul_int4
            s, pos = topk_matmul_int4(X, scales_s, q, k=kk,
                                      num_valid=nv_local, interpret=interpret,
                                      mask=mask_s)
        elif int8:
            from ..kernels import topk_matmul_int8
            s, pos = topk_matmul_int8(X, scales_s, q, k=kk,
                                      num_valid=nv_local, interpret=interpret,
                                      mask=mask_s)
        else:
            from ..kernels import topk_matmul
            s, pos = topk_matmul(X, q, k=kk, num_valid=nv_local,
                                 interpret=interpret, mask=mask_s)
    else:
        if int4:
            from ..ops.quantize import unpack_int4
            xf = unpack_int4(X).astype(jnp.float32)
            scores = jnp.dot(q.astype(jnp.float32), xf.T,
                             preferred_element_type=jnp.float32) * scales_s
        elif int8:
            scores = jnp.dot(q.astype(jnp.float32), X.T.astype(jnp.float32),
                             preferred_element_type=jnp.float32) * scales_s
        else:
            scores = jnp.dot(q.astype(X.dtype), X.T,
                             preferred_element_type=jnp.float32)   # [Q, N/S]
        ok = ids_s[None, :] >= 0
        if mask_s is not None:
            ok = ok & (mask_s[0][None, :] > 0)
        scores = jnp.where(ok, scores, -jnp.inf)
        s, pos = jax.lax.top_k(scores, kk)
    valid = (pos >= 0) & (s > -jnp.inf)
    gids = jnp.where(valid, jnp.take(ids_s, jnp.maximum(pos, 0)), -1)
    if kk < kk_req:
        padw = ((0, 0), (0, kk_req - kk))
        s = jnp.pad(s, padw, constant_values=-jnp.inf)
        pos = jnp.pad(pos, padw, constant_values=-1)
        gids = jnp.pad(gids, padw, constant_values=-1)
    return s, pos, gids


def _gather_rows_f32(X, pos, scales_s, *, int8: bool, int4: bool = False):
    """Dequantized f32 rows at ``pos`` [Q, n] (zeros for invalid slots);
    packed-int4 rows are unpacked after the (half-width) gather."""
    rows = jnp.take(X, jnp.maximum(pos, 0), axis=0)
    if int4:
        from ..ops.quantize import unpack_int4
        rows = unpack_int4(rows)
    rows = rows.astype(jnp.float32)
    if int8 or int4:
        rsc = jnp.take(scales_s[0], jnp.maximum(pos, 0))          # [Q, n]
        rows = rows * rsc[..., None]
    return jnp.where((pos >= 0)[..., None], rows, 0.0)            # [Q, n, D]


def _local_expand(X, ids_s, q, nv, qe_n, alpha, scales_s, kw,
                  include_query: bool = True, mask_s=None):
    """Round-1 alpha-QE expansion inside a shard_map body: per-shard
    top-qe_n + dequantized row gather -> two allgathers -> replicated
    expanded queries [Q, D] f32 unit-norm (arXiv:1711.02512 §5). ONE
    implementation shared by sharded_qe_topk_fn and sharded_expand_fn so
    the weighting/normalization cannot drift between them.

    ``include_query=False`` is the database-side (αDBA) weighting — the
    query IS a stored row and appears in its own top-n at weight 1, so
    the separate ``+ q`` term would double-count it (search/dba.py)."""
    axis = kw["axis"]
    s, pos, _ = _local_topk(X, ids_s, q, nv, qe_n, scales_s, mask_s=mask_s,
                            **kw)
    rows = _gather_rows_f32(X, pos, scales_s, int8=kw["int8"],
                            int4=kw.get("int4", False))         # [Q, n, D]
    s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)     # [Q, S*n]
    r_all = jax.lax.all_gather(rows, axis, axis=1, tiled=True)  # [Q, S*n, D]
    top_s, top_j = jax.lax.top_k(s_all, qe_n)
    top_rows = jnp.take_along_axis(r_all, top_j[..., None], axis=1)
    from ..search.qe import expand_from_candidates
    return expand_from_candidates(q, top_s, top_rows, alpha,
                                  include_query=include_query)


def sharded_topk_fn(mesh: Mesh, k: int, axis: str = "shard",
                    use_pallas: bool = False, interpret: bool = False,
                    int8: bool = False, int4: bool = False,
                    masked: bool = False):
    """Build the jitted sharded search: (descriptors, ids, queries, nv
    [, scales][, mask]) -> (scores [Q,k], global_ids [Q,k]), all-replicated
    output.

    ``use_pallas`` runs the fused topk_matmul kernel per shard (the
    production TPU path); otherwise the XLA oracle. ``int8`` adds a
    row-scales operand (sharded alongside the rows); ``masked`` a [1, N]
    int8 subset-filter operand sharded the same way (search/subset.py).
    """

    def per_shard(X, ids_s, q, nv, *extras):
        it = iter(extras)
        scales_s = next(it) if int8 else None
        mask_s = next(it) if masked else None
        s, pos, gids = _local_topk(X, ids_s, q, nv, k, scales_s, axis=axis,
                                   use_pallas=use_pallas, interpret=interpret,
                                   int8=int8, int4=int4, mask_s=mask_s)
        # ---- ICI boundary: gather S*k candidates per query ----
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)     # [Q, S*k]
        g_all = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
        s2, p2 = jax.lax.top_k(s_all, k)
        return s2, jnp.take_along_axis(g_all, p2, axis=1)

    in_specs = [P(axis, None), P(axis), P(None, None), P(None)]
    if int8:
        in_specs.append(P(None, axis))   # scales [1, N] sharded on rows
    if masked:
        in_specs.append(P(None, axis))   # subset mask, row-aligned
    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_range_count_fn(mesh: Mesh, chunk: int, axis: str = "shard",
                           int8: bool = False, int4: bool = False,
                           masked: bool = False,
                           per_query_thr: bool = False):
    """Build the jitted sharded threshold-count pass of range search
    (Index.search_range's counting half on the mesh): (descriptors, ids,
    queries, thr[, scales][, mask]) -> counts [Q] int32, replicated.

    Per shard: the single-device ``_range_count_jit`` body (index.py)
    over this shard's rows — a chunked fori_loop, never a [Q, C]
    resident matrix — then ONE psum over the shard axis merges the
    partial counts (the only cross-chip traffic: Q int32 per query
    batch). ``thr`` is a scalar (ip metric) or [Q] per-query thresholds
    (the l2 radius form — Index converts); ``per_query_thr`` picks the
    compiled variant. Row padding carries id -1 per shard slice, so no
    num_valid clamp is needed here."""
    from ..index import _slice_rows_f32    # the one dequant-slice def

    def per_shard(X, ids_s, q, thr, *extras):
        it = iter(extras)
        scales_s = next(it) if int8 else None
        mask_s = next(it) if masked else None
        steps = X.shape[0] // chunk
        thr_b = thr[:, None] if per_query_thr else thr
        qf = q.astype(jnp.float32)

        def body(i, acc):
            rows = _slice_rows_f32(X, scales_s, i * chunk, chunk,
                                   int4=int4)                 # [chunk, D]
            s = jax.lax.dot_general(
                qf, rows, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # [Q, chunk]
            ids_c = jax.lax.dynamic_slice(ids_s, (i * chunk,), (chunk,))
            ok = ids_c[None, :] >= 0
            if mask_s is not None:
                mk = jax.lax.dynamic_slice(mask_s[0], (i * chunk,),
                                           (chunk,))
                ok = ok & (mk[None, :] > 0)
            return acc + jnp.sum(((s >= thr_b) & ok).astype(jnp.int32),
                                 axis=1)

        local = jax.lax.fori_loop(
            0, steps, body, jnp.zeros((q.shape[0],), jnp.int32))
        return jax.lax.psum(local, axis)

    in_specs = [P(axis, None), P(axis), P(None, None),
                P(None) if per_query_thr else P()]
    if int8:
        in_specs.append(P(None, axis))
    if masked:
        in_specs.append(P(None, axis))
    mapped = shard_map(per_shard, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=P(None), check_vma=False)
    return jax.jit(mapped)


def sharded_qe_topk_fn(mesh: Mesh, k: int, qe_n: int, alpha: float,
                       axis: str = "shard", use_pallas: bool = False,
                       interpret: bool = False, int8: bool = False,
                       int4: bool = False, masked: bool = False):
    """Distributed search with alpha query expansion (SURVEY.md C12 on the
    sharded path), all inside ONE shard_map program:

      round 1: per-shard top-qe_n + local row gather (int8 rows dequantized
               with their resident scales) -> allgather of (scores, rows)
               candidates over ICI -> replicated merge -> expanded query
               (arXiv:1711.02512 §5)
      round 2: per-shard top-k with the expanded query -> allgather -> merge

    The only cross-chip traffic is the two candidate allgathers
    (S*qe_n*(D+2) and S*k*2 elements per query).
    """

    def per_shard(X, ids_s, q, nv, *extras):
        it = iter(extras)
        scales_s = next(it) if int8 else None
        mask_s = next(it) if masked else None
        kw = dict(axis=axis, use_pallas=use_pallas, interpret=interpret,
                  int8=int8, int4=int4)
        # ---- round 1: expansion candidates (shared _local_expand) ----
        q_exp = _local_expand(X, ids_s, q, nv, qe_n, alpha, scales_s, kw,
                              mask_s=mask_s).astype(q.dtype)
        # ---- round 2: final search with expanded query ----
        s2, _, gids2 = _local_topk(X, ids_s, q_exp, nv, k, scales_s,
                                   mask_s=mask_s, **kw)
        s2_all = jax.lax.all_gather(s2, axis, axis=1, tiled=True)
        g2_all = jax.lax.all_gather(gids2, axis, axis=1, tiled=True)
        fs, fj = jax.lax.top_k(s2_all, k)
        return fs, jnp.take_along_axis(g2_all, fj, axis=1)

    in_specs = [P(axis, None), P(axis), P(None, None), P(None)]
    if int8:
        in_specs.append(P(None, axis))
    if masked:
        in_specs.append(P(None, axis))
    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_scores_fn(mesh: Mesh, axis: str = "shard", int8: bool = False,
                      int4: bool = False):
    """Full [Q, N] score matrix, replicated via one row-axis allgather —
    what protocol evaluation needs (AP consumes the complete ranking,
    SURVEY.md §3.3). Padding rows come back -inf. The per-shard matmul is
    identical to the single-device scorer element-for-element, so the
    gathered matrix equals the single-device one exactly."""

    def per_shard(X, ids_s, q, scales_s=None):
        if int4:
            from ..ops.quantize import unpack_int4
            xf = unpack_int4(X).astype(jnp.float32)
            scores = jnp.dot(q.astype(jnp.float32), xf.T,
                             preferred_element_type=jnp.float32) * scales_s
        elif int8:
            scores = jnp.dot(q.astype(jnp.float32), X.T.astype(jnp.float32),
                             preferred_element_type=jnp.float32) * scales_s
        else:
            scores = jnp.dot(q.astype(X.dtype), X.T,
                             preferred_element_type=jnp.float32)
        scores = jnp.where(ids_s[None, :] >= 0, scores, -jnp.inf)
        return jax.lax.all_gather(scores, axis, axis=1, tiled=True)  # [Q, N]

    in_specs = [P(axis, None), P(axis), P(None, None)]
    if int8:
        in_specs.append(P(None, axis))
    mapped = shard_map(per_shard, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=P(None, None), check_vma=False)
    return jax.jit(mapped)


def sharded_expand_fn(mesh: Mesh, qe_n: int, alpha: float,
                      axis: str = "shard", use_pallas: bool = False,
                      interpret: bool = False, int8: bool = False,
                      int4: bool = False, include_query: bool = True,
                      masked: bool = False):
    """Alpha-QE expansion only (round 1 of sharded_qe_topk_fn): returns the
    expanded queries [Q, D] f32 replicated, for callers that need the
    expanded query itself (protocol evaluation ranks the FULL index with
    it rather than taking a top-k). ``include_query=False`` gives the
    αDBA database-side weighting (see _local_expand)."""

    def per_shard(X, ids_s, q, nv, *extras):
        it = iter(extras)
        scales_s = next(it) if int8 else None
        mask_s = next(it) if masked else None
        kw = dict(axis=axis, use_pallas=use_pallas, interpret=interpret,
                  int8=int8, int4=int4)
        return _local_expand(X, ids_s, q, nv, qe_n, alpha, scales_s, kw,
                             include_query=include_query, mask_s=mask_s)

    in_specs = [P(axis, None), P(axis), P(None, None), P(None)]
    if int8:
        in_specs.append(P(None, axis))
    if masked:
        in_specs.append(P(None, axis))
    mapped = shard_map(per_shard, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=P(None, None), check_vma=False)
    return jax.jit(mapped)


def sharded_rerank_fn(mesh: Mesh, k: int, depth: int, fuse_weight: float = 1.0,
                      axis: str = "shard", use_pallas: bool = False,
                      interpret: bool = False, int8: bool = False,
                      regional_int8: bool = False, int4: bool = False,
                      spatial_weight: float = 0.0, vote_matrix=None,
                      masked: bool = False):
    """Distributed regional re-ranking (SURVEY.md C13 on the sharded path),
    exact vs the single-device stage:

      1. per-shard global-descriptor top-``depth`` (Pallas kernel / oracle,
         int8 dequant) -> allgather of (score, id) candidates -> replicated
         global top-``depth`` set
      2. each shard computes the regional-match score for its own top-depth
         candidates (int8 regional store dequantized with its resident
         per-(row, region) scales), masking out those not in the global set
      3. allgather of fused scores -> replicated top-k merge

    The regional einsum runs in parallel across shards on disjoint
    candidates; ICI carries only (S*depth) scalars per query per gather.
    """

    def per_shard(X, reg_s, ids_s, q, qreg, nv, *extras):
        # optional operands bind positionally in the same order their
        # in_specs are appended below: row scales (int8 descriptors) first,
        # then per-(row, region) scales (int8 regional store) — each present
        # only when its flag is set, so {f32 rows + int8 regional} binds
        # the regional scales correctly instead of into scales_s
        it = iter(extras)
        scales_s = next(it) if int8 else None
        reg_scales_s = next(it) if regional_int8 else None
        mask_s = next(it) if masked else None
        # per-shard candidates: min(depth, local rows) is always enough to
        # cover the global top-depth set (a shard can contribute at most
        # all of its rows)
        local_k = min(depth, X.shape[0])
        s, pos, gids = _local_topk(X, ids_s, q, nv, local_k, scales_s,
                                   axis=axis, use_pallas=use_pallas,
                                   interpret=interpret, int8=int8,
                                   int4=int4, mask_s=mask_s)
        # ---- global top-depth membership ----
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)   # [Q, S*lk]
        g_all = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
        glob_s, glob_j = jax.lax.top_k(s_all, depth)
        glob_ids = jnp.take_along_axis(g_all, glob_j, axis=1)     # [Q, depth]
        member = jnp.any(gids[:, :, None] == glob_ids[:, None, :], axis=2)
        member &= gids >= 0
        # ---- regional match for local candidates (shared definition;
        # int8 scales fold into the sim, not the gather) ----
        from ..search.rerank import region_similarities
        sim = region_similarities(
            reg_s, pos, qreg,
            reg_scales_s if regional_int8 else None)
        match = jnp.sum(jnp.max(sim, axis=-1), axis=-1) / qreg.shape[1]
        if spatial_weight and vote_matrix is not None:
            # vote matrix is a tiny trace-time constant — baked into the
            # program, identical on every shard (search/spatial.py)
            from ..search.spatial import spatial_consistency_scores
            match = match + spatial_weight * spatial_consistency_scores(
                sim, jnp.asarray(vote_matrix))
        fused = jnp.where(member, match + fuse_weight * s, -jnp.inf)
        # ---- final merge: always [Q, k] out (the caller's k, not a
        # depth-clamped one); candidates past the top-depth membership or
        # past the candidate pool carry (-inf, -1) like every other stage
        f_all = jax.lax.all_gather(fused, axis, axis=1, tiled=True)
        if k > f_all.shape[1]:
            padw = k - f_all.shape[1]
            f_all = jnp.pad(f_all, ((0, 0), (0, padw)),
                            constant_values=-jnp.inf)
            g_all = jnp.pad(g_all, ((0, 0), (0, padw)), constant_values=-1)
        fs, fj = jax.lax.top_k(f_all, k)
        fi = jnp.take_along_axis(g_all, fj, axis=1)
        return fs, jnp.where(fs > -jnp.inf, fi, -1)

    in_specs = [P(axis, None), P(axis, None, None), P(axis),
                P(None, None), P(None, None, None), P(None)]
    if int8:
        in_specs.append(P(None, axis))
    if regional_int8:
        in_specs.append(P(axis, None))   # [N, R] per-(row, region) scales
    if masked:
        in_specs.append(P(None, axis))   # subset mask, row-aligned
    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_lw_fn(mesh: Mesh, k: int, depth: int, axis: str = "shard",
                  use_pallas: bool = False, interpret: bool = False,
                  int8: bool = False, int4: bool = False,
                  masked: bool = False):
    """Distributed local-whitening re-ranking (search/lw_rerank.py on the
    sharded path), exact vs the single-device composite:

      1. per-shard global top-``depth`` -> allgather of (score, id)
         candidates -> replicated global top-depth membership (same
         pattern as sharded_rerank_fn)
      2. every shard whitens the query by ALL clusters (the bank is
         replicated — redundant compute, zero traffic; the bank read
         happens from each chip's own HBM copy) and re-scores ITS
         resident candidates from the row-sharded whitened store +
         assignments, masking non-members
      3. allgather of re-scores -> replicated top-k merge

    ICI carries only (S*local_k) scalars per query per gather — the
    whitened store, like the regional store, is never gathered.
    """

    def per_shard(X, store_s, assign_s, ids_s, q, p_bank, mu, nv,
                  *extras):
        it = iter(extras)
        scales_s = next(it) if int8 else None
        mask_s = next(it) if masked else None
        local_k = min(depth, X.shape[0])
        s, pos, gids = _local_topk(X, ids_s, q, nv, local_k, scales_s,
                                   axis=axis, use_pallas=use_pallas,
                                   interpret=interpret, int8=int8, int4=int4,
                                   mask_s=mask_s)
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        g_all = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
        dd = min(depth, s_all.shape[1])
        _, glob_j = jax.lax.top_k(s_all, dd)
        glob_ids = jnp.take_along_axis(g_all, glob_j, axis=1)
        member = jnp.any(gids[:, :, None] == glob_ids[:, None, :], axis=2)
        member &= gids >= 0
        from ..search.lw_rerank import whiten_all_clusters
        # int4 packing may have added a zero pad column to q; the bank
        # whitens the unpadded width (same slice as _lw_composite_jit)
        q_all = whiten_all_clusters(q[:, :mu.shape[-1]], p_bank, mu)
        safe = jnp.maximum(pos, 0)
        xw = jnp.take(store_s, safe, axis=0).astype(jnp.float32)
        ac = jnp.take(assign_s, safe)
        qw = jnp.take_along_axis(q_all, ac[:, :, None], axis=1)
        fused = jnp.where(member, jnp.sum(qw * xw, axis=-1), -jnp.inf)
        f_all = jax.lax.all_gather(fused, axis, axis=1, tiled=True)
        if k > f_all.shape[1]:
            padw = k - f_all.shape[1]
            f_all = jnp.pad(f_all, ((0, 0), (0, padw)),
                            constant_values=-jnp.inf)
            g_all = jnp.pad(g_all, ((0, 0), (0, padw)), constant_values=-1)
        fs, fj = jax.lax.top_k(f_all, k)
        fi = jnp.take_along_axis(g_all, fj, axis=1)
        return fs, jnp.where(fs > -jnp.inf, fi, -1)

    in_specs = [P(axis, None), P(axis, None), P(axis), P(axis),
                P(None, None), P(None, None, None), P(None, None), P(None)]
    if int8:
        in_specs.append(P(None, axis))
    if masked:
        in_specs.append(P(None, axis))
    mapped = shard_map(per_shard, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=(P(None, None), P(None, None)),
                       check_vma=False)
    return jax.jit(mapped)


def sharded_diffusion_fn(mesh: Mesh, k: int, depth: int, knn: int = 10,
                         alpha: float = 0.99, iters: int = 20,
                         seeds: int = 10, axis: str = "shard",
                         use_pallas: bool = False, interpret: bool = False,
                         int8: bool = False, int4: bool = False,
                         masked: bool = False):
    """Distributed diffusion re-ranking (search/diffusion.py on the
    sharded path), exact vs the single-device stage:

      1. per-shard global top-``depth`` + dequantized candidate-row gather
      2. allgather of (score, id, row) candidates over ICI — the one
         heavy collective, S*depth*(D+2) elements per query
      3. replicated merge to the global top-depth set, then the shared
         ``diffuse_from_candidates`` graph/solve on every shard
         (redundant compute, zero extra traffic — the [depth, depth]
         solve is tiny next to the scan)
    """

    def per_shard(X, ids_s, q, nv, *extras):
        it = iter(extras)
        scales_s = next(it) if int8 else None
        mask_s = next(it) if masked else None
        local_k = min(depth, X.shape[0])
        s, pos, gids = _local_topk(X, ids_s, q, nv, local_k, scales_s,
                                   axis=axis, use_pallas=use_pallas,
                                   interpret=interpret, int8=int8, int4=int4,
                                   mask_s=mask_s)
        rows = _gather_rows_f32(X, pos, scales_s, int8=int8,
                                int4=int4)                    # [Q, lk, D]
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        g_all = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
        r_all = jax.lax.all_gather(rows, axis, axis=1, tiled=True)
        dd = min(depth, s_all.shape[1])
        top_g, j = jax.lax.top_k(s_all, dd)                   # [Q, depth]
        top_ids = jnp.take_along_axis(g_all, j, axis=1)
        cand = jnp.take_along_axis(r_all, j[..., None], axis=1)
        from ..search.diffusion import diffuse_from_candidates
        f = diffuse_from_candidates(cand, top_g, knn=knn, alpha=alpha,
                                    iters=iters, seeds=seeds)
        kk = min(k, dd)
        fs, fj = jax.lax.top_k(f, kk)
        fi = jnp.take_along_axis(top_ids, fj, axis=1)
        fi = jnp.where(fs > -jnp.inf, fi, -1)
        if kk < k:
            padw = ((0, 0), (0, k - kk))
            fs = jnp.pad(fs, padw, constant_values=-jnp.inf)
            fi = jnp.pad(fi, padw, constant_values=-1)
        return fs, fi

    in_specs = [P(axis, None), P(axis), P(None, None), P(None)]
    if int8:
        in_specs.append(P(None, axis))
    if masked:
        in_specs.append(P(None, axis))
    mapped = shard_map(per_shard, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=(P(None, None), P(None, None)),
                       check_vma=False)
    return jax.jit(mapped)


def sharded_ivfpq_fn(mesh: Mesh, k: int, depth: int, nprobe: int,
                     axis: str = "shard", int8: bool = False,
                     int4: bool = False, do_qe: bool = False,
                     qe_n: int = 10, qe_alpha: float = 3.0,
                     has_rotation: bool = False, masked: bool = False):
    """Distributed IVF-PQ cascade (search/ivfpq.py on the sharded path) —
    the multi-chip capacity tier: S chips hold S× the 32 B/row code store
    (e.g. 8 × v5e = ~512M rows of codes), exact vs the single-device
    ``_ivfpq_composite_jit``.

    Sharding layout — CAPACITY axis, not cluster axis: every chip holds a
    ``[C, M/S, m/2]`` slice of EVERY bucket (plus 1/S of the spill rows),
    so the replicated probe selection needs no dynamic bucket→chip
    routing (which would be data-dependent shapes — not SPMD) and the
    scanned slot set is exactly the single-device one:

      1. replicated centroid matmul → top-``nprobe`` cluster ids
         (identical on every chip; centroids + codebook replicate — KBs)
      2. local residual ADC over this chip's slice of the probed buckets
         (+ its spill slice) → local top-min(depth, local slots) — the
         shared ``_adc_select`` body, unchanged
      3. allgather of (ADC score, row position) → replicated top-depth
      4. exact re-score from the ROW-sharded main store: each chip scores
         the candidates whose rows it owns (positions are global; a row
         lives on exactly one chip) and one psum reassembles [Q, depth]
      5. ``do_qe`` mirrors the composite's αQE: the top-qe_n candidate
         rows come back through one [Q, qe_n, D] psum and the cascade
         reruns with the expanded query

    ICI per query: two [S·dd] allgathers + two [depth] psums (+ one
    [qe_n·D] row psum under QE) — the code store and the main store are
    never gathered.
    """
    from ..search.ivfpq import NEG_INF, _adc_select

    def per_shard(cents, codes_s, bpos_s, sc_s, sp_s, scl_s, pqc,
                  X, ids_s, q, *extras):
        it = iter(extras)
        scales_s = next(it) if int8 else None
        rot = next(it) if has_rotation else None   # OPQ residual [D, D]
        # subset mask REPLICATES here (unlike the exact stages): capacity-
        # axis bucket slots point at global row positions owned by any
        # chip, so a row-sharded slice cannot cover a chip's candidates.
        # N bytes per chip — 64 MB at 64M rows, the accepted trade for
        # filtering at ADC selection instead of post-filtering the depth.
        mask_rep = next(it) if masked else None
        c = X.shape[0]
        lo = jax.lax.axis_index(axis) * c

        def cascade(qq):
            adc_s, pos = _adc_select(cents, codes_s, bpos_s, sc_s, sp_s,
                                     scl_s, pqc, qq, rot, mask_rep,
                                     depth=depth, nprobe=nprobe)
            s_all = jax.lax.all_gather(adc_s, axis, axis=1, tiled=True)
            p_all = jax.lax.all_gather(pos, axis, axis=1, tiled=True)
            dd = min(depth, s_all.shape[1])
            g_s, g_j = jax.lax.top_k(s_all, dd)
            g_pos = jnp.where(g_s > NEG_INF,
                              jnp.take_along_axis(p_all, g_j, axis=1), -1)
            # exact re-score: local rows for owned candidates, zeros
            # elsewhere; the psum reassembles the full scores
            loc = g_pos - lo
            inr = (g_pos >= 0) & (loc >= 0) & (loc < c)
            rows = _gather_rows_f32(X, jnp.where(inr, loc, -1), scales_s,
                                    int8=int8, int4=int4)    # [Q, dd, D]
            exact_l = jnp.einsum("bkd,bd->bk", rows, qq)
            exact = jax.lax.psum(jnp.where(inr, exact_l, 0.0), axis)
            exact = jnp.where(g_pos >= 0, exact, NEG_INF)
            exact, order = jax.lax.top_k(exact, dd)
            g_pos = jnp.take_along_axis(g_pos, order, axis=1)
            g_pos = jnp.where(exact > NEG_INF, g_pos, -1)
            rows = jnp.take_along_axis(rows, order[..., None], axis=1)
            return exact, g_pos, rows

        qf = q.astype(jnp.float32)
        if do_qe:
            s, _, rows_l = cascade(qf)
            rows_n = jax.lax.psum(rows_l[:, :qe_n], axis)    # [Q, n, D]
            from ..search.qe import expand_from_candidates
            qf = expand_from_candidates(qf, s[:, :qe_n], rows_n, qe_alpha)
        exact, g_pos, _ = cascade(qf)
        # global ids for the winners: same one-owner psum
        loc = g_pos - lo
        inr = (g_pos >= 0) & (loc >= 0) & (loc < c)
        ids_l = jnp.where(inr, jnp.take(ids_s, jnp.maximum(loc, 0)), 0)
        out_ids = jnp.where(g_pos >= 0, jax.lax.psum(ids_l, axis), -1)
        kk = min(k, exact.shape[1])
        fs, fi = exact[:, :kk], out_ids[:, :kk]
        if kk < k:
            padw = ((0, 0), (0, k - kk))
            fs = jnp.pad(fs, padw, constant_values=-jnp.inf)
            fi = jnp.pad(fi, padw, constant_values=-1)
        return fs, fi

    in_specs = [P(None, None),          # centroids (replicated)
                P(None, axis, None),    # codes: capacity-axis slices
                P(None, axis),          # bucket positions
                P(axis, None),          # spill codes
                P(axis),                # spill positions
                P(axis),                # spill cluster ids
                P(None, None, None),    # PQ codebook (replicated)
                P(axis, None),          # descriptors (row-sharded)
                P(axis),                # ids
                P(None, None)]          # queries (replicated)
    if int8:
        in_specs.append(P(None, axis))  # [1, N] row scales
    if has_rotation:
        in_specs.append(P(None, None))  # OPQ rotation (replicated)
    if masked:
        in_specs.append(P(None, None))  # subset mask (REPLICATED — see
        #                                 per_shard; positions are global)
    mapped = shard_map(per_shard, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=(P(None, None), P(None, None)),
                       check_vma=False)
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
                 scales: "jax.Array | None" = None,
                 regional_scales: "jax.Array | None" = None,
                 query_chunk: int = 128, int4: bool = False,
                 lw_store: "jax.Array | None" = None,
                 lw_assign: "jax.Array | None" = None,
                 lw_params=None, regional_geom=None, l2: bool = False):
        self.mesh = mesh or make_mesh()
        # on a 2-D (data x shard) mesh, rows shard over the 'shard' axis
        # and every stage replicates over the others
        self.axis = ("shard" if "shard" in self.mesh.axis_names
                     else self.mesh.axis_names[0])
        n = descriptors.shape[0]
        s = self.mesh.shape[self.axis]
        if n % s:
            raise ValueError(f"padded rows {n} not divisible by {s} shards")
        if descriptors.dtype == jnp.int8 and scales is None:
            raise ValueError("int8/int4 descriptors need per-row scales")
        if regional is not None and regional.dtype == jnp.int8 \
                and regional_scales is None:
            raise ValueError("int8 regional store needs per-region scales")
        ids_np = np.asarray(ids)
        self.num_valid = int((ids_np >= 0).sum())
        self._ids_np = ids_np                  # host copy for full rankings
        self.descriptors = shard_rows(self.mesh, descriptors, self.axis)
        self.ids = shard_rows(self.mesh, ids, self.axis)
        # packed int4 stores as int8 dtype: self.int8 stays True for it
        # (it gates the scales-operand binding), self.int4 refines the
        # scoring/gather math inside every stage
        self.int8 = descriptors.dtype == jnp.int8
        self.int4 = int4
        self.scales = (place(self.mesh, scales, P(None, self.axis))
                       if scales is not None else None)
        self.regional = (shard_rows(self.mesh, regional, self.axis)
                         if regional is not None else None)
        self.regional_int8 = (regional is not None
                              and regional.dtype == jnp.int8)
        self.regional_scales = (
            shard_rows(self.mesh, regional_scales, self.axis)
            if regional_scales is not None else None)
        # local-whitening view (search/lw_rerank.py): row-aligned whitened
        # store + assignments shard with the rows; the bank replicates
        if (lw_store is None) != (lw_assign is None) or \
                (lw_store is not None and lw_params is None):
            raise ValueError("local whitening needs lw_store + lw_assign "
                             "+ lw_params together")
        self.lw_store = (shard_rows(self.mesh, lw_store, self.axis)
                         if lw_store is not None else None)
        self.lw_assign = (shard_rows(self.mesh, lw_assign, self.axis)
                          if lw_assign is not None else None)
        self.lw_params = (None if lw_params is None else type(lw_params)(
            centroids=replicate(self.mesh, lw_params.centroids),
            P=replicate(self.mesh, lw_params.P),
            mu=replicate(self.mesh, lw_params.mu)))
        self.regional_geom = regional_geom   # [R, 3] grid geometry for
        #                                      spatial verification
        self.l2 = l2                         # l2-metric store (norm col)
        self.ivfpq = None                    # attach_ivfpq namespace
        self._fns: dict[int, callable] = {}
        self.default_k = k
        self.use_pallas = use_pallas
        self.interpret = interpret
        self.query_chunk = query_chunk

    def _match_query_dim(self, q: jax.Array) -> jax.Array:
        """Odd-dim int4 stores carry one zero pad column (nibble pairs);
        match the query width — a zero column never changes a dot.
        l2-metric stores (Index.is_l2) carry the ||x||^2/2 norm column —
        user-width queries gain the -1 column, so the sharded scan ranks
        by -L2 exactly (returned scores stay in AUGMENTED-IP space: a
        per-query monotone transform of -L2^2; Index-level callers
        convert)."""
        q = jnp.asarray(q)
        if self.int4 and q.shape[-1] == 2 * self.descriptors.shape[1] - 1:
            q = jnp.pad(q, ((0, 0), (0, 1)))
        elif self.l2 and q.shape[-1] == self.descriptors.shape[1] - 1:
            q = jnp.concatenate(
                [jnp.asarray(q, jnp.float32),
                 jnp.full((q.shape[0], 1), -1.0, jnp.float32)], axis=-1)
        return q

    def _common_operands(self, queries):
        q = replicate(self.mesh, self._match_query_dim(queries))
        nv = replicate(self.mesh, jnp.asarray([self.num_valid], jnp.int32))
        return q, nv

    def _run_chunked(self, run, *per_query):
        """Fixed query_chunk-size pieces (utils.chunking: one shared policy
        with Index._topk)."""
        from ..utils.chunking import run_chunked
        return run_chunked(run, self.query_chunk, *per_query)

    def place_subset(self, subset):
        """Place a subset filter's [1, N_pad] mask onto the mesh,
        row-aligned with the sharded store (the same P(None, 'shard')
        placement as the int8 row scales) — reusable across queries, so
        serving places each registered collection once. Accepts a
        SubsetFilter (Index.make_subset) or a raw [1, N_pad] int8 array.
        The IVF-PQ stage re-places it replicated internally
        (sharded_ivfpq_fn: capacity-axis slots carry global positions)."""
        if subset is None:
            return None
        mask = getattr(subset, "mask", subset)
        if mask.shape != (1, self.descriptors.shape[0]):
            raise ValueError(
                f"subset mask shape {tuple(mask.shape)} != "
                f"[1, {self.descriptors.shape[0]}] — the filter was built "
                f"against a different store (rebuild with make_subset)")
        return place(self.mesh, jnp.asarray(mask, jnp.int8),
                     P(None, self.axis))

    def search(self, queries: jax.Array, k: int | None = None, mask=None):
        k = k or self.default_k
        key = (k, mask is not None)
        if key not in self._fns:
            self._fns[key] = sharded_topk_fn(self.mesh, k, axis=self.axis,
                                             use_pallas=self.use_pallas,
                                             interpret=self.interpret,
                                             int8=self.int8, int4=self.int4,
                                             masked=mask is not None)

        def run(qq):
            q, nv = self._common_operands(qq)
            operands = [self.descriptors, self.ids, q, nv]
            if self.int8:
                operands.append(self.scales)
            if mask is not None:
                operands.append(mask)
            return self._fns[key](*operands)

        return self._run_chunked(run, queries)

    def search_range(self, queries, thr, max_results: int = 1024,
                     mask=None):
        """Distributed range search: top-``max_results`` rows scoring
        >= ``thr`` (the sharded merge of :meth:`search`, thresholded)
        plus EXACT per-query counts from a per-shard streamed threshold
        pass merged by one psum (``sharded_range_count_fn``) ->
        ``(scores [Q, m], ids [Q, m], counts [Q])``, all replicated.
        ``thr``: scalar, or [Q] per-query thresholds (the l2-metric
        radius form — ``Index.search_range`` converts both ways; scores
        here stay in scan space)."""
        q = self._match_query_dim(jnp.asarray(queries))
        m = max(1, min(max_results, self.num_valid))
        s, i = self.search(q, k=m, mask=mask)
        thr_a = jnp.asarray(thr, jnp.float32)
        keep = s >= (thr_a[:, None] if thr_a.ndim else thr_a)
        s = jnp.where(keep, s, -jnp.inf)
        i = jnp.where(keep, i, -1)
        c = self.descriptors.shape[0] // self.mesh.shape[self.axis]
        chunk = next(x for x in (65_536, 32_768, 16_384, 8_192, 4_096,
                                 2_048, 1_024, 512, 256, 128, 64, 32, 16,
                                 8, 4, 2, 1) if c % x == 0)
        key = ("range", chunk, int(thr_a.ndim), mask is not None)
        if key not in self._fns:
            self._fns[key] = sharded_range_count_fn(
                self.mesh, chunk, axis=self.axis, int8=self.int8,
                int4=self.int4, masked=mask is not None,
                per_query_thr=bool(thr_a.ndim))
        operands = [self.descriptors, self.ids, q, thr_a]
        if self.int8:
            operands.append(self.scales)
        if mask is not None:
            operands.append(mask)
        counts = self._fns[key](*operands)
        return s, i, counts

    def search_rerank(self, queries: jax.Array, query_regional: jax.Array,
                      k: int | None = None, depth: int = 100,
                      fuse_weight: float = 1.0, spatial_weight: float = 0.0,
                      mask=None):
        """Distributed regional re-ranking over the sharded regional store.
        ``spatial_weight`` > 0 fuses the Hough-vote spatial-consistency
        score (search/spatial.py); needs ``regional_geom`` at
        construction."""
        assert self.regional is not None, "no regional store attached"
        if spatial_weight and self.regional_geom is None:
            raise ValueError("spatial_weight needs regional_geom "
                             "(pass it to ShardedIndex or use to_sharded)")
        k = k or self.default_k
        depth = min(depth, self.descriptors.shape[0])
        key = ("rerank", k, depth, fuse_weight, spatial_weight,
               mask is not None)
        if key not in self._fns:
            vote = None
            if spatial_weight:
                from ..search.spatial import build_vote_matrix
                vote = build_vote_matrix(self.regional_geom,
                                         self.regional_geom)
            self._fns[key] = sharded_rerank_fn(
                self.mesh, k, depth, fuse_weight, axis=self.axis,
                use_pallas=self.use_pallas, interpret=self.interpret,
                int8=self.int8, regional_int8=self.regional_int8,
                int4=self.int4, spatial_weight=spatial_weight,
                vote_matrix=vote, masked=mask is not None)
        def run(qq, qqreg):
            q, nv = self._common_operands(qq)
            qreg = replicate(self.mesh, qqreg)
            operands = [self.descriptors, self.regional, self.ids, q, qreg,
                        nv]
            if self.int8:
                operands.append(self.scales)
            if self.regional_int8:
                operands.append(self.regional_scales)
            if mask is not None:
                operands.append(mask)
            return self._fns[key](*operands)

        return self._run_chunked(run, queries, query_regional)

    def attach_ivfpq(self, view, nprobe: int | None = None,
                     depth: int | None = None) -> None:
        """Place a :class:`search.ivfpq.IVFPQView`'s arrays onto the mesh
        for :meth:`search_ivfpq`: codes/bucket positions shard on the
        CAPACITY axis (every chip holds M/S slots of every bucket, padded
        with -1 slots to divide — masked exactly like single-device
        padding), spill rows shard evenly, centroids/codebook replicate.
        ``to_sharded()`` calls this automatically when the Index carries
        the view."""
        from types import SimpleNamespace

        s = self.mesh.shape[self.axis]
        codes = np.asarray(view.codes)
        bpos = np.asarray(view.bucket_pos)
        pad = (-codes.shape[1]) % s
        if pad:
            codes = np.pad(codes, ((0, 0), (0, pad), (0, 0)))
            bpos = np.pad(bpos, ((0, 0), (0, pad)), constant_values=-1)
        sc = np.asarray(view.spill_codes)
        sp = np.asarray(view.spill_pos)
        scl = np.asarray(view.spill_cluster)
        spad = (-sc.shape[0]) % s
        if spad:
            sc = np.pad(sc, ((0, spad), (0, 0)))
            sp = np.pad(sp, (0, spad), constant_values=-1)
            scl = np.pad(scl, (0, spad), constant_values=-1)
        self.ivfpq = SimpleNamespace(
            centroids=replicate(self.mesh, jnp.asarray(view.centroids)),
            codes=place(self.mesh, jnp.asarray(codes),
                        P(None, self.axis, None)),
            bucket_pos=place(self.mesh, jnp.asarray(bpos),
                             P(None, self.axis)),
            spill_codes=place(self.mesh, jnp.asarray(sc),
                              P(self.axis, None)),
            spill_pos=place(self.mesh, jnp.asarray(sp), P(self.axis)),
            spill_cluster=place(self.mesh, jnp.asarray(scl),
                                P(self.axis)),
            pq_centroids=replicate(
                self.mesh, jnp.asarray(view.codebook.centroids)),
            rotation=(replicate(self.mesh, jnp.asarray(view.rotation))
                      if view.rotation is not None else None),
            nprobe=nprobe or view.nprobe,
            depth=depth or view.depth)

    def search_ivfpq(self, queries: jax.Array, k: int | None = None,
                     nprobe: int | None = None, depth: int | None = None,
                     qe_n: int = 0, qe_alpha: float = 3.0, mask=None):
        """Distributed IVF-PQ cascade over the capacity-sharded code
        store (equals Index.search with ivfpq_nprobe armed; ``qe_n > 0``
        mirrors the composite's αQE — expansion candidates come from the
        cascade, exactly like the single-device program)."""
        assert self.ivfpq is not None, \
            "no IVF-PQ view attached (attach_ivfpq / to_sharded)"
        v = self.ivfpq
        k = k or self.default_k
        nprobe = min(nprobe or v.nprobe, v.centroids.shape[0])
        depth = min(depth or v.depth, self.descriptors.shape[0])
        key = ("ivfpq", k, depth, nprobe, qe_n, qe_alpha, mask is not None)
        if key not in self._fns:
            self._fns[key] = sharded_ivfpq_fn(
                self.mesh, k, depth, nprobe, axis=self.axis,
                int8=self.int8, int4=self.int4, do_qe=qe_n > 0,
                qe_n=qe_n, qe_alpha=qe_alpha,
                has_rotation=v.rotation is not None,
                masked=mask is not None)
        # the cascade needs the mask against GLOBAL positions on every
        # chip (capacity-axis bucket slots; sharded_ivfpq_fn docstring)
        mask_rep = replicate(self.mesh, mask) if mask is not None else None

        def run(qq):
            q, _ = self._common_operands(qq)
            operands = [v.centroids, v.codes, v.bucket_pos, v.spill_codes,
                        v.spill_pos, v.spill_cluster, v.pq_centroids,
                        self.descriptors, self.ids, q]
            if self.int8:
                operands.append(self.scales)
            if v.rotation is not None:
                operands.append(v.rotation)
            if mask_rep is not None:
                operands.append(mask_rep)
            return self._fns[key](*operands)

        return self._run_chunked(run, queries)

    def search_lw(self, queries: jax.Array, k: int | None = None,
                  depth: int = 100, mask=None):
        """Distributed local-whitening re-ranking over the row-sharded
        whitened store (equals Index.search with lw_enabled)."""
        assert self.lw_store is not None, "no local-whitening view attached"
        k = k or self.default_k
        depth = min(depth, self.descriptors.shape[0])
        key = ("lw", k, depth, mask is not None)
        if key not in self._fns:
            self._fns[key] = sharded_lw_fn(
                self.mesh, k, depth, axis=self.axis,
                use_pallas=self.use_pallas, interpret=self.interpret,
                int8=self.int8, int4=self.int4, masked=mask is not None)

        def run(qq):
            q, nv = self._common_operands(qq)
            operands = [self.descriptors, self.lw_store, self.lw_assign,
                        self.ids, q, self.lw_params.P, self.lw_params.mu,
                        nv]
            if self.int8:
                operands.append(self.scales)
            if mask is not None:
                operands.append(mask)
            return self._fns[key](*operands)

        return self._run_chunked(run, queries)

    def search_diffusion(self, queries: jax.Array, k: int | None = None,
                         depth: int = 200, knn: int = 10,
                         alpha: float = 0.99, iters: int = 20,
                         seeds: int = 10, mask=None):
        """Distributed diffusion re-ranking (one program, three ICI
        allgathers; equals Index.search with diffusion_enabled)."""
        k = k or self.default_k
        depth = min(depth, self.descriptors.shape[0])
        key = ("diffusion", k, depth, knn, alpha, iters, seeds,
               mask is not None)
        if key not in self._fns:
            self._fns[key] = sharded_diffusion_fn(
                self.mesh, k, depth, knn, alpha, iters, seeds,
                axis=self.axis, use_pallas=self.use_pallas,
                interpret=self.interpret, int8=self.int8, int4=self.int4,
                masked=mask is not None)

        def run(qq):
            q, nv = self._common_operands(qq)
            operands = [self.descriptors, self.ids, q, nv]
            if self.int8:
                operands.append(self.scales)
            if mask is not None:
                operands.append(mask)
            return self._fns[key](*operands)

        return self._run_chunked(run, queries)

    def search_qe(self, queries: jax.Array, k: int | None = None,
                  qe_n: int = 10, alpha: float = 3.0, mask=None):
        """Distributed search with alpha query expansion (one program,
        two ICI allgathers)."""
        k = k or self.default_k
        key = ("qe", k, qe_n, alpha, mask is not None)
        if key not in self._fns:
            self._fns[key] = sharded_qe_topk_fn(
                self.mesh, k, qe_n, alpha, axis=self.axis,
                use_pallas=self.use_pallas, interpret=self.interpret,
                int8=self.int8, int4=self.int4, masked=mask is not None)
        def run(qq):
            q, nv = self._common_operands(qq)
            operands = [self.descriptors, self.ids, q, nv]
            if self.int8:
                operands.append(self.scales)
            if mask is not None:
                operands.append(mask)
            return self._fns[key](*operands)

        return self._run_chunked(run, queries)

    def expand_queries(self, queries: jax.Array, qe_n: int = 10,
                       alpha: float = 3.0,
                       include_query: bool = True, mask=None) -> jax.Array:
        """Distributed alpha-QE expansion -> expanded queries [Q, D] f32
        (equals search/qe.alpha_query_expansion on the gathered matrix).
        ``include_query=False`` = αDBA database-side weighting (the
        offline augmentation path, Index.augment_database(mesh=...)).
        ``mask`` restricts the expansion neighbors to a row subset —
        filtered serving must expand within the collection it serves."""
        key = ("expand", qe_n, alpha, include_query, mask is not None)
        if key not in self._fns:
            self._fns[key] = sharded_expand_fn(
                self.mesh, qe_n, alpha, axis=self.axis,
                use_pallas=self.use_pallas, interpret=self.interpret,
                int8=self.int8, int4=self.int4,
                include_query=include_query, masked=mask is not None)
        def run(qq):
            q, nv = self._common_operands(qq)
            operands = [self.descriptors, self.ids, q, nv]
            if self.int8:
                operands.append(self.scales)
            if mask is not None:
                operands.append(mask)
            return self._fns[key](*operands)

        return self._run_chunked(run, queries)

    def all_scores(self, queries: jax.Array) -> jax.Array:
        """Replicated full [Q, N_pad] score matrix (padding -inf)."""
        if "scores" not in self._fns:
            self._fns["scores"] = sharded_scores_fn(
                self.mesh, axis=self.axis, int8=self.int8, int4=self.int4)

        def run(qq):
            q = replicate(self.mesh, self._match_query_dim(qq))
            if self.int8:
                return self._fns["scores"](self.descriptors, self.ids, q,
                                           self.scales)
            return self._fns["scores"](self.descriptors, self.ids, q)

        return self._run_chunked(run, queries)

    def full_ranking(self, queries) -> np.ndarray:
        """[Q, num_valid] original dataset ids best-first, computed through
        the distributed scorer — the sharded analog of Index.full_ranking
        for protocol evaluation (SURVEY.md §3.3). Padding (-inf) sorts
        last and is cut."""
        scores = self.all_scores(queries)
        order = np.asarray(jnp.argsort(-scores, axis=1))
        return np.take(self._ids_np, order)[:, :self.num_valid]
