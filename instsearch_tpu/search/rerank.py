"""Regional re-ranking (SURVEY.md C13; Tolias arXiv:1511.05879 §4).

The top-``depth`` candidates from the global search are re-scored by
matching the query's R-MAC *regional* descriptors against each candidate's
regional descriptors: for every query region take the best-matching
candidate region, sum over query regions, and re-order by the fused score.

TPU-native shape discipline (SURVEY.md §7 Phase 5): ``depth``, the region
count R, and D are all static, so the whole stage is one jitted
gather + batched small matmul + max/sum reduction — no dynamic shapes.
Padded candidates (id < 0) are masked to -inf and can never be promoted.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def region_similarities(regional_store: jax.Array, top_pos: jax.Array,
                        query_regional: jax.Array,
                        regional_scales: "jax.Array | None" = None
                        ) -> jax.Array:
    """Region-pair similarity tensor for candidate rows ``top_pos
    [Q, depth]``: gather [Q, depth, R, D] candidate regions ->
    ``sim [Q, depth, Rq, R]``. An int8 store is NOT dequantized before
    the einsum — the per-(row, region) scale factors out of the
    d-contraction, so it multiplies the sim instead, saving the 4x f32
    materialization of the gather (the system's largest intermediate at
    depth=100). Shared by the match reduction below and the spatial
    voting stage (search/spatial.py)."""
    cand = jnp.take(regional_store, jnp.maximum(top_pos, 0), axis=0)
    sim = jnp.einsum("qrd,qcsd->qcrs", query_regional.astype(jnp.float32),
                     cand.astype(jnp.float32))    # [Q, depth, Rq, R]
    if regional_scales is not None:
        sc = jnp.take(regional_scales, jnp.maximum(top_pos, 0), axis=0)
        sim = sim * sc[:, :, None, :]             # [Q, depth, 1, R]
    return sim


def region_match_scores(regional_store: jax.Array, top_pos: jax.Array,
                        query_regional: jax.Array,
                        regional_scales: "jax.Array | None" = None
                        ) -> jax.Array:
    """Regional match: best-candidate-region per query region, mean over
    query regions -> ``match [Q, depth]``. THE region-match definition
    (arXiv:1511.05879 §4), shared by the full-matrix, kernel-candidate
    and sharded stages."""
    sim = region_similarities(regional_store, top_pos, query_regional,
                              regional_scales)
    match = jnp.sum(jnp.max(sim, axis=-1), axis=-1)      # [Q, depth]
    return match / query_regional.shape[1]


def rerank_from_candidates(regional_store: jax.Array, ids: jax.Array,
                           top_g: jax.Array, top_pos: jax.Array,
                           query_regional: jax.Array,
                           *, k: int = 10, fuse_weight: float = 1.0,
                           regional_scales: "jax.Array | None" = None,
                           spatial_weight: float = 0.0,
                           vote_matrix=None):
    """Re-rank pre-selected candidates: ``top_g/top_pos [Q, depth]`` from
    any top-depth selector (fused Pallas kernel in the production
    composite; lax.top_k in the oracle) -> ``(scores [Q, k], ids [Q, k])``
    by fused score = regional match + ``spatial_weight`` * spatial
    consistency (when a ``vote_matrix`` from search/spatial.py is given)
    + ``fuse_weight`` * global cosine. Invalid candidate slots
    (top_g = -inf) can never be promoted."""
    sim = region_similarities(regional_store, top_pos, query_regional,
                              regional_scales)
    match = jnp.sum(jnp.max(sim, axis=-1), axis=-1) / query_regional.shape[1]
    fused = match + fuse_weight * top_g
    if spatial_weight and vote_matrix is not None:
        from .spatial import spatial_consistency_scores
        fused = fused + spatial_weight * spatial_consistency_scores(
            sim, vote_matrix)
    fused = jnp.where(jnp.isfinite(top_g), fused, -jnp.inf)
    depth = top_g.shape[1]
    # k may exceed depth (e.g. query --k 150 with rerank_depth=100): the
    # output stays [Q, k], the tail past the candidate pool carrying
    # (-inf, -1) like every other stage (same contract as the sharded path)
    kk = min(k, depth)
    new_s, order = jax.lax.top_k(fused, kk)                       # [Q, kk]
    new_pos = jnp.take_along_axis(top_pos, order, axis=1)
    new_ids = jnp.where(new_s > -jnp.inf, jnp.take(ids, new_pos), -1)
    if kk < k:
        pad = ((0, 0), (0, k - kk))
        new_s = jnp.pad(new_s, pad, constant_values=-jnp.inf)
        new_ids = jnp.pad(new_ids, pad, constant_values=-1)
    return new_s, new_ids


@partial(jax.jit, static_argnames=("depth", "k"))
def regional_rerank_scores(regional_store: jax.Array, ids: jax.Array,
                           global_scores: jax.Array,
                           query_regional: jax.Array,
                           *, depth: int = 100, k: int = 10,
                           fuse_weight: float = 1.0,
                           regional_scales: "jax.Array | None" = None):
    """``regional_store [N_pad, R, D]``, ``global_scores [Q, N_pad]``
    (padding already -inf), ``query_regional [Q, Rq, D]`` ->
    ``(scores [Q, k], ids [Q, k])`` re-ordered by fused score.

    Reference oracle over a full [Q, N] score matrix; the production
    composite in Index.search selects candidates with the fused kernel
    and calls rerank_from_candidates directly."""
    top_g, top_pos = jax.lax.top_k(global_scores, depth)          # [Q, depth]
    return rerank_from_candidates(regional_store, ids, top_g, top_pos,
                                  query_regional, k=k,
                                  fuse_weight=fuse_weight,
                                  regional_scales=regional_scales)


