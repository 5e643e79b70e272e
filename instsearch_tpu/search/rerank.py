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

    Fused score = regional match + ``fuse_weight`` * global cosine.
    ``regional_scales [N_pad, R]`` dequantizes an int8 regional store
    (4x memory cut — the store is R x the index size, the system's
    largest tensor).
    """
    top_g, top_pos = jax.lax.top_k(global_scores, depth)          # [Q, depth]
    cand = jnp.take(regional_store, top_pos, axis=0)              # [Q, depth, R, D]
    if regional_store.dtype == jnp.int8:
        sc = jnp.take(regional_scales, top_pos, axis=0)           # [Q, depth, R]
        cand = cand.astype(jnp.float32) * sc[..., None]
    # region-match matrix: every query region vs every candidate region
    sim = jnp.einsum("qrd,qcsd->qcrs", query_regional.astype(jnp.float32),
                     cand.astype(jnp.float32))                    # [Q, depth, Rq, R]
    match = jnp.sum(jnp.max(sim, axis=-1), axis=-1)               # [Q, depth]
    # normalize by region count so the fused scale is comparable
    match = match / query_regional.shape[1]
    fused = match + fuse_weight * top_g
    fused = jnp.where(jnp.isfinite(top_g), fused, -jnp.inf)       # keep padding out
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


def regional_rerank(index, queries, global_scores, query_regional=None,
                    depth: int = 100, k: int = 10):
    """Convenience wrapper over an Index with a regional store attached."""
    assert index.regional is not None, "index has no regional store"
    if query_regional is None:
        raise ValueError(
            "regional re-ranking needs query regional descriptors; use "
            "Index.query_images(..) which extracts them, or pass "
            "query_regional explicitly")
    depth = min(depth, index.descriptors.shape[0])
    return regional_rerank_scores(index.regional, index.ids, global_scores,
                                  query_regional, depth=depth, k=k,
                                  regional_scales=getattr(
                                      index, "regional_scales", None))
