"""The Index: HBM-resident descriptor matrix + query/evaluate API.

Replaces the reference's notebook workflow (SURVEY.md C16) with
``Index.build() / index.query() / index.evaluate()`` (SURVEY.md §1.2).

Storage layout is TPU-first: rows padded to a multiple of
``num_shards * row_tile`` so the same code path serves the single-chip case
and the shard_map'd multi-chip case (parallel/sharded_index.py); padding
rows carry id -1 and are masked to -inf at query time so they can never
enter a top-k.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import ExtractConfig, IndexConfig, PipelineConfig, SearchConfig
from .extractor import Extractor
from .ops.whitening import WhiteningParams, fit_whitening
from .utils.chunking import fetch
_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
           "int8": jnp.int8}


def _pad_rows(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def _raw_scores(descriptors, queries, scales, *, int4: bool = False):
    """[Q, N] f32 scores (delegates to search.bruteforce.masked_scores —
    one scoring definition for float, int8 and packed-int4 storage)."""
    from .search.bruteforce import masked_scores
    return masked_scores(descriptors, queries, scales=scales, int4=int4)


def _gather_rows_f32(descriptors, pos, scales, *, int4: bool = False):
    """Gather stored rows at padded positions ``pos [...,]`` -> f32,
    dequantized (int8) / unpacked+dequantized (int4). THE one
    row-materialization definition for every composite stage (QE neighbor
    gather, diffusion candidates, DBA aggregation) so the storage-format
    semantics cannot drift between them. ``pos`` must already be clamped
    non-negative (callers use ``jnp.maximum(pos, 0)``)."""
    rows = jnp.take(descriptors, pos, axis=0)
    if int4:
        from .ops.quantize import unpack_int4
        return (unpack_int4(rows).astype(jnp.float32)
                * jnp.take(scales[0], pos)[..., None])
    rows = rows.astype(jnp.float32)
    if descriptors.dtype == jnp.int8:
        rows = rows * jnp.take(scales[0], pos)[..., None]
    return rows


def _slice_rows_f32(descriptors, scales, start, chunk: int,
                    *, int4: bool = False):
    """Contiguous stored rows [start, start+chunk) -> f32 [chunk, D],
    dequantized (int8) / unpacked+dequantized (int4) — the dynamic-slice
    sibling of _gather_rows_f32, sharing the same storage semantics
    (used by the DBA chunk program and Index._rows_f32_chunk)."""
    rows = jax.lax.dynamic_slice(
        descriptors, (start, 0), (chunk, descriptors.shape[1]))
    if int4:
        from .ops.quantize import unpack_int4
        rows = unpack_int4(rows)
    rows = rows.astype(jnp.float32)
    if scales is not None and (int4 or descriptors.dtype == jnp.int8):
        sc = jax.lax.dynamic_slice(scales, (0, start), (1, chunk))
        rows = rows * sc.reshape(-1, 1)
    return rows


def _topk_raw(descriptors, ids, queries, num_valid, scales,
              *, k: int, use_pallas: bool, int4: bool = False, mask=None):
    """Top-k candidate selection: ``(scores [Q,k], pos [Q,k])`` where pos
    indexes the padded row store (invalid slots score -inf; their pos is
    safe to gather with via max(pos, 0)). Fused Pallas kernel on TPU, XLA
    oracle elsewhere — trace-time body shared by every jitted search
    program so the two backends cannot drift. ``int4`` marks descriptors
    as packed nibble pairs [N, D//2] (ops/quantize.quantize_rows_int4);
    they cannot be told apart from int8 by dtype. ``mask`` ([1, N] int8,
    search/subset.py) restricts selection to a row subset — the kernels
    fold it into their padding predicate, the oracle into the id mask."""
    queries = jnp.asarray(queries)
    if use_pallas:
        # the kernel carries its running top-k in VMEM against each row
        # tile, so k must fit one tile; a tiny index (or huge k) where it
        # can't takes the oracle — [Q, N] is small exactly then
        from .kernels.topk_matmul import default_tile_n, default_tile_n_int4
        try:
            if int4:
                tile = default_tile_n_int4(descriptors.shape[0],
                                           descriptors.shape[1],
                                           b=queries.shape[0], k=k)
            else:
                tile = default_tile_n(descriptors.shape[0],
                                      descriptors.shape[1],
                                      descriptors.dtype, b=queries.shape[0],
                                      k=k, masked=mask is not None)
        except ValueError:
            tile = 0
        if k > tile:
            use_pallas = False
    if use_pallas and int4:
        from .kernels import topk_matmul_int4
        scores, pos = topk_matmul_int4(descriptors, scales, queries, k=k,
                                       num_valid=num_valid, mask=mask)
    elif use_pallas and descriptors.dtype == jnp.int8:
        from .kernels import topk_matmul_int8
        scores, pos = topk_matmul_int8(descriptors, scales, queries, k=k,
                                       num_valid=num_valid, mask=mask)
    elif use_pallas:
        from .kernels import topk_matmul
        scores, pos = topk_matmul(descriptors, queries, k=k,
                                  num_valid=num_valid, mask=mask)
    else:
        raw = _raw_scores(descriptors, queries, scales, int4=int4)
        ok = ids[None, :] >= 0
        if mask is not None:
            ok = ok & (mask[0][None, :] > 0)
        raw = jnp.where(ok, raw, -jnp.inf)
        scores, pos = jax.lax.top_k(raw, k)
    return scores, pos


def _pos_to_ids(ids, scores, pos):
    valid = (pos >= 0) & (scores > -jnp.inf)
    return jnp.where(valid, jnp.take(ids, jnp.maximum(pos, 0)), -1)


@partial(jax.jit, static_argnames=("k", "use_pallas", "int4"))
def _topk_jit(descriptors, ids, queries, num_valid, scales, mask=None,
              *, k: int, use_pallas: bool, int4: bool = False):
    scores, pos = _topk_raw(descriptors, ids, queries, num_valid, scales,
                            k=k, use_pallas=use_pallas, int4=int4, mask=mask)
    return scores, _pos_to_ids(ids, scores, pos)


@partial(jax.jit, static_argnames=("k", "depth", "qe_n", "qe_alpha",
                                   "use_pallas", "do_qe", "do_rerank",
                                   "do_diffusion", "diff_knn", "diff_alpha",
                                   "diff_iters", "diff_seeds", "int4",
                                   "do_refine", "fuse_weight",
                                   "spatial_weight"))
def _search_composite_jit(descriptors, ids, queries, num_valid, scales,
                          regional, regional_scales, query_regional,
                          vote_matrix=None, mask=None,
                          *, k: int, depth: int, qe_n: int, qe_alpha: float,
                          use_pallas: bool, do_qe: bool, do_rerank: bool,
                          do_diffusion: bool = False, diff_knn: int = 10,
                          diff_alpha: float = 0.99, diff_iters: int = 20,
                          diff_seeds: int = 10, int4: bool = False,
                          do_refine: bool = False,
                          fuse_weight: float = 1.0,
                          spatial_weight: float = 0.0):
    """ONE jitted program for the quality composite (SURVEY.md §3.2):
    optional alpha-QE (fused top-n + row gather), optional regional
    re-ranking (fused top-``depth`` candidate selection), final top-k.

    Never materializes a [Q, N] score matrix — candidate selection runs
    through the same fused kernel as plain search, so peak memory is
    O(Q * depth * R * D), not O(Q * N) (512 MB per 128-query chunk at 1M
    rows; review r2). The sharded path (parallel/sharded_index.py) has
    always worked this way; this is its single-device mirror.
    """
    q = jnp.asarray(queries, jnp.float32)
    if do_qe:
        s, pos = _topk_raw(descriptors, ids, q, num_valid, scales,
                           k=qe_n, use_pallas=use_pallas, int4=int4,
                           mask=mask)
        rows = _gather_rows_f32(descriptors, jnp.maximum(pos, 0), scales,
                                int4=int4)                    # [Q, n, D]
        rows = jnp.where((s > -jnp.inf)[..., None], rows, 0.0)
        from .search.qe import expand_from_candidates
        q = expand_from_candidates(q, s, rows, qe_alpha)
    if do_rerank or do_refine:
        g, pos = _topk_raw(descriptors, ids, q, num_valid, scales,
                           k=depth, use_pallas=use_pallas, int4=int4,
                           mask=mask)
        # exact-refine: the row itself is the single "region" and the
        # (post-QE) query is the single query region — region match
        # becomes the exact int8 cosine; fuse_weight=0 drops the coarse
        # scan's score from the fused ordering
        qreg = q[:, None, :] if do_refine else query_regional
        from .search.rerank import rerank_from_candidates
        return rerank_from_candidates(
            regional, ids, g, pos, qreg, k=k,
            regional_scales=regional_scales, fuse_weight=fuse_weight,
            spatial_weight=0.0 if do_refine else spatial_weight,
            vote_matrix=vote_matrix)
    if do_diffusion:
        g, pos = _topk_raw(descriptors, ids, q, num_valid, scales,
                           k=depth, use_pallas=use_pallas, int4=int4,
                           mask=mask)
        cand = _gather_rows_f32(descriptors, jnp.maximum(pos, 0), scales,
                                int4=int4)                    # [Q, depth, D]
        from .search.diffusion import diffusion_rerank_from_candidates
        return diffusion_rerank_from_candidates(
            ids, g, pos, cand, k=k, knn=diff_knn, alpha=diff_alpha,
            iters=diff_iters, seeds=diff_seeds)
    scores, pos = _topk_raw(descriptors, ids, q, num_valid, scales,
                            k=k, use_pallas=use_pallas, int4=int4,
                            mask=mask)
    return scores, _pos_to_ids(ids, scores, pos)


@partial(jax.jit, static_argnames=("k", "depth", "qe_n", "qe_alpha",
                                   "use_pallas", "do_qe", "int4"))
def _lw_composite_jit(descriptors, ids, queries, num_valid, scales,
                      lw_P, lw_mu, lw_store, lw_assign, mask=None,
                      *, k: int, depth: int, qe_n: int, qe_alpha: float,
                      use_pallas: bool, do_qe: bool, int4: bool = False):
    """ONE jitted program for local-whitening re-ranking
    (search/lw_rerank.py): optional alpha-QE, fused top-``depth``
    candidate scan, all-cluster query whitening (one batched einsum),
    candidate gather from the precomputed whitened store, top-k. Same
    no-[Q, N]-matrix discipline as _search_composite_jit."""
    q = jnp.asarray(queries, jnp.float32)
    if do_qe:
        s, pos = _topk_raw(descriptors, ids, q, num_valid, scales,
                           k=qe_n, use_pallas=use_pallas, int4=int4,
                           mask=mask)
        rows = _gather_rows_f32(descriptors, jnp.maximum(pos, 0), scales,
                                int4=int4)
        rows = jnp.where((s > -jnp.inf)[..., None], rows, 0.0)
        from .search.qe import expand_from_candidates
        q = expand_from_candidates(q, s, rows, qe_alpha)
    g, pos = _topk_raw(descriptors, ids, q, num_valid, scales,
                       k=depth, use_pallas=use_pallas, int4=int4, mask=mask)
    from .search.lw_rerank import (lw_rescore_from_candidates,
                                   whiten_all_clusters)
    # the POST-QE query is the retrieval query — whiten the expanded one.
    # lw stores/whitens the UNPADDED descriptor width (int4 packing may
    # have added a zero column to q; drop it before the bank matmul)
    q_all = whiten_all_clusters(q[:, :lw_mu.shape[-1]], lw_P, lw_mu)
    return lw_rescore_from_candidates(lw_store, lw_assign, ids, g, pos,
                                      q_all, k=k)


@partial(jax.jit, static_argnames=("n", "alpha", "use_pallas", "chunk",
                                   "int4"))
def _dba_chunk_jit(descriptors, ids, num_valid, scales, start,
                   *, n: int, alpha: float, use_pallas: bool, chunk: int,
                   int4: bool = False):
    """One DBA chunk (search/dba.py): rows [start, start+chunk) of the
    ORIGINAL matrix act as queries against the whole original matrix;
    returns their augmented replacements [chunk, D] f32. Candidate
    selection is the same fused kernel as serving; the weighting is the
    shared qe.expand_from_candidates (include_query=False — the row is
    its own top-1 neighbor at weight 1)."""
    rows_q = _slice_rows_f32(descriptors, scales, start, chunk, int4=int4)
    s, pos = _topk_raw(descriptors, ids, rows_q, num_valid, scales,
                       k=n, use_pallas=use_pallas, int4=int4)
    nbrs = _gather_rows_f32(descriptors, jnp.maximum(pos, 0), scales,
                            int4=int4)                     # [chunk, n, D]
    nbrs = jnp.where((s > -jnp.inf)[..., None], nbrs, 0.0)
    from .search.qe import expand_from_candidates
    out = expand_from_candidates(rows_q, s, nbrs, alpha, include_query=False)
    # padding rows in the chunk tail: zero queries aggregate only
    # zero-weight ties -> expand already returns 0, but make it explicit
    row_ids = jax.lax.dynamic_slice(ids, (start,), (chunk,))
    return jnp.where((row_ids >= 0)[:, None], out, 0.0)


@partial(jax.jit, static_argnames=("k", "use_pallas", "chunk", "int4",
                                   "l2"))
def _knn_chunk_jit(descriptors, ids, num_valid, scales, start, mask=None,
                   *, k: int, use_pallas: bool, chunk: int,
                   int4: bool = False, l2: bool = False):
    """One kNN-graph chunk (Index.knn_graph): rows [start, start+chunk)
    of the store act as queries against the whole store through the same
    fused top-k kernel as serving. The self-match is struck by row
    POSITION (exact even when distinct images share identical
    descriptors), then the remaining top-k re-selected — so the program
    asks the kernel for k+1. ``mask``: optional [1, N] subset filter
    restricting the NEIGHBOR side (search/subset.py). ``l2``: the store
    carries the norm-augmentation column (Index.is_l2) — query rows get
    it swapped for the -1 query column, and returned scores are
    converted to ``-||x - q||^2``."""
    rows_q = _slice_rows_f32(descriptors, scales, start, chunk, int4=int4)
    if l2:
        qnorm2 = 2.0 * rows_q[:, -1]             # aug col = ||x||^2 / 2
        rows_q = jnp.concatenate(
            [rows_q[:, :-1],
             jnp.full((chunk, 1), -1.0, jnp.float32)], axis=1)
    s, pos = _topk_raw(descriptors, ids, rows_q, num_valid, scales,
                       k=k + 1, use_pallas=use_pallas, int4=int4, mask=mask)
    own = start + jnp.arange(chunk, dtype=pos.dtype)
    s = jnp.where(pos == own[:, None], -jnp.inf, s)
    s, sel = jax.lax.top_k(s, k)            # struck slot falls off the end
    pos = jnp.take_along_axis(pos, sel, axis=1)
    row_ids = jax.lax.dynamic_slice(ids, (start,), (chunk,))
    s = jnp.where((row_ids >= 0)[:, None], s, -jnp.inf)
    out_ids = _pos_to_ids(ids, s, pos)
    if l2:                                   # -inf stays -inf
        s = jnp.where(out_ids >= 0, 2.0 * s - qnorm2[:, None], -jnp.inf)
    return s, out_ids


@partial(jax.jit, static_argnames=("int4",))
def _reconstruct_jit(descriptors, scales, pos, *, int4: bool = False):
    """Dequantized f32 rows at padded positions ``pos`` — the
    Index.reconstruct gather (the one row-materialization definition,
    _gather_rows_f32). Callers pad ``pos`` to a power of two so repeated
    lookups of varying sizes reuse ~log2 many compiled programs
    (compiles cost ~90-110 s through this box's tunnel, CLAUDE.md)."""
    return _gather_rows_f32(descriptors, jnp.maximum(pos, 0), scales,
                            int4=int4)


@partial(jax.jit, donate_argnums=(0,))
def _write_rows_jit(buf, rows, start):
    return jax.lax.dynamic_update_slice(buf, rows, (start, 0))


@jax.jit
def _move_rows_jit(arr, src, dst):
    """Apply the compaction moves of ``Index.remove`` to any
    position-aligned per-row array (PQ codes, lw whitened store/assign):
    gather-before-write, padding entries are self-moves."""
    return arr.at[dst].set(arr[src])


@jax.jit
def _remap_positions_jit(P, pos_map):
    """Remap stored row positions through ``pos_map`` (old -> new, -1 =
    removed) — the tombstoning side of view-absorbed removal. -1 padding
    entries stay -1."""
    return jnp.where(P >= 0, jnp.take(pos_map, jnp.maximum(P, 0)), -1)


@partial(jax.jit, donate_argnums=(0,))
def _compact_rows_jit(state, src, dst, new_valid):
    """Move rows ``src`` -> ``dst`` across every per-row tensor, then
    tombstone everything at positions >= ``new_valid`` to id -1 (the
    oracle's mask; the kernel masks by position). Rows are gathered
    BEFORE any write, so src/dst overlap is safe; padding entries are
    self-moves of the last padding row (see Index.remove). The whole
    state tuple is donated — removal never doubles HBM."""
    X, ids, scales, regional, regional_scales = state
    X = X.at[dst].set(X[src])
    ids = ids.at[dst].set(ids[src])
    pos = jnp.arange(ids.shape[0], dtype=jnp.int32)
    ids = jnp.where(pos < new_valid, ids, -1)
    if scales is not None:                      # [1, N_pad] int8 row scales
        scales = scales.at[:, dst].set(scales[:, src])
    if regional is not None:                    # [N_pad, R, D]
        regional = regional.at[dst].set(regional[src])
    if regional_scales is not None:             # [N_pad, R]
        regional_scales = regional_scales.at[dst].set(
            regional_scales[src])
    return X, ids, scales, regional, regional_scales


@partial(jax.jit, static_argnames=("chunk", "int4"))
def _range_count_jit(descriptors, ids, queries, scales, tau, mask=None,
                     *, chunk: int, int4: bool = False):
    """Exact per-query count of rows scoring >= ``tau`` — the counting
    half of range search (Index.search_range). Streams the store in
    ``chunk``-row blocks inside ONE jitted fori_loop (never a [Q, N]
    matrix; ``chunk`` must divide the padded row count), scoring at f32
    after dequantization. ``mask``: optional [1, N] subset filter
    (search/subset.py)."""
    q = jnp.asarray(queries, jnp.float32)
    steps = descriptors.shape[0] // chunk
    # scalar tau (ip metric) or per-query [Q] thresholds (l2 metric:
    # radius -> (||q||^2 - r^2)/2 varies with the query)
    thr = tau if jnp.ndim(tau) == 0 else tau[:, None]

    def body(i, acc):
        rows = _slice_rows_f32(descriptors, scales, i * chunk, chunk,
                               int4=int4)                    # [chunk, D]
        s = jax.lax.dot_general(
            q, rows, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [Q, chunk]
        ids_c = jax.lax.dynamic_slice(ids, (i * chunk,), (chunk,))
        ok = ids_c[None, :] >= 0
        if mask is not None:
            mk = jax.lax.dynamic_slice(mask[0], (i * chunk,), (chunk,))
            ok = ok & (mk[None, :] > 0)
        return acc + jnp.sum(((s >= thr) & ok).astype(jnp.int32), axis=1)

    return jax.lax.fori_loop(
        0, steps, body, jnp.zeros((q.shape[0],), jnp.int32))


@partial(jax.jit, static_argnames=("int4",))
def _all_scores_jit(descriptors, ids, queries, scales, *,
                    int4: bool = False):
    scores = _raw_scores(descriptors, queries, scales, int4=int4)
    return jnp.where(ids[None, :] >= 0, scores, -jnp.inf)


@partial(jax.jit, static_argnames=("int4",))
def _full_ranking_jit(descriptors, ids, queries, scales, *,
                      int4: bool = False):
    scores = _raw_scores(descriptors, queries, scales, int4=int4)
    scores = jnp.where(ids[None, :] >= 0, scores, -jnp.inf)
    order = jnp.argsort(-scores, axis=1)
    return jnp.take(ids, order)


def attach_regional_store(idx: "Index", regional: np.ndarray) -> None:
    """Pad (+ int8-quantize) the [N, R, D] regional rows into the index's
    [N_pad, R, D] re-rank store — ONE implementation for Index.build,
    ResumableBuilder.finalize and add(). ``regional`` rows come from the
    SAME single extraction pass as the global descriptors
    (Extractor.extract_paths_with_regional), so they are row-aligned by
    construction — the old two-pass build needed a runtime misalignment
    check here; that failure mode no longer exists (review r2)."""
    n_pad = idx.descriptors.shape[0]
    reg_pad = np.zeros((n_pad,) + regional.shape[1:], np.float32)
    reg_pad[:len(regional)] = regional
    if idx.cfg.index.dtype in ("int8", "int4"):
        # quantize the store per (row, region) — it is R x the index
        # size, the system's biggest tensor. An int4 index keeps an int8
        # regional store: re-ranking is precision-sensitive and the store
        # is gathered per-candidate, not streamed, so nibble packing
        # would save little and cost ranking quality.
        from .ops.quantize import quantize_rows
        flat = reg_pad.reshape(-1, reg_pad.shape[-1])
        qr = quantize_rows(jnp.asarray(flat))
        idx.regional = qr.values.reshape(reg_pad.shape)
        idx.regional_scales = qr.scales.reshape(reg_pad.shape[:2])
    else:
        idx.regional = jnp.asarray(reg_pad, _DTYPES[idx.cfg.index.dtype])
    # grid geometry for spatial verification (search/spatial.py): only a
    # real R-MAC store has one (the refine store's single "region" is the
    # row itself); externally attached stores with a mismatched R keep
    # None and spatial_weight stays rejected by the config check
    if idx.extractor is not None and not idx.cfg.index.refine_dtype:
        geom = idx.extractor.regional_geometry()
        if len(geom) == regional.shape[1]:
            idx.regional_geom = geom


def _extractor_fingerprint(ex) -> list:
    """Cheap equality fingerprint of an extractor's weights + whitening:
    per-leaf (tree-ordered) shape and f64 sum. Identical pipelines give
    identical fingerprints (deterministic arrays → deterministic sums);
    it guards merge_from against the real failure — uniting stores built
    by DIFFERENT models/whitenings into one geometrically meaningless
    space — not against adversarial collisions."""
    out = []
    for leaf in jax.tree_util.tree_leaves(ex.variables or {}):
        arr = np.asarray(leaf, np.float64)
        out.append((arr.shape, float(arr.sum())))
    w = getattr(ex, "whitening", None)
    if w is not None:
        for leaf in jax.tree_util.tree_leaves(w):
            arr = np.asarray(leaf, np.float64)
            out.append(("whitening", arr.shape, float(arr.sum())))
    return out


class Index:
    """Brute-force cosine index over L2-normalized descriptors."""

    def __init__(self, descriptors: jax.Array, ids: jax.Array,
                 names: list[str], cfg: PipelineConfig,
                 extractor: Optional[Extractor] = None,
                 regional: "jax.Array | None" = None,
                 scales: "jax.Array | None" = None):
        self.descriptors = descriptors      # [N_pad, D], index dtype
        self.ids = ids                      # [N_pad] int32, -1 = padding
        self.names = names                  # len = num_valid
        self.cfg = cfg
        self.extractor = extractor
        self.regional = regional            # [N_pad, R, D] for re-ranking, optional
        self.regional_scales = None         # [N_pad, R] when regional is int8
        self.scales = scales                # [1, N_pad] f32 when dtype=int8
        self.ivf = None                     # search.ivf.IVFIndex ANN view
        self.lw = None                      # search.lw_rerank view (per-
        #                                     cluster-metric re-scoring)
        self.pq = None                      # search.pq_view.PQView (ADC
        #                                     coarse scan + exact re-score)
        self.ivfpq = None                   # search.ivfpq.IVFPQView
        #                                     (pruned residual-ADC cascade)
        self.regional_geom = None           # [R, 3] R-MAC grid geometry
        #                                     (spatial verification)
        self._layout_gen = 0                # bumped whenever row POSITIONS
        #                                     move (remove compaction) or the
        #                                     store re-pads — invalidates
        #                                     SubsetFilters (search/subset.py)

    # ------------------------------------------------------------------
    @property
    def num_valid(self) -> int:
        return len(self.names)

    @property
    def has_refine_store(self) -> bool:
        """The attached regional store is the exact-refine row copy
        (IndexConfig.refine_dtype), NOT an R-MAC re-rank store. The
        CONFIG is the discriminator — a legitimate rmac_levels=1 re-rank
        store is also [N, 1, D], so shape cannot tell them apart."""
        return bool(self.cfg.index.refine_dtype) and self.regional is not None

    def _check_rescoring_cfg(self, scfg) -> None:
        """One validation for every entry point (search, sharded
        query_images routing, protocol evaluation — which calls it BEFORE
        the expensive extraction/ranking stages): exactly one re-scoring
        stage, and the stage must match the attached store kind."""
        enabled = [nm for nm, on in (("rerank_enabled", scfg.rerank_enabled),
                                     ("diffusion_enabled",
                                      scfg.diffusion_enabled),
                                     ("refine_enabled", scfg.refine_enabled),
                                     ("lw_enabled", scfg.lw_enabled))
                   if on]
        if len(enabled) > 1:
            raise ValueError(
                f"{' and '.join(enabled)} are mutually exclusive (one "
                f"re-scoring stage per query); disable all but one")
        if scfg.rerank_enabled and self.has_refine_store:
            raise ValueError(
                "this index's regional store is the exact-refine row copy "
                "(refine_dtype); use refine_enabled, not rerank_enabled")
        if scfg.refine_enabled and not self.has_refine_store:
            raise ValueError(
                "refine_enabled needs the exact-refine store "
                "(IndexConfig.refine_dtype='int8' at build); this index "
                "has " + ("no regional store" if self.regional is None else
                          "an R-MAC re-rank store (use rerank_enabled)"))
        if scfg.lw_enabled and self.lw is None:
            raise ValueError(
                "lw_enabled needs a fitted local-whitening view; call "
                "Index.fit_local_whitening() (or load an index saved "
                "with one)")
        if scfg.spatial_weight and not scfg.rerank_enabled:
            raise ValueError(
                "spatial_weight fuses into the regional re-rank; enable "
                "rerank_enabled (spatial verification has no meaning "
                "without region matches)")
        if (scfg.pq_depth > 0 and scfg.ivf_nprobe > 0
                and self.pq is not None and self.ivf is not None):
            raise ValueError(
                "pq_depth and ivf_nprobe are both set and both views are "
                "attached — one candidate-selection tier per query "
                "(disable one, e.g. search_cfg.replace(ivf_nprobe=0))")
        armed_tiers = [nm for nm, on in (
            ("ivf_nprobe", scfg.ivf_nprobe > 0 and self.ivf is not None),
            ("pq_depth", scfg.pq_depth > 0 and self.pq is not None),
            ("ivfpq_nprobe",
             scfg.ivfpq_nprobe > 0 and self.ivfpq is not None)) if on]
        if len(armed_tiers) > 1:
            raise ValueError(
                f"{' and '.join(armed_tiers)} all armed — one candidate-"
                f"selection tier per query (disable the others)")
        if self.is_l2:
            wrong = list(enabled) + armed_tiers
            if scfg.qe_enabled:
                wrong.append("qe_enabled")
            if wrong:
                raise ValueError(
                    f"metric='l2' indexes support exact search only — "
                    f"disable {wrong} (QE/re-rank/diffusion/lw and the "
                    f"ANN tiers are cosine-space stages; see "
                    f"IndexConfig.metric)")
        if (scfg.spatial_weight and scfg.rerank_enabled
                and self.regional is not None and self.regional_geom is None):
            raise ValueError(
                "spatial_weight needs the R-MAC grid geometry; this "
                "index's regional store carries none (built by an older "
                "version or attached externally) — rebuild, or set "
                "index.regional_geom = extractor.regional_geometry()")

    @property
    def vote_matrix(self):
        """Lazy one-hot transform-bin assignment for spatial verification
        (search/spatial.py) — built once from the grid geometry, a
        [R*R, bins] constant operand of the re-rank composite."""
        if self.regional_geom is None:
            return None
        if (self.regional is not None
                and len(self.regional_geom) != self.regional.shape[1]):
            raise ValueError(
                f"regional_geom has {len(self.regional_geom)} regions but "
                f"the store has {self.regional.shape[1]} — geometry must "
                f"come from the same R-MAC grid as the store")
        if getattr(self, "_vote_m", None) is None:
            from .search.spatial import build_vote_matrix
            self._vote_m = jnp.asarray(build_vote_matrix(
                self.regional_geom, self.regional_geom))
        return self._vote_m

    @property
    def is_l2(self) -> bool:
        """Euclidean-metric index (IndexConfig.metric="l2"): rows are
        stored augmented with one ``||x||^2/2`` column and queries gain a
        ``-1`` column (_match_query_dim), so the UNCHANGED IP kernels
        rank by -L2 exactly; returned scores are ``-||x - q||^2``.
        ``self.dim`` is the INTERNAL (augmented) width then — user-facing
        boundaries (reconstruct, stats) strip the extra column."""
        return self.cfg.index.metric == "l2"

    @property
    def is_int4(self) -> bool:
        """Packed-nibble storage (two components per byte): the stored
        matrix is [N_pad, D//2] int8 and every scoring/gather path must
        be told — the dtype alone cannot distinguish it from int8."""
        return self.cfg.index.dtype == "int4"

    @property
    def dim(self) -> int:
        return (2 * self.descriptors.shape[1] if self.is_int4
                else self.descriptors.shape[1])

    def name_of(self, dataset_id: int) -> "str | None":
        """Dataset-position id (the values search() returns) -> image name.
        NOT a names-list position: row ids differ from 0..n-1 whenever
        images were quarantined during build or add() grew the id space —
        indexing ``names[id]`` directly returns the wrong image then."""
        n = len(self.names)
        if getattr(self, "_name_by_id_len", -1) != n:
            ids_np = np.asarray(self.ids)[:n]
            self._name_by_id = {int(i): nm
                                for i, nm in zip(ids_np, self.names)}
            self._name_by_id_len = n
        return self._name_by_id.get(int(dataset_id))

    # ------------------------------------------------------------------
    def make_subset(self, names: "Sequence[str] | None" = None,
                    ids: "Sequence[int] | None" = None,
                    mask: "np.ndarray | None" = None):
        """Build a reusable :class:`~instsearch_tpu.search.subset.
        SubsetFilter` restricting searches to the given members (exactly
        one of image ``names``, dataset ``ids``, or a raw ``[N_pad]``
        position ``mask``). Pass the result to ``search(...,
        subset=...)`` / ``query(..., subset=...)`` — every tier (exact
        bf16/int8/int4, QE/re-rank/refine/diffusion/lw composites, IVF,
        PQ, IVF-PQ) honors it. The FAISS ``IDSelector`` analog; design
        and semantics in search/subset.py. ``remove()`` (and a
        capacity-growing ``add``) invalidates existing filters — they
        are rejected as stale, never silently misapplied."""
        from .search.subset import SubsetFilter, build_position_mask
        m = build_position_mask(self, names=names, ids=ids, mask=mask)
        return SubsetFilter(
            mask=jnp.asarray(m[None, :].astype(np.int8)),
            count=int(m.sum()), layout_gen=self._layout_gen,
            n_pad=self.descriptors.shape[0],
            names=tuple(names) if names is not None else None)

    def _resolve_subset(self, subset):
        """``subset=`` argument -> validated SubsetFilter (or None).
        Accepts a prebuilt filter, a sequence of names (str) or of
        dataset ids (int) built ad hoc — prebuilt filters amortize the
        host O(N) pass and the h2d transfer across queries."""
        if subset is None:
            return None
        from .search.subset import SubsetFilter
        if not isinstance(subset, SubsetFilter):
            seq = list(subset)
            if seq and isinstance(seq[0], str):
                subset = self.make_subset(names=seq)
            else:
                subset = self.make_subset(ids=seq)
        if (subset.layout_gen != self._layout_gen
                or subset.n_pad != self.descriptors.shape[0]):
            raise ValueError(
                "stale SubsetFilter: rows were removed (or the store was "
                "re-padded) after it was built, so its positions no longer "
                "match — rebuild it with make_subset()")
        return subset

    # ------------------------------------------------------------------
    @classmethod
    def from_descriptors(cls, descriptors: np.ndarray, names: Sequence[str],
                         cfg: PipelineConfig,
                         extractor: Optional[Extractor] = None,
                         original_ids: np.ndarray | None = None,
                         _augmented: bool = False) -> "Index":
        """``original_ids`` maps descriptor rows back to dataset positions
        (differs from arange when images were quarantined during build).
        ``_augmented``: the rows already carry the l2 norm column
        (internal re-pad path) — never set by users."""
        if cfg.index.metric not in ("ip", "l2"):
            raise ValueError(f"metric={cfg.index.metric!r}: 'ip' or 'l2'")
        if cfg.index.metric == "l2":
            if cfg.index.dtype == "int4":
                raise ValueError(
                    "metric='l2' does not support int4 storage (the "
                    "norm-augmentation column and nibble packing "
                    "interact; use int8/bfloat16/float32)")
            if not _augmented:
                x = np.asarray(descriptors, np.float32)
                descriptors = np.concatenate(
                    [x, 0.5 * (x * x).sum(1, keepdims=True)], axis=1)
        n, d = descriptors.shape
        tile = max(cfg.index.row_tile, 8) * max(cfg.index.num_shards, 1)
        # capacity pre-sizes the padded matrix so rows can be appended later
        # without re-padding/re-sharding (0 = size to the dataset)
        n_pad = max(_pad_rows(max(n, cfg.index.capacity), tile), tile)
        padded = np.zeros((n_pad, d), np.float32)
        padded[:n] = descriptors
        ids = np.full((n_pad,), -1, np.int32)
        ids[:n] = (np.arange(n, dtype=np.int32) if original_ids is None
                   else np.asarray(original_ids, np.int32))
        if cfg.index.refine_dtype:
            if cfg.index.refine_dtype != "int8":
                raise ValueError(
                    f"refine_dtype={cfg.index.refine_dtype!r}: only "
                    f"'int8' is supported")
            if cfg.index.dtype != "int4":
                raise ValueError(
                    "refine_dtype only makes sense over int4 storage "
                    "(int8/bf16 scans already score at refine precision)")
            if cfg.search.rerank_enabled:
                raise ValueError(
                    "refine_dtype and rerank_enabled both claim the "
                    "regional-store slot; pick one re-scoring stage")
        if cfg.index.dtype == "int4":
            from .ops.quantize import quantize_rows_int4
            if d % 2:
                # nibbles pack in pairs: an odd descriptor dim (e.g. a
                # rank-clamped whitening) gains one zero column, which
                # never changes a dot product; queries are padded to
                # match at search time (_match_query_dim)
                padded = np.concatenate(
                    [padded, np.zeros((n_pad, 1), np.float32)], axis=1)
            qr = quantize_rows_int4(jnp.asarray(padded))
            idx = cls(qr.values, jnp.asarray(ids), list(names), cfg,
                      extractor, scales=qr.scales)
            if cfg.index.refine_dtype:
                # the exact-refine store: an int8 copy of the ORIGINAL
                # (pre-int4) rows as a 1-region re-rank store —
                # quantized per row by attach_regional_store, moved by
                # add()/remove()/save() like any regional store
                attach_regional_store(idx, padded[:n][:, None, :])
            return idx
        dtype = _DTYPES[cfg.index.dtype]
        if dtype == jnp.int8:
            from .ops.quantize import quantize_rows
            qr = quantize_rows(jnp.asarray(padded))
            return cls(qr.values, jnp.asarray(ids), list(names), cfg,
                       extractor, scales=qr.scales)
        return cls(jnp.asarray(padded, dtype), jnp.asarray(ids),
                   list(names), cfg, extractor)

    @classmethod
    def build(cls, paths: Sequence[str], cfg: PipelineConfig,
              variables: dict | None = None,
              whitening_paths: Sequence[str] | None = None,
              whitening: "WhiteningParams | None" = None,
              seed: int = 0, mesh=None) -> "Index":
        """Offline indexing (SURVEY.md §3.1): extract -> (fit whitening) ->
        store. ``whitening_paths`` defaults to the indexed set itself (the
        common self-whitening setup when no held-out set is given);
        ``whitening`` supplies pre-fit params instead of fitting PCA here —
        e.g. Lw discriminative whitening from ``finetune(fit_lw=True)``.
        ``mesh`` enables data-parallel extraction over its first axis
        (SURVEY.md §2.2 DP row); defaults to all local devices when more
        than one is visible."""
        if cfg.index.metric == "l2":
            raise ValueError(
                "metric='l2' is for RAW-VECTOR indexes "
                "(Index.from_descriptors); the image pipeline's "
                "descriptors are unit-normalized, where inner product IS "
                "the L2 ranking — keep metric='ip'")
        if mesh is None:
            from .parallel.mesh import default_data_mesh
            mesh = default_data_mesh()
        ex = Extractor(cfg.extract.replace(whiten=False), variables,
                       seed=seed, mesh=mesh)
        quarantine: list[str] = []
        if cfg.search.rerank_enabled:
            # single pass: ONE decode + backbone run per image yields both
            # the global descriptors and the regional re-rank rows
            # (SURVEY.md §3.1: descriptors written once per batch)
            descs, regional, kept = ex.extract_paths_with_regional(
                paths, quarantine)
        else:
            descs, kept = ex.extract_paths(paths, quarantine)
            regional = None
        names = [os.path.splitext(os.path.basename(paths[i]))[0] for i in kept]

        if cfg.extract.whiten or whitening is not None:
            if whitening is not None:
                ex.whitening = whitening
            else:
                if whitening_paths is not None:
                    wdescs, _ = ex.extract_paths(whitening_paths)
                else:
                    wdescs = descs
                ex.whitening = fit_whitening(
                    jnp.asarray(wdescs), dim=cfg.extract.whiten_dim or None)
            from .ops.whitening import (apply_whitening,
                                        apply_whitening_regional)
            descs = np.asarray(apply_whitening(jnp.asarray(descs), ex.whitening))
            if regional is not None and len(regional):
                # the store was extracted before the fit existed (the fit
                # consumes this run's own descriptors): whiten it now, in
                # bounded device chunks
                regional = apply_whitening_regional(regional, ex.whitening)

        idx = cls.from_descriptors(descs, names, cfg, extractor=ex,
                                   original_ids=kept)
        idx.quarantined = quarantine

        if regional is not None:
            attach_regional_store(idx, regional)
        if cfg.index.dba_n:
            idx.augment_database()
        return idx

    # ------------------------------------------------------------------
    def add(self, paths: Sequence[str] | None = None,
            descriptors: np.ndarray | None = None,
            names: Sequence[str] | None = None,
            _regional_rows: np.ndarray | None = None) -> int:
        """Incrementally index new images into the pre-sized capacity
        (``IndexConfig.capacity`` pads the matrix at build time so growth
        is an in-place row write, no re-shard). Pass image ``paths`` (uses
        the attached extractor + its fitted whitening) or pre-whitened
        ``descriptors`` + ``names``. Overflowing the padded capacity falls
        back to a re-pad (host round-trip, logged). Returns #rows added.
        """
        reg_new = None
        if paths is not None:
            assert self.extractor is not None, "index has no extractor"
            quarantine: list[str] = []
            if self.regional is not None and not self.has_refine_store:
                # single pass, same as build: regional rows come from the
                # same decode+backbone run as the descriptors (whitening is
                # already fit here, so it applies inside the program).
                # A 1-region exact-REFINE store is extended from the
                # global descriptors instead (below) — it needs no
                # R-MAC region extraction
                descriptors, reg_new, kept = \
                    self.extractor.extract_paths_with_regional(paths,
                                                               quarantine)
            else:
                descriptors, kept = self.extractor.extract_paths(paths,
                                                                 quarantine)
            names = [os.path.splitext(os.path.basename(paths[i]))[0]
                     for i in kept]
            self.quarantined = (list(getattr(self, "quarantined", []))
                                + quarantine)
        else:
            assert descriptors is not None and names is not None
            descriptors = np.asarray(descriptors, np.float32)
        if self.is_l2 and np.shape(descriptors)[-1] == self.dim - 1:
            # user-width rows gain the norm column (internal-width rows —
            # merge_from's dequantized donors — pass through unchanged)
            x = np.asarray(descriptors, np.float32)
            descriptors = np.concatenate(
                [x, 0.5 * (x * x).sum(1, keepdims=True)], axis=1)
        if self.is_int4 and np.shape(descriptors)[-1] == self.dim - 1:
            # odd-dim store was zero-padded at build (nibble pairs)
            descriptors = np.concatenate(
                [np.asarray(descriptors, np.float32),
                 np.zeros((len(descriptors), 1), np.float32)], axis=1)
        n_new = len(names)
        if n_new == 0:
            return 0
        if self.regional is not None and reg_new is None:
            if self.has_refine_store:
                # exact-refine store: the single "region" IS the row, so
                # descriptor adds extend it directly (dim already padded
                # to the store width above for odd-dim int4)
                reg_new = np.asarray(descriptors, np.float32)[:, None, :]
            elif _regional_rows is not None:
                # merge_from: the caller carries the already-extracted
                # (whitened) regional rows of the donor index
                reg_new = np.asarray(_regional_rows, np.float32)
            else:
                raise ValueError("index has a regional re-rank store; "
                                 "add() needs image paths to extend it")

        # unique new ids: ids are DATASET positions, which run past
        # len(names) whenever the original build quarantined images — so
        # allocate past both (keeps ids unique always, and names-aligned
        # in the common quarantine-free case)
        ids_np = np.asarray(self.ids)
        next_id = int(max(len(self.names),
                          ids_np.max(initial=-1) + 1))
        start = self.num_valid
        n_pad = self.descriptors.shape[0]
        if start + n_new > n_pad:
            # capacity exceeded: re-pad through from_descriptors
            from .utils import get_logger
            get_logger("instsearch.index").warning(
                "capacity %d exceeded (%d + %d); re-padding",
                n_pad, start, n_new)
            if self.is_int4:
                from .ops.quantize import QuantizedRowsInt4, \
                    dequantize_rows_int4
                old = np.asarray(dequantize_rows_int4(
                    QuantizedRowsInt4(self.descriptors, self.scales)))
            elif self.descriptors.dtype == jnp.int8:
                old = np.asarray(self.descriptors.astype(jnp.float32)
                                 ) * np.asarray(self.scales)[0][:, None]
            else:
                old = np.asarray(self.descriptors.astype(jnp.float32))
            merged = np.concatenate([old[:start], descriptors])
            new_ids = np.concatenate([
                ids_np[:start],
                np.arange(next_id, next_id + n_new, dtype=np.int32)])
            # geometric growth: re-padding is a full host round-trip (and
            # re-quantizes EVERY int8 row, compounding quantization error),
            # so doubling amortizes it; the grown capacity is written back
            # into self.cfg so the next overflow sees it (review r2)
            grown = self.cfg.replace(index=self.cfg.index.replace(
                capacity=max(self.cfg.index.capacity, 2 * n_pad,
                             start + n_new)))
            rebuilt = Index.from_descriptors(
                merged, list(self.names) + list(names), grown,
                extractor=self.extractor, original_ids=new_ids,
                _augmented=self.is_l2)  # merged rows carry the norm col
            self.cfg = grown
            self.descriptors, self.ids = rebuilt.descriptors, rebuilt.ids
            self.scales, self.names = rebuilt.scales, rebuilt.names
            # the padded width changed: existing SubsetFilter masks no
            # longer cover the store
            self._layout_gen = self._layout_gen + 1
            if self.regional is not None:
                self._write_regional(start, reg_new,
                                     n_pad_new=self.descriptors.shape[0])
            self._absorb_views(start, n_new)
            return n_new

        rows = jnp.asarray(descriptors)
        new_ids = jnp.arange(next_id, next_id + n_new, dtype=jnp.int32)
        if self.is_int4:
            from .ops.quantize import quantize_rows_int4
            qr = quantize_rows_int4(rows)
            self.descriptors = jax.lax.dynamic_update_slice(
                self.descriptors, qr.values, (start, 0))
            self.scales = jax.lax.dynamic_update_slice(
                self.scales, qr.scales, (0, start))
        elif self.descriptors.dtype == jnp.int8:
            from .ops.quantize import quantize_rows
            qr = quantize_rows(rows)
            self.descriptors = jax.lax.dynamic_update_slice(
                self.descriptors, qr.values, (start, 0))
            self.scales = jax.lax.dynamic_update_slice(
                self.scales, qr.scales, (0, start))
        else:
            self.descriptors = jax.lax.dynamic_update_slice(
                self.descriptors, rows.astype(self.descriptors.dtype),
                (start, 0))
        self.ids = jax.lax.dynamic_update_slice(self.ids, new_ids, (start,))
        self.names = list(self.names) + list(names)
        if self.regional is not None:
            self._write_regional(start, reg_new)
        self._absorb_views(start, n_new)
        return n_new

    def _absorb_views(self, start: int, n_new: int) -> None:
        """Route freshly-written rows [start, start+n_new) into every
        attached candidate/re-scoring view (add() ABSORBS; remove() and
        augment_database() still drop — positions move / values change).
        Per-view contracts in tests/integration/test_view_absorb_add.py:
        IVF appends store-dtype rows to the always-scanned spill (full
        probe stays exactly brute force), IVF-PQ appends frozen-codebook
        residual codes to its spill, PQ and local whitening write
        frozen-fit codes / whitened rows at the new positions."""
        if self.ivf is not None:
            self.ivf.absorb_add(self, start, n_new)
        if self.pq is not None:
            self.pq.absorb_add(self, start, n_new)
        if self.ivfpq is not None:
            self.ivfpq.absorb_add(self, start, n_new)
        if self.lw is not None:
            self.lw.absorb_add(self, start, n_new)

    def _write_regional(self, start: int, reg_new: np.ndarray,
                        n_pad_new: int | None = None) -> None:
        """Write new rows into the regional store (re-padding it first
        when the main matrix was re-padded)."""
        if n_pad_new is not None and n_pad_new != self.regional.shape[0]:
            old = np.zeros((n_pad_new,) + self.regional.shape[1:],
                           np.asarray(self.regional).dtype)
            old[:self.regional.shape[0]] = np.asarray(self.regional)
            self.regional = jnp.asarray(old)
            if self.regional_scales is not None:
                sc = np.zeros((n_pad_new, self.regional.shape[1]), np.float32)
                sc[:self.regional_scales.shape[0]] = np.asarray(
                    self.regional_scales)
                self.regional_scales = jnp.asarray(sc)
        if self.regional.dtype == jnp.int8:
            from .ops.quantize import quantize_rows
            flat = quantize_rows(jnp.asarray(
                reg_new.reshape(-1, reg_new.shape[-1])))
            vals = flat.values.reshape(reg_new.shape)
            scs = flat.scales.reshape(reg_new.shape[:2])
            self.regional = jax.lax.dynamic_update_slice(
                self.regional, vals, (start, 0, 0))
            self.regional_scales = jax.lax.dynamic_update_slice(
                self.regional_scales, scs, (start, 0))
        else:
            self.regional = jax.lax.dynamic_update_slice(
                self.regional, jnp.asarray(reg_new, self.regional.dtype),
                (start, 0, 0))

    # ------------------------------------------------------------------
    def _reject_l2(self, stage: str) -> None:
        """The quality/ANN stack is cosine-space (unit-row assumptions in
        k-means routing, QE averaging, PQ codebooks); an l2-metric index
        keeps the exact tiers only. One error site so the wording cannot
        drift."""
        if self.is_l2:
            raise ValueError(
                f"{stage} is a cosine-space stage — metric='l2' indexes "
                f"support exact search/search_range/knn_graph only "
                f"(IndexConfig.metric)")

    def merge_from(self, other: "Index") -> int:
        """FAISS-``merge_from``-style index union: append every valid row
        of ``other`` into this index (the production shape: per-machine /
        per-day builds combined into one serving index offline,
        ``cli merge-index``). Rows re-enter through :meth:`add`, so
        capacity growth, id allocation and re-quantization under THIS
        index's storage dtype all behave exactly like incremental adds;
        a quantized donor costs one extra int8/int4 round-trip of its
        rows (bit-exact for f32 donors).

        Requirements: equal descriptor dim, equal extraction pipeline
        (``cfg.extract`` must match, and extractor weights + whitening
        are fingerprint-compared when both sides carry them — merging
        stores built by different extractors produces a geometrically
        meaningless union), and disjoint names (names key ``remove()``
        and serving responses). Regional stores must agree in kind:
        R-MAC re-rank stores merge row-for-row, exact-refine stores
        extend automatically, mixed kinds are rejected. Donor ids are
        NOT preserved — merged rows get fresh ids in this index's id
        space (same as add); attached ANN/PQ/lw views ABSORB the merged
        rows under the usual add() rules (``_absorb_views`` — spill /
        frozen-fit semantics; ``cli merge-index`` refits them over the
        union instead). Returns #rows merged."""
        if other is self:
            raise ValueError("cannot merge an index into itself")
        if other.cfg.index.metric != self.cfg.index.metric:
            raise ValueError(
                f"metric mismatch: {self.cfg.index.metric!r} vs "
                f"{other.cfg.index.metric!r} — an l2 store carries a norm "
                f"column an ip store does not")
        if other.dim != self.dim:
            raise ValueError(f"descriptor dim mismatch: {self.dim} vs "
                             f"{other.dim}")
        if self.cfg.extract.to_json() != other.cfg.extract.to_json():
            raise ValueError(
                "extraction configs differ — descriptors from different "
                "pipelines do not share a space; re-extract one side")
        if self.extractor is not None and other.extractor is not None:
            fa = _extractor_fingerprint(self.extractor)
            fb = _extractor_fingerprint(other.extractor)
            if fa != fb:
                raise ValueError(
                    "extractor weight/whitening fingerprints differ — "
                    "the two indexes were not built by the same "
                    "extractor; re-extract one side")
        dup = set(self.names) & set(other.names)
        if dup:
            raise ValueError(
                f"{len(dup)} duplicate names (e.g. "
                f"{sorted(dup)[:3]}) — names must be unique across the "
                f"merged index")
        self_rerank = self.regional is not None and not self.has_refine_store
        other_rerank = (other.regional is not None
                        and not other.has_refine_store)
        if self_rerank != other_rerank or \
                self.has_refine_store != other.has_refine_store:
            raise ValueError(
                "regional-store kinds differ (R-MAC re-rank vs "
                "exact-refine vs none) — both sides must match")
        if self_rerank and \
                self.regional.shape[1] != other.regional.shape[1]:
            raise ValueError(
                f"regional region counts differ: "
                f"{self.regional.shape[1]} vs {other.regional.shape[1]}")

        nvb = other.num_valid
        if nvb == 0:
            return 0
        # donor rows, dequantized once (store width: int4 keeps its
        # nibble-pair zero column, which add() expects at self.dim or
        # self.dim-1 and both stores share here)
        chunk = min(65_536, other.descriptors.shape[0])
        parts = [np.asarray(other._rows_f32_chunk(s, chunk))
                 for s in range(0, nvb, chunk)]
        rows = np.concatenate(parts, axis=0)[:nvb]
        reg_rows = None
        if self_rerank:
            reg = np.asarray(other.regional[:nvb], np.float32)
            if other.regional_scales is not None:
                reg = reg * np.asarray(
                    other.regional_scales[:nvb])[..., None]
            reg_rows = reg
        n = self.add(descriptors=rows, names=list(other.names),
                     _regional_rows=reg_rows)
        self.quarantined = (list(getattr(self, "quarantined", []))
                            + list(getattr(other, "quarantined", [])))
        # absorbed donors land in the ALWAYS-SCANNED spill of an attached
        # IVF/IVF-PQ view — silently dragging the scan fraction toward a
        # full brute-force scan for API callers (cli merge-index refits
        # over the union instead); warn like _drop_ivf does
        for view, rebuild in ((self.ivf, "build_ivf()"),
                              (self.ivfpq, "build_ivfpq()")):
            if view is None:
                continue
            spill_used = int((np.asarray(view.spill_pos) >= 0).sum())
            if spill_used > 0.25 * max(self.num_valid, 1):
                from .utils import get_logger
                get_logger("instsearch.index").warning(
                    "merge_from absorbed the donor into the always-"
                    "scanned spill: %d of %d rows (%.0f%%) now scan on "
                    "EVERY query regardless of nprobe — rebuild with %s "
                    "over the union to restore the pruned layout",
                    spill_used, self.num_valid,
                    100.0 * spill_used / max(self.num_valid, 1), rebuild)
        return n

    # ------------------------------------------------------------------
    def build_ivf(self, n_clusters: int | None = None, nprobe: int = 32,
                  iters: int = 10, seed: int = 0, cap_factor: float = 4.0,
                  sample: "int | None" = 262_144):
        """Attach an IVF ANN view (search/ivf.py): k-means coarse quantizer
        + cluster-pruned scan, reading ~nprobe/n_clusters of the index per
        query. Routes ``search()`` (including QE / regional re-ranking —
        candidate selection swaps, the quality math is shared) while the
        exact path stays available via ``search_cfg.replace(ivf_nprobe=0)``.
        Approximate by construction: measure with ``ivf.measure_recall``.
        Single-device only (the sharded path keeps the exact fused scan);
        ``add()`` and ``remove()`` are absorbed (new rows join the
        always-scanned spill — IVFIndex.absorb_add; removals remap/
        tombstone positions — IVFIndex.absorb_remove),
        ``augment_database()`` invalidates the view — rebuild after it. Returns the
        IVFIndex."""
        self._reject_l2("build_ivf")
        if self.is_int4:
            raise ValueError(
                "IVF views are not supported on int4 storage (the bucket "
                "gather re-materializes rows; use int8 for IVF, or int4 "
                "with the exact fused scan — it reads a quarter of bf16's "
                "bytes, which is the same latency class IVF targets)")
        if self.ivfpq is not None:
            raise ValueError(
                "an IVF-PQ view is attached — mutually exclusive "
                "candidate-selection tiers (one per index)")
        from .search.ivf import IVFIndex
        self.ivf = IVFIndex.from_index(self, n_clusters=n_clusters,
                                       nprobe=nprobe, iters=iters, seed=seed,
                                       cap_factor=cap_factor, sample=sample)
        self.cfg = self.cfg.replace(
            search=self.cfg.search.replace(ivf_nprobe=nprobe))
        return self.ivf

    def build_pq(self, m: int | None = None, iters: int = 15,
                 seed: int = 0, sample: "int | None" = 262_144,
                 depth: int = 100, chunk: int = 65_536,
                 opq_iters: int = 0,
                 anisotropic_t: "float | None" = None):
        """Attach a product-quantization cascade view (search/pq_view.py):
        4-bit PQ codes (ops/pq.py, 32 B per 512-d row) scanned by the
        fused ADC kernel select ``depth`` candidates, exactly re-scored
        against the main store in the same program. Routes ``search()``
        (including QE / regional re-ranking) while the exact path stays
        available via ``search_cfg.replace(pq_depth=0)``. Quality =
        candidate recall (``pq.measure_recall``; measured on clustered
        1M data: 0.69@depth=100, 1.0@depth=1024 — i.i.d. data collapses
        it for reasons that say nothing about the kernel). Measured
        regime (chip, r4): the ADC scan is VPU-expansion-bound, so at
        1M×512 it LOSES to the packed-int4 exact scan (0.68× the full
        stream) and B=1 latency is poor even at capacity scale (~99 ms
        over 64M rows); but past int4's ~62M-row ceiling on a 16 GB chip
        the 4-bit codes (2 GB @64M) are the ONLY single-chip store, and
        batching amortizes the expansion — B=128 costs ~1.9× B=1's time
        for 128× the queries (~670 QPS over 64M rows, bench.py
        ``bench_pq_capacity``). Use it for capacity + batched traffic;
        use exact int4/IVF for latency at scales that fit.
        ``opq_iters > 0`` learns an OPQ rotation with the codebook
        (ops/pq.fit_opq) — better candidate recall at the same 32 B/row,
        for one extra [B, D] query matmul at scan time.
        ``anisotropic_t`` fits/encodes score-aware codes instead
        (ScaNN loss, ops/pq.fit_apq) — raw-ADC ranking quality for
        ADC-only serving; the re-scored cascade measures no gain.
        ``add()`` and ``remove()`` are absorbed (frozen-codebook codes
        written at the new positions — PQView.absorb_add; removals
        replay the compaction moves — PQView.absorb_remove),
        ``augment_database()`` invalidates the view — rebuild after it. Single-device view (the sharded path keeps the exact
        fused scan). Returns the PQView."""
        self._reject_l2("build_pq")
        if self.ivfpq is not None:
            raise ValueError(
                "an IVF-PQ view is attached — mutually exclusive "
                "candidate-selection tiers (one per index)")
        if self.num_valid < 16_000_000:
            # measured regime guard (VERDICT r4 weak 7): below the
            # capacity regime the flat ADC scan LOSES to the exact fused
            # scans (0.68x the bf16 stream at 1M — expansion-bound), so
            # building PQ here silently costs latency for nothing
            from .utils import get_logger
            get_logger("instsearch.index").warning(
                "build_pq at %d rows: the flat PQ scan is measured SLOWER "
                "than the exact bf16/int8/int4 scans below the ~16M-row "
                "capacity regime (expansion-bound ADC; BASELINE.md) — use "
                "exact storage or build_ivfpq for latency; PQ earns its "
                "keep only when nothing exact fits the chip",
                self.num_valid)
        from .search.pq_view import PQView
        self.pq = PQView.from_index(self, m=m, iters=iters, seed=seed,
                                    sample=sample, depth=depth, chunk=chunk,
                                    opq_iters=opq_iters,
                                    anisotropic_t=anisotropic_t)
        self.cfg = self.cfg.replace(
            search=self.cfg.search.replace(pq_depth=depth))
        return self.pq

    def build_ivfpq(self, n_clusters: int | None = None, nprobe: int = 32,
                    m: int | None = None, kmeans_iters: int = 10,
                    pq_iters: int = 15, seed: int = 0,
                    cap_factor: float = 4.0,
                    sample: "int | None" = 262_144, depth: int = 400,
                    chunk: int = 65_536, opq_iters: int = 0,
                    anisotropic_t: "float | None" = None):
        """Attach an IVF-PQ cascade view (search/ivfpq.py): k-means
        bucketing of 4-bit RESIDUAL PQ codes — the PQ tier's 32 B/row
        store with its ADC expansion (the tier's whole cost) pruned to
        ``nprobe/n_clusters`` of the rows, exact re-score against the
        main store in the same program. Routes ``search()`` (including
        QE / regional re-ranking) when ``SearchConfig.ivfpq_nprobe > 0``;
        the exact path stays available via
        ``search_cfg.replace(ivfpq_nprobe=0)``. Quality = candidate
        recall over (nprobe, depth) jointly (``ivfpq.measure_recall``).
        Mutually exclusive with the IVF and PQ views (one candidate tier
        per index). ``opq_iters > 0`` learns an OPQ rotation in RESIDUAL
        space (Ge CVPR'13; ops/pq.fit_opq) — better candidate recall at
        the same 32 B/row. ``anisotropic_t`` fits/encodes score-aware
        residual codes (ScaNN loss with the original rows as parallel
        directions, ops/pq.fit_apq) — raw-ADC quality for
        ``IVFPQView.search_adc``; the re-scored cascade measures no
        gain. ``add()`` and ``remove()`` are absorbed (frozen-quantizer residual
        codes appended to the spill — IVFPQView.absorb_add; removals
        remap/tombstone positions — IVFPQView.absorb_remove),
        ``augment_database()`` invalidates the view — rebuild after it. Returns the IVFPQView."""
        self._reject_l2("build_ivfpq")
        if self.ivf is not None or self.pq is not None:
            raise ValueError(
                "IVF-PQ is mutually exclusive with the IVF and PQ views "
                "(one candidate-selection tier per index); drop the "
                "other view first")
        from .search.ivfpq import IVFPQView
        self.ivfpq = IVFPQView.from_index(
            self, n_clusters=n_clusters, nprobe=nprobe, m=m,
            kmeans_iters=kmeans_iters, pq_iters=pq_iters, seed=seed,
            cap_factor=cap_factor, sample=sample, depth=depth, chunk=chunk,
            opq_iters=opq_iters, anisotropic_t=anisotropic_t)
        self.cfg = self.cfg.replace(
            search=self.cfg.search.replace(ivfpq_nprobe=self.ivfpq.nprobe))
        return self.ivfpq

    def _drop_pq(self, why: str) -> None:
        if self.pq is not None:
            from .utils import get_logger
            get_logger("instsearch.index").warning(
                "PQ view invalidated by %s; rebuild with build_pq()", why)
            self.pq = None
        if self.ivfpq is not None:
            from .utils import get_logger
            get_logger("instsearch.index").warning(
                "IVF-PQ view invalidated by %s; rebuild with "
                "build_ivfpq()", why)
            self.ivfpq = None

    def _drop_ivf(self, why: str) -> None:
        if self.ivf is not None:
            from .utils import get_logger
            get_logger("instsearch.index").warning(
                "IVF view invalidated by %s; rebuild with build_ivf()", why)
            self.ivf = None

    def fit_local_whitening(self, n_clusters: int | None = None,
                            dim: int | None = None, tau: float = 64.0,
                            iters: int = 10, seed: int = 0):
        """Attach a local-whitening re-ranking view (search/lw_rerank.py):
        a k-means-routed bank of per-cluster whitening transforms plus the
        precomputed whitened row store. Enables ``lw_enabled`` re-scoring
        — the top-``rerank_depth`` candidates are re-scored under each
        candidate's own cluster metric (both sides transformed by the
        SAME expert, ops/local_whiten.py). Mutually exclusive at query
        time with the other re-scoring stages; ``add()`` and ``remove()`` are absorbed
        (new rows routed + whitened under the frozen bank —
        LocalWhiteningView.absorb_add; removals replay the compaction
        moves — absorb_remove), ``augment_database()`` invalidates the
        view — refit after it.
        Single-device view (the sharded path keeps the exact stages).
        Returns the LocalWhiteningView."""
        self._reject_l2("fit_local_whitening")
        from .search.lw_rerank import LocalWhiteningView
        self.lw = LocalWhiteningView.from_index(
            self, n_clusters=n_clusters, dim=dim, tau=tau, iters=iters,
            seed=seed)
        self.cfg = self.cfg.replace(
            search=self.cfg.search.replace(lw_enabled=True))
        return self.lw

    def _drop_lw(self, why: str) -> None:
        if self.lw is not None:
            from .utils import get_logger
            get_logger("instsearch.index").warning(
                "local-whitening view invalidated by %s; refit with "
                "fit_local_whitening()", why)
            self.lw = None
            self.cfg = self.cfg.replace(
                search=self.cfg.search.replace(lw_enabled=False))

    # ------------------------------------------------------------------
    def _rows_f32_chunk(self, start: int, chunk: int) -> jax.Array:
        """Dequantized f32 rows [chunk, dim] starting at ``start``
        (int8: per-row scales; int4: unpack + scales)."""
        return _slice_rows_f32(self.descriptors, self.scales, start, chunk,
                               int4=self.is_int4)

    def _rows_f32_chunk_padded(self, start: int, n_new: int):
        """``(rows [P, dim] f32, off)`` with the target rows at
        ``rows[off:off + n_new]`` and P = next power of two ≥ n_new —
        the absorb-add reader. Every jitted program downstream of a live
        ``add()`` (dequant slice, k-means assign, PQ encode, whitening)
        compiles per distinct row count, and a compile costs ~90-110 s
        through this box's tunnel (CLAUDE.md) — padding the batch to a
        power of two makes repeated serve-time adds of varying sizes
        reuse ~log₂ many compiled shapes instead of one per size. When
        ``start + P`` would run past the padded store, the window slides
        BACK (``off > 0``); rows before ``start`` are existing rows whose
        re-derived view entries are identical under any frozen fit, rows
        past ``start + n_new`` are ≥ num_valid and masked everywhere."""
        P = max(8, 1 << max(0, n_new - 1).bit_length())
        n_pad = self.descriptors.shape[0]
        if P >= n_pad:
            return self._rows_f32_chunk(0, n_pad), start
        s0 = min(start, n_pad - P)
        return self._rows_f32_chunk(s0, P), start - s0

    def augment_database(self, n: int | None = None,
                         alpha: float | None = None,
                         chunk: int | None = None, mesh=None) -> None:
        """αDBA (search/dba.py): replace every stored row, in place, by
        the s^alpha-weighted sum of its ``n`` nearest database rows
        (itself included at weight 1). One offline batched self-search:
        every chunk of rows queries the ORIGINAL matrix through the same
        fused top-k kernel as serving, results land in a device-resident
        f32 buffer (donated in-place writes, ONE readback-free pass), and
        the buffer replaces the matrix at the end — int8 storage is
        re-quantized once from the f32 augmentation, not round-tripped.

        Defaults come from ``IndexConfig.dba_n`` / ``dba_alpha``
        (``Index.build`` applies them automatically). Drops an attached
        IVF view (centroid geometry changed). The regional re-rank store
        keeps its RAW per-region descriptors — only the global matrix
        (and therefore the global cosine the re-rank fuses) is
        augmented. Rows ``add()``-ed later are NOT retro-augmented; call
        this again after bulk additions.

        ``mesh`` routes neighbor selection through the row-sharded
        distributed machinery (ShardedIndex.expand_queries with the
        database-side include_query=False weighting) for corpora bigger
        than one chip's HBM — exact-equal to the single-device path
        (tested); the augmented matrix still lands back in THIS index's
        single-device storage."""
        self._reject_l2("augment_database")
        n = n if n is not None else (self.cfg.index.dba_n or 10)
        alpha = self.cfg.index.dba_alpha if alpha is None else alpha
        if self.num_valid == 0:
            return
        n_pad = self.descriptors.shape[0]
        n = min(n, n_pad)
        chunk = min(chunk or self.cfg.search.query_chunk or 128, n_pad)
        use_pallas = (self.cfg.search.use_pallas
                      and jax.devices()[0].platform == "tpu")
        nv = jnp.asarray(self.num_valid, jnp.int32)
        buf = jnp.zeros((n_pad, self.dim), jnp.float32)
        sidx = self.to_sharded(mesh=mesh) if mesh is not None else None
        for start in range(0, self.num_valid, chunk):
            s32 = jnp.asarray(min(start, n_pad - chunk), jnp.int32)
            if sidx is not None:
                rows_q = self._rows_f32_chunk(s32, chunk)
                rows = sidx.expand_queries(rows_q, qe_n=n,
                                           alpha=float(alpha),
                                           include_query=False)
                # mesh-replicated -> this index's single-device storage
                rows = jax.device_put(np.asarray(rows))
                row_ids = jax.lax.dynamic_slice(self.ids, (s32,), (chunk,))
                rows = jnp.where((row_ids >= 0)[:, None], rows, 0.0)
            else:
                rows = _dba_chunk_jit(self.descriptors, self.ids, nv,
                                      self.scales, s32, n=n,
                                      alpha=float(alpha),
                                      use_pallas=use_pallas, chunk=chunk,
                                      int4=self.is_int4)
            buf = _write_rows_jit(buf, rows, s32)
        self._drop_ivf("augment_database()")
        self._drop_lw("augment_database()")  # row values changed
        self._drop_pq("augment_database()")  # codes no longer match rows
        if self.is_int4:
            from .ops.quantize import quantize_rows_int4
            qr = quantize_rows_int4(buf)
            self.descriptors, self.scales = qr.values, qr.scales
        elif self.descriptors.dtype == jnp.int8:
            from .ops.quantize import quantize_rows
            qr = quantize_rows(buf)
            self.descriptors, self.scales = qr.values, qr.scales
        else:
            self.descriptors = buf.astype(self.descriptors.dtype)
        if self.has_refine_store:
            # the exact-refine store mirrors the global rows: re-derive
            # it from the SAME f32 augmentation, ON DEVICE (review r3: an
            # attach_regional_store round-trip pulled the full f32 matrix
            # through the ~275 MB/s tunnel — ~1 min at the tier's 8M-row
            # target scale). An R-MAC re-rank store instead keeps its RAW
            # per-region descriptors, see docstring. Padding rows are
            # zero in buf, so they quantize back to zero.
            from .ops.quantize import quantize_rows
            qr = quantize_rows(buf)
            self.regional = qr.values[:, None, :]
            self.regional_scales = qr.scales.reshape(-1, 1)
        from .utils import COUNTERS
        COUNTERS.add("rows_dba_augmented", self.num_valid)

    # ------------------------------------------------------------------
    def remove(self, names: Sequence[str]) -> int:
        """Remove indexed images by name, in place.

        The Pallas kernel masks validity by row position
        (``row < num_valid``, kernels/topk_matmul.py), so valid rows must
        stay a contiguous prefix: removal COMPACTS by moving surviving
        tail rows into the holes — at most ``len(names)`` row moves, done
        by ONE jitted gather/scatter program (move lists are padded to
        power-of-two buckets so repeated removals don't accumulate
        compiles). int8 rows and their scales move verbatim — no
        dequantize/requantize, so surviving scores are bit-identical to a
        fresh build. The search programs never recompile: every array
        keeps its padded shape, only ``num_valid`` (a traced scalar)
        shrinks.

        Raises ``KeyError`` for unknown names (the index is unchanged).
        Returns the number of rows removed. A live ``to_sharded()`` view
        holds its own row placement — rebuild it after mutating.

        Attached IVF/PQ/IVF-PQ/local-whitening views ABSORB the removal:
        position-aligned stores replay the same compaction moves,
        position-keyed buckets/spill remap (removed entries tombstone to
        -1 and are masked exactly like padding slots), so add -> remove ->
        add keeps every view attached and exact over the survivors.
        Tombstones hollow buckets out over many removals (scan cost
        unchanged, candidate slots shrink) — rebuild the view to compact.
        """
        pos_by_name = {nm: i for i, nm in enumerate(self.names)}
        missing = [nm for nm in names if nm not in pos_by_name]
        if missing:
            raise KeyError(f"not in index: {missing}")
        rem = {pos_by_name[nm] for nm in names}
        m = len(rem)
        if m == 0:
            return 0
        n_valid = self.num_valid
        new_valid = n_valid - m
        # surviving rows now in the tail [new_valid, n_valid) move into
        # the holes below new_valid; counts match by construction
        holes = sorted(p for p in rem if p < new_valid)
        tail_survivors = [p for p in range(new_valid, n_valid)
                          if p not in rem]
        n_pad = self.descriptors.shape[0]
        n_moves = len(holes)
        bucket = max(1, 1 << max(0, n_moves - 1).bit_length())
        # pad with self-moves of the LAST padding row: never a hole
        # (holes < new_valid <= n_pad - 1), so duplicate-dst scatter
        # nondeterminism cannot arise
        src = np.full((bucket,), n_pad - 1, np.int32)
        dst = np.full((bucket,), n_pad - 1, np.int32)
        src[:n_moves] = tail_survivors
        dst[:n_moves] = holes

        out = _compact_rows_jit(
            (self.descriptors, self.ids, self.scales, self.regional,
             self.regional_scales),
            jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(new_valid, jnp.int32))
        (self.descriptors, self.ids, self.scales, self.regional,
         self.regional_scales) = out

        # attached views ABSORB the removal (r5; any remove used to drop
        # them — a minutes-long refit per delete batch at capacity scale):
        # position-aligned stores (PQ codes, lw) replay the same moves,
        # position-keyed views (IVF, IVF-PQ) remap through old->new with
        # removed positions tombstoned to -1 (masked like padding slots).
        if (self.ivf is not None or self.ivfpq is not None
                or self.pq is not None or self.lw is not None):
            pos_map = np.arange(n_pad, dtype=np.int32)
            pos_map[sorted(rem)] = -1
            pos_map[tail_survivors] = holes
            pos_map_j = jnp.asarray(pos_map)
            src_j, dst_j = jnp.asarray(src), jnp.asarray(dst)
            if self.ivf is not None:
                self.ivf.absorb_remove(pos_map_j)
            if self.ivfpq is not None:
                self.ivfpq.absorb_remove(pos_map_j)
            if self.pq is not None:
                self.pq.absorb_remove(src_j, dst_j)
            if self.lw is not None:
                self.lw.absorb_remove(src_j, dst_j)

        names_arr = np.array(self.names, dtype=object)
        names_arr[holes] = names_arr[tail_survivors]
        self.names = list(names_arr[:new_valid])
        self._name_by_id_len = -1            # invalidate name_of() cache
        self._layout_gen = self._layout_gen + 1   # positions moved:
        #                       SubsetFilters built before this are stale
        from .utils import COUNTERS
        COUNTERS.add("images_removed", m)
        return m

    # ------------------------------------------------------------------
    def _match_query_dim(self, q: jax.Array) -> jax.Array:
        """int4 stores pad an odd descriptor dim with one zero column
        (nibbles pack in pairs); queries must match that width. The zero
        column never changes a dot product. l2-metric stores carry a
        ``||x||^2/2`` column instead; queries gain a ``-1`` there, so
        ``x'.q' = x.q - ||x||^2/2`` and IP top-k == L2 top-k (is_l2)."""
        if self.is_int4 and q.shape[-1] == self.dim - 1:
            q = jnp.pad(jnp.asarray(q), ((0, 0), (0, 1)))
        elif self.is_l2 and q.shape[-1] == self.dim - 1:
            q = jnp.concatenate(
                [jnp.asarray(q, jnp.float32),
                 jnp.full((q.shape[0], 1), -1.0, jnp.float32)], axis=-1)
        return q

    def _l2_query_norms(self, q) -> "np.ndarray | None":
        """``||q||^2 [Q]`` for the l2 score conversion (-L2^2 = 2*s_aug
        - ||q||^2), or None on ip indexes. Accepts user-width or
        already-augmented queries (the -1 column is dropped first)."""
        if not self.is_l2:
            return None
        qn = np.asarray(q, np.float32)
        if qn.shape[-1] == self.dim:
            qn = qn[..., :-1]
        return (qn * qn).sum(-1)

    def _masked_scores(self, queries: jax.Array) -> jax.Array:
        queries = self._match_query_dim(jnp.asarray(queries))
        scores = _all_scores_jit(self.descriptors, self.ids,
                                 jnp.asarray(queries), self.scales,
                                 int4=self.is_int4)
        return scores

    def _topk(self, queries: jax.Array, k: int, chunk: int | None = None,
              mask=None):
        """Top-k positions -> original ids; fused Pallas kernel on TPU,
        XLA oracle elsewhere (SURVEY.md N5). One jitted program — eager op
        dispatch is extremely slow through the axon tunnel.

        Query batches larger than ``chunk`` (default: the index config's
        ``search.query_chunk``) are served in fixed-size chunks
        (utils.chunking: one shared policy with ShardedIndex). search()
        passes chunk=0 — its outer composite chunking already split the
        batch at the CALLER's query_chunk, which must win over the index
        default."""
        from .utils.chunking import run_chunked
        use_pallas = (self.cfg.search.use_pallas
                      and jax.devices()[0].platform == "tpu")
        nv = jnp.asarray(self.num_valid, jnp.int32)
        run = lambda qq: _topk_jit(self.descriptors, self.ids, qq, nv,
                                   self.scales, mask, k=k,
                                   use_pallas=use_pallas, int4=self.is_int4)
        if chunk is None:
            chunk = self.cfg.search.query_chunk
        return run_chunked(run, chunk, queries)

    def search(self, queries: np.ndarray | jax.Array,
               search_cfg: Optional[SearchConfig] = None,
               query_regional: "np.ndarray | jax.Array | None" = None,
               subset=None):
        """Descriptor-space search: ``queries [Q, D]`` ->
        ``(scores [Q,k], ids [Q,k])`` with αQE / re-ranking as configured.
        ``query_regional [Q, Rq, D]`` enables the re-ranking stage (built
        automatically by :meth:`query_images`). ``subset`` (a
        :meth:`make_subset` filter, or a sequence of names/ids built ad
        hoc) restricts results to those rows — every tier honors it
        (search/subset.py). l2-metric indexes (IndexConfig.metric="l2")
        return scores of ``-||x - q||^2`` (higher = closer), exact."""
        scfg = search_cfg or self.cfg.search
        q = jnp.asarray(queries)
        if q.ndim == 1:
            q = q[None]
        qn2 = self._l2_query_norms(q)        # None unless metric='l2'
        q = self._match_query_dim(q)
        from .utils import COUNTERS
        COUNTERS.add("queries_served", q.shape[0])
        # config-level validation (guards on CONFIG flags, not the
        # effective do_rerank — an index without a regional store must
        # still reject an ambiguous config instead of silently picking)
        self._check_rescoring_cfg(scfg)
        subset = self._resolve_subset(subset)
        mask = subset.mask if subset is not None else None
        do_rerank = (scfg.rerank_enabled and self.regional is not None
                     and query_regional is not None)
        do_diffusion = scfg.diffusion_enabled
        do_refine = scfg.refine_enabled
        do_lw = scfg.lw_enabled and self.lw is not None

        if (self.ivf is not None and scfg.ivf_nprobe > 0
                and not do_diffusion and not do_lw):
            # diffusion needs the exact top-depth neighborhood (the graph
            # IS the result) and lw re-scores a quality-critical candidate
            # set — both always take the exact fused scan
            return self._search_ivf(q, scfg, query_regional, do_rerank,
                                    mask=mask)

        if (self.pq is not None and scfg.pq_depth > 0
                and not do_diffusion and not do_lw and not do_refine):
            # refine is redundant under PQ (the cascade's exact re-score
            # IS a refine); diffusion/lw keep the exact scan like IVF
            return self._search_pq(q, scfg, query_regional, do_rerank,
                                   mask=mask)

        if (self.ivfpq is not None and scfg.ivfpq_nprobe > 0
                and not do_diffusion and not do_lw and not do_refine):
            # same routing discipline as the PQ cascade (the exact
            # re-score IS a refine; diffusion/lw keep the exact scan)
            return self._search_ivfpq(q, scfg, query_regional, do_rerank,
                                      mask=mask)

        if do_lw:
            return self._search_lw(q, scfg, mask=mask)

        # the WHOLE composite is chunked, not just the top-k: the re-rank
        # stage gathers [chunk, depth, R, D] candidate regions, so an
        # unchunked large batch would still allocate GBs at depth=100
        def run(qq, *qreg):
            if scfg.qe_enabled or do_rerank or do_diffusion or do_refine:
                use_pallas = (self.cfg.search.use_pallas
                              and jax.devices()[0].platform == "tpu")
                nv = jnp.asarray(self.num_valid, jnp.int32)
                depth = 0
                if do_rerank or do_refine:
                    depth = min(scfg.rerank_depth, self.descriptors.shape[0])
                elif do_diffusion:
                    depth = min(scfg.diffusion_depth,
                                self.descriptors.shape[0])
                store = do_rerank or do_refine
                sw = float(scfg.spatial_weight) if do_rerank else 0.0
                return _search_composite_jit(
                    self.descriptors, self.ids, qq, nv, self.scales,
                    self.regional if store else None,
                    self.regional_scales if store else None,
                    qreg[0] if do_rerank else None,
                    self.vote_matrix if sw else None, mask,
                    k=scfg.k, depth=depth, qe_n=scfg.qe_n,
                    qe_alpha=scfg.qe_alpha, use_pallas=use_pallas,
                    do_qe=scfg.qe_enabled, do_rerank=do_rerank,
                    do_diffusion=do_diffusion,
                    diff_knn=scfg.diffusion_knn,
                    diff_alpha=scfg.diffusion_alpha,
                    diff_iters=scfg.diffusion_iters,
                    diff_seeds=scfg.diffusion_seeds,
                    int4=self.is_int4, do_refine=do_refine,
                    fuse_weight=0.0 if do_refine else 1.0,
                    spatial_weight=sw)
            return self._topk(qq, scfg.k, chunk=0, mask=mask)

        from .utils.chunking import run_chunked
        args = (q, jnp.asarray(query_regional)) if do_rerank else (q,)
        top_scores, top_ids = run_chunked(run, scfg.query_chunk, *args)
        s, i = fetch(top_scores, top_ids)
        if qn2 is not None:                  # augmented IP -> -||x - q||^2
            s = np.where(i >= 0, 2.0 * s - qn2[:, None], -np.inf)
        return s, i

    def _search_lw(self, q, scfg, mask=None):
        """Local-whitening re-ranking path (search/lw_rerank.py): optional
        QE, fused top-rerank_depth candidate scan, per-cluster-metric
        re-score — ONE jitted program per chunk. Chunked so the
        [chunk, E, dim] all-cluster query block stays bounded."""
        lw = self.lw
        depth = min(scfg.rerank_depth, self.descriptors.shape[0])
        use_pallas = (self.cfg.search.use_pallas
                      and jax.devices()[0].platform == "tpu")
        nv = jnp.asarray(self.num_valid, jnp.int32)

        def run(qq):
            return _lw_composite_jit(
                self.descriptors, self.ids, qq, nv, self.scales,
                lw.params.P, lw.params.mu, lw.store, lw.assign, mask,
                k=scfg.k, depth=depth, qe_n=scfg.qe_n,
                qe_alpha=scfg.qe_alpha, use_pallas=use_pallas,
                do_qe=scfg.qe_enabled, int4=self.is_int4)

        per_q = max(1, lw.n_clusters * lw.dim * 4 + depth * lw.dim * 8)
        chunk = max(1, min(scfg.query_chunk or q.shape[0],
                           (256 << 20) // per_q))
        from .utils.chunking import run_chunked
        top_scores, top_ids = run_chunked(run, chunk, q)
        return fetch(top_scores, top_ids)

    def _search_pq(self, q, scfg, query_regional, do_rerank: bool,
                   mask=None):
        """PQ cascade path (search/pq_view.py): ADC coarse scan over the
        4-bit code stream selects pq_depth candidates, exactly re-scored
        against the main store — QE / re-rank stages compose by position,
        ONE jitted program per chunk."""
        pq = self.pq
        depth = max(scfg.pq_depth, scfg.k,
                    scfg.qe_n if scfg.qe_enabled else 0,
                    scfg.rerank_depth if do_rerank else 0)
        depth = min(depth, self.descriptors.shape[0])
        use_pallas = (self.cfg.search.use_pallas
                      and jax.devices()[0].platform == "tpu")
        nv = jnp.asarray(self.num_valid, jnp.int32)
        sw = float(scfg.spatial_weight) if do_rerank else 0.0
        from .search.pq_view import _pq_composite_jit

        def run(qq, *qreg):
            return _pq_composite_jit(
                pq.codes, pq.codebook.centroids, self.descriptors,
                self.ids, self.scales,
                self.regional if do_rerank else None,
                self.regional_scales if do_rerank else None,
                qreg[0] if do_rerank else None, qq, nv,
                self.vote_matrix if sw else None, pq.rotation, mask,
                k=scfg.k, depth=depth, qe_n=scfg.qe_n,
                qe_alpha=scfg.qe_alpha, do_qe=scfg.qe_enabled,
                do_rerank=do_rerank, int4=self.is_int4,
                use_pallas=use_pallas, spatial_weight=sw,
                rerank_depth=min(scfg.rerank_depth, depth))

        # bound the per-stage [chunk, depth, D] f32 candidate gather
        per_q = max(1, 2 * depth * self.dim * 4)
        chunk = max(1, min(scfg.query_chunk or q.shape[0],
                           (256 << 20) // per_q))
        from .utils.chunking import run_chunked
        args = (q, jnp.asarray(query_regional)) if do_rerank else (q,)
        top_scores, top_ids = run_chunked(run, chunk, *args)
        return fetch(top_scores, top_ids)

    def _search_ivfpq(self, q, scfg, query_regional, do_rerank: bool,
                      mask=None):
        """IVF-PQ cascade path (search/ivfpq.py): cluster-pruned residual
        ADC over bucketed 4-bit codes selects the candidates, exactly
        re-scored against the main store — QE / re-rank stages compose by
        position, ONE jitted program per chunk."""
        v = self.ivfpq
        nprobe = min(scfg.ivfpq_nprobe, v.n_clusters)
        depth = max(v.depth, scfg.k,
                    scfg.qe_n if scfg.qe_enabled else 0,
                    scfg.rerank_depth if do_rerank else 0)
        depth = min(depth, self.descriptors.shape[0])
        nv = jnp.asarray(self.num_valid, jnp.int32)
        sw = float(scfg.spatial_weight) if do_rerank else 0.0
        from .search.ivfpq import _ivfpq_composite_jit

        def run(qq, *qreg):
            return _ivfpq_composite_jit(
                v.centroids, v.codes, v.bucket_pos, v.spill_codes,
                v.spill_pos, v.spill_cluster, v.codebook.centroids,
                self.descriptors, self.ids, self.scales,
                self.regional if do_rerank else None,
                self.regional_scales if do_rerank else None,
                qreg[0] if do_rerank else None, qq, nv,
                self.vote_matrix if sw else None, v.rotation, mask,
                k=scfg.k, depth=depth, qe_n=scfg.qe_n,
                qe_alpha=scfg.qe_alpha, nprobe=nprobe,
                do_qe=scfg.qe_enabled, do_rerank=do_rerank,
                int4=self.is_int4, spatial_weight=sw,
                rerank_depth=min(scfg.rerank_depth, depth))

        # bound the [chunk, nprobe, M, m/2] code gather + the
        # [chunk, depth, D] exact-re-score gather
        per_q = max(1, nprobe * v.bucket_capacity * v.bytes_per_row
                    + 2 * depth * self.dim * 4)
        chunk = max(1, min(scfg.query_chunk or q.shape[0],
                           (256 << 20) // per_q))
        from .utils.chunking import run_chunked
        args = (q, jnp.asarray(query_regional)) if do_rerank else (q,)
        top_scores, top_ids = run_chunked(run, chunk, *args)
        return fetch(top_scores, top_ids)

    def _search_ivf(self, q, scfg, query_regional, do_rerank: bool,
                    mask=None):
        """Cluster-pruned search path (search/ivf.py): same composite
        stages (QE -> re-rank -> top-k), candidate selection via the IVF
        buckets instead of the full scan. Chunked so the per-query
        [chunk, nprobe, M, D] bucket gather stays bounded."""
        ivf = self.ivf
        nprobe = min(scfg.ivf_nprobe, ivf.n_clusters)
        depth = (min(scfg.rerank_depth, self.descriptors.shape[0])
                 if do_rerank else 0)
        from .search.ivf import _ivf_composite_jit

        sw = float(scfg.spatial_weight) if do_rerank else 0.0

        def run(qq, *qreg):
            return _ivf_composite_jit(
                ivf.centroids, ivf.buckets, ivf.bucket_scales,
                ivf.bucket_pos, ivf.spill, ivf.spill_scales, ivf.spill_pos,
                self.descriptors, self.ids, self.scales,
                self.regional if do_rerank else None,
                self.regional_scales if do_rerank else None,
                qreg[0] if do_rerank else None, qq,
                self.vote_matrix if sw else None, mask,
                k=scfg.k, depth=depth, qe_n=scfg.qe_n,
                qe_alpha=scfg.qe_alpha, nprobe=nprobe,
                do_qe=scfg.qe_enabled, do_rerank=do_rerank,
                spatial_weight=sw)

        row_bytes = ivf.buckets.shape[2] * ivf.buckets.dtype.itemsize
        per_q = max(1, nprobe * ivf.bucket_capacity * row_bytes)
        chunk = max(1, min(scfg.query_chunk or q.shape[0],
                           (256 << 20) // per_q))
        from .utils.chunking import run_chunked
        args = (q, jnp.asarray(query_regional)) if do_rerank else (q,)
        top_scores, top_ids = run_chunked(run, chunk, *args)
        return fetch(top_scores, top_ids)

    def query(self, queries, search_cfg: Optional[SearchConfig] = None,
              k: Optional[int] = None, **kw):
        """BASELINE.json surface: ``index.query(x, k=10)``. Accepts
        descriptor arrays ([Q, D] / [D]) or uint8 image batches
        ([Q, S, S, 3] / [S, S, 3]). jax arrays stay on device."""
        q = queries if hasattr(queries, "ndim") else np.asarray(queries)
        scfg = search_cfg or self.cfg.search
        if k is not None:
            scfg = scfg.replace(k=k)
        # image batches are [S,S,3] / [Q,S,S,3]; descriptors [D] / [Q,D].
        # Anything else gets a clear error HERE instead of a shape-unpack
        # crash deep inside the jitted extractor (review r2).
        is_image = q.ndim in (3, 4) and q.shape[-1] == 3
        if is_image:
            if q.dtype != np.uint8:
                # frontend.normalize assumes float images are pre-scaled to
                # [0, 1]; a [0, 255] float batch would silently produce
                # garbage descriptors (and confidently wrong neighbors)
                lo, hi = float(jnp.min(q)), float(jnp.max(q))
                if lo < 0.0 or hi > 1.0:
                    raise ValueError(
                        f"float image batch has values in [{lo:g}, {hi:g}]; "
                        f"query() expects uint8 pixels [0, 255] or float "
                        f"images pre-scaled to [0, 1]")
            # **kw (subset=, sharded_index=) must reach the image route
            # too — dropping it here silently served UNFILTERED results
            # for image queries with subset= (caught by the r5 example)
            return self.query_images(q if q.ndim == 4 else q[None], scfg,
                                     **kw)
        if q.ndim in (1, 2) and q.dtype != np.uint8:
            return self.search(q, scfg, **kw)
        raise ValueError(
            f"query() expects uint8/float image batches [Q,S,S,3]/[S,S,3] "
            f"or float descriptors [Q,D]/[D]; got shape {tuple(q.shape)} "
            f"dtype {q.dtype}")

    def evaluate(self, dataset, protocol: str = "medium",
                 search_cfg: Optional[SearchConfig] = None,
                 sharded: bool = False, mesh=None) -> dict:
        """BASELINE.json surface: ``index.evaluate()`` — full protocol
        metrics on a RetrievalDataset (eval/evaluate.py). ``sharded=True``
        ranks/expands/re-ranks through the distributed machinery on
        ``mesh`` (default: cfg.index.num_shards devices) — same math,
        row-sharded (exact-equality tested vs the single-device path)."""
        from .eval.evaluate import evaluate_index
        sidx = self.to_sharded(mesh=mesh) if sharded else None
        return evaluate_index(self, dataset, protocol, search_cfg,
                              sharded_index=sidx)

    def query_images(self, images, search_cfg: Optional[SearchConfig] = None,
                     sharded_index=None, subset=None):
        """Image-space search: uint8 batch -> extract -> search (computes
        regional query descriptors when re-ranking is enabled).

        ``sharded_index`` (a parallel.ShardedIndex, e.g. ``to_sharded()``)
        routes QE / search / re-rank through the distributed machinery —
        the multi-chip serving path; extraction stays on this process's
        extractor (same routing as eval/evaluate.py's sharded protocol).
        ``subset``: optional row filter (see :meth:`make_subset`); the
        sharded route re-shards the mask over the mesh
        (ShardedIndex.place_subset)."""
        assert self.extractor is not None, "index has no extractor attached"
        scfg = search_cfg or self.cfg.search
        # the sharded routing below would otherwise silently prefer the
        # rerank stage / run a stage against the wrong store kind
        self._check_rescoring_cfg(scfg)
        images = jnp.asarray(images)
        q = self.extractor(images)
        qreg = None
        if scfg.rerank_enabled and self.regional is not None:
            qreg = self.extractor.extract_regional(images)
        if sharded_index is None:
            return self.search(q, scfg, query_regional=qreg, subset=subset)
        # sharded route: re-shard the filter mask row-aligned with the
        # store (positions are global; the mask shards like the scales)
        smask = None
        if subset is not None:
            smask = sharded_index.place_subset(self._resolve_subset(subset))
        from .utils import COUNTERS
        COUNTERS.add("queries_served", q.shape[0])
        # IVF-PQ on the mesh: same gating as the single-device router
        # EXCEPT rerank — the cascade composite has no sharded
        # regional-rerank form yet, so a rerank-enabled config keeps the
        # sharded exact-selection rerank below (candidate quality >= the
        # cascade's; latency is the exact scan's)
        if (scfg.ivfpq_nprobe > 0 and sharded_index.ivfpq is not None
                and not (scfg.diffusion_enabled or scfg.lw_enabled
                         or scfg.refine_enabled)
                and not (scfg.rerank_enabled
                         and sharded_index.regional is not None)):
            s, i = sharded_index.search_ivfpq(
                q, k=scfg.k, nprobe=scfg.ivfpq_nprobe,
                qe_n=scfg.qe_n if scfg.qe_enabled else 0,
                qe_alpha=scfg.qe_alpha, mask=smask)
            return fetch(s, i)
        if scfg.qe_enabled:
            q = sharded_index.expand_queries(q, qe_n=scfg.qe_n,
                                             alpha=scfg.qe_alpha,
                                             mask=smask)
        if scfg.rerank_enabled and sharded_index.regional is not None \
                and qreg is not None:
            s, i = sharded_index.search_rerank(
                q, qreg, k=scfg.k, depth=scfg.rerank_depth,
                spatial_weight=scfg.spatial_weight, mask=smask)
        elif scfg.refine_enabled:
            # exact-refine on the mesh: 1-region store, the (expanded)
            # query as its own region, zero global-fusion weight. Pad the
            # query to the store width FIRST — an odd-dim int4 store is
            # one column wider than the extractor's descriptors, and the
            # replicated qreg operand bypasses _common_operands' pad
            q32 = self._match_query_dim(jnp.asarray(q, jnp.float32))
            s, i = sharded_index.search_rerank(
                q32, q32[:, None, :], k=scfg.k, depth=scfg.rerank_depth,
                fuse_weight=0.0, mask=smask)
        elif scfg.diffusion_enabled:
            s, i = sharded_index.search_diffusion(
                q, k=scfg.k, depth=scfg.diffusion_depth,
                knn=scfg.diffusion_knn, alpha=scfg.diffusion_alpha,
                iters=scfg.diffusion_iters, seeds=scfg.diffusion_seeds,
                mask=smask)
        elif scfg.lw_enabled:
            # local-whitening re-scoring on the mesh (search_lw was dead
            # code from the serving path until r4 — the sharded route fell
            # through to the plain scan; VERDICT r3 missing-item 2)
            s, i = sharded_index.search_lw(q, k=scfg.k,
                                           depth=scfg.rerank_depth,
                                           mask=smask)
        else:
            s, i = sharded_index.search(q, k=scfg.k, mask=smask)
        return fetch(s, i)

    def search_range(self, queries, tau: float, max_results: int = 1024,
                     subset=None, mesh=None):
        """Range search: every row scoring ``>= tau`` (FAISS
        ``range_search`` analog) -> ``(scores [Q, m], ids [Q, m],
        counts [Q])`` with ``m = max_results``.

        A dynamic result set cannot compile on TPU, so the output is the
        static-shape compromise production range queries actually want:
        the top ``max_results`` matches above the threshold, score-sorted
        (slots past a query's count carry ``(-inf, -1)`` like padding),
        plus the EXACT per-query count from a streamed threshold-count
        pass (``_range_count_jit`` — chunked fori_loop, no [Q, N] matrix,
        ~one extra scan at stream speed). ``counts[i] > max_results``
        flags truncation — re-issue with a larger ``max_results`` for the
        full set. ``subset`` filters exactly like :meth:`search`.

        Precision note: members come from the fused top-k scan (bf16/int8
        storage scores at storage precision, f32 accumulation); counts
        re-score at f32 after dequantization — identical for f32 stores,
        and within one quantization ulp around ``tau`` otherwise (a
        near-tie row can land on the other side of the threshold in one
        of the two passes).

        l2-metric indexes (IndexConfig.metric="l2"): ``tau`` is the
        Euclidean RADIUS — every row with ``||x - q|| <= tau`` counts
        (converted internally to per-query augmented-score thresholds
        ``(||q||^2 - tau^2)/2``), and returned scores are ``-||x-q||^2``
        best-first like :meth:`search`.

        ``mesh`` routes both halves through the row-sharded machinery
        (ShardedIndex.search_range: sharded merge for the members, a
        per-shard streamed threshold pass + one psum for the counts) —
        exact-equal to the single-device path (tested)."""
        q = jnp.asarray(queries)
        if q.ndim == 1:
            q = q[None]
        qn2 = self._l2_query_norms(q)
        q = self._match_query_dim(q)
        subset = self._resolve_subset(subset)
        from .utils import COUNTERS
        COUNTERS.add("queries_served", q.shape[0])
        if qn2 is not None:                      # radius -> per-query thr
            thr = jnp.asarray((qn2 - float(tau) ** 2) / 2.0, jnp.float32)
        else:
            thr = jnp.float32(tau)
        if mesh is not None:
            sidx = self.to_sharded(mesh=mesh)
            smask = (sidx.place_subset(subset) if subset is not None
                     else None)
            s, i, counts = sidx.search_range(q, thr,
                                             max_results=max_results,
                                             mask=smask)
            counts = np.asarray(counts)
        else:
            mask = subset.mask if subset is not None else None
            m = min(max_results, self.descriptors.shape[0])
            s, i = self._topk(q, m, mask=mask)
            keep = s >= (thr[:, None] if thr.ndim else thr)
            s = jnp.where(keep, s, -jnp.inf)
            i = jnp.where(keep, i, -1)
            n_pad = self.descriptors.shape[0]
            chunk = next(c for c in (65_536, 32_768, 16_384, 8_192,
                                     4_096, 2_048, 1_024, 512, 256, 128,
                                     64, 32, 16, 8)
                         if n_pad % c == 0)
            chunk = min(chunk, n_pad)
            counts = np.asarray(_range_count_jit(
                self.descriptors, self.ids, q, self.scales, thr, mask,
                chunk=chunk, int4=self.is_int4))
        s, i = fetch(s, i)
        if qn2 is not None:
            s = np.where(i >= 0, 2.0 * s - qn2[:, None], -np.inf)
        return s, i, counts

    def reconstruct(self, names: "Sequence[str] | None" = None,
                    ids: "Sequence[int] | None" = None) -> np.ndarray:
        """Stored descriptor rows back out of the index (FAISS
        ``reconstruct``/``reconstruct_n`` analog) -> ``[n, dim]`` f32
        numpy, row-aligned with the request. Exactly one of image
        ``names`` or dataset ``ids`` (the values ``search`` returns);
        unknown members raise ``KeyError``.

        Returns what the scoring kernels actually see: f32 stores round-
        trip exactly; int8/int4 stores decode through the same
        dequantization as every search path (``_gather_rows_f32``), so
        the result is the stored approximation, not the pre-quantization
        original. Positions are padded to a power of two before the
        jitted gather so repeated lookups of varying sizes reuse ~log2
        many compiled programs (tunnel compiles cost ~90-110 s,
        CLAUDE.md)."""
        if (names is None) == (ids is None):
            raise ValueError("pass exactly one of names=, ids=")
        if names is not None:
            pos_by_name = {nm: p for p, nm in enumerate(self.names)}
            missing = [nm for nm in names if nm not in pos_by_name]
            if missing:
                raise KeyError(f"{len(missing)} names not in the index "
                               f"(e.g. {missing[:3]})")
            pos = np.array([pos_by_name[nm] for nm in names], np.int32)
        else:
            ids_np = np.asarray(self.ids)[:self.num_valid]
            pos_by_id = {int(v): p for p, v in enumerate(ids_np)}
            want = [int(i) for i in ids]
            missing = [i for i in want if i not in pos_by_id]
            if missing:
                raise KeyError(f"{len(missing)} ids not in the index "
                               f"(e.g. {missing[:3]})")
            pos = np.array([pos_by_id[i] for i in want], np.int32)
        n = len(pos)
        if n == 0:
            return np.zeros((0, self.dim - (1 if self.is_l2 else 0)),
                            np.float32)
        P = max(8, 1 << (n - 1).bit_length())
        padded = np.zeros((P,), np.int32)
        padded[:n] = pos
        rows = _reconstruct_jit(self.descriptors, self.scales,
                                jnp.asarray(padded), int4=self.is_int4)
        rows = np.asarray(rows)[:n]
        return rows[:, :-1] if self.is_l2 else rows   # strip the norm col

    def knn_graph(self, k: int = 10, chunk: int | None = None,
                  subset=None, mesh=None):
        """Offline all-pairs kNN over the indexed corpus (FAISS ``knn``
        utility analog) -> ``(scores [num_valid, k] f32, ids [num_valid,
        k] int32)`` numpy, row ``p`` = neighbors of ``names[p]``,
        best-first, SELF EXCLUDED (struck by row position, so exact even
        for byte-identical duplicates). The substrate for deduplication
        (:meth:`find_duplicates`), offline diffusion graphs, and
        cluster post-analysis.

        One batched self-search: every ``chunk`` rows of the store query
        the whole store through the same fused top-k kernel as serving
        (the αDBA scan pattern, ``_knn_chunk_jit``) — never a [N, N]
        matrix. ``subset`` restricts the NEIGHBOR side exactly like
        :meth:`search`; rows with fewer than ``k`` valid neighbors pad
        with ``(-inf, -1)``. Chunks stay small (default 128) because the
        kernel's scoped-VMEM budget holds b·tile merge temporaries
        (CLAUDE.md).

        ``mesh`` routes neighbor selection through the row-sharded
        distributed machinery (the αDBA pattern) for corpora bigger than
        one chip's HBM: per-shard fused top-(k+1) + one ICI allgather
        merge per chunk, self struck host-side by dataset id (row ids
        are unique, so id-strike == position-strike) — exact-equal to
        the single-device path (tested). l2-metric indexes return
        ``-||x - q||^2`` scores like :meth:`search`."""
        nv = self.num_valid
        out_s = np.full((nv, k), -np.inf, np.float32)
        out_i = np.full((nv, k), -1, np.int32)
        if nv == 0:
            return out_s, out_i
        n_pad = self.descriptors.shape[0]
        k = min(k, max(1, n_pad - 1))
        chunk = min(chunk or self.cfg.search.query_chunk or 128, n_pad)
        subset = self._resolve_subset(subset)
        mask = subset.mask if subset is not None else None
        use_pallas = (self.cfg.search.use_pallas
                      and jax.devices()[0].platform == "tpu")
        sidx = self.to_sharded(mesh=mesh) if mesh is not None else None
        smask = sidx.place_subset(subset) if (sidx is not None
                                              and subset is not None) else None
        ids_np = np.asarray(self.ids)
        nv_dev = jnp.asarray(nv, jnp.int32)
        for start in range(0, nv, chunk):
            s0 = min(start, n_pad - chunk)   # slide back near the end
            off = start - s0
            if sidx is not None:
                rows_q = self._rows_f32_chunk(jnp.asarray(s0, jnp.int32),
                                              chunk)
                qnorm2 = None
                if self.is_l2:               # swap norm col -> query col
                    qnorm2 = 2.0 * np.asarray(rows_q[:, -1], np.float32)
                    rows_q = jnp.concatenate(
                        [rows_q[:, :-1],
                         jnp.full((chunk, 1), -1.0, jnp.float32)], axis=1)
                s, i = sidx.search(rows_q, k=k + 1, mask=smask)
                s, i = np.asarray(s), np.asarray(i)
                own = ids_np[s0:s0 + chunk]
                s = np.where(i == own[:, None], -np.inf, s)
                i = np.where(i == own[:, None], -1, i)
                order = np.argsort(-s, axis=1, kind="stable")[:, :k]
                s = np.take_along_axis(s, order, axis=1)
                i = np.take_along_axis(i, order, axis=1)
                s = np.where(own[:, None] >= 0, s, -np.inf)
                i = np.where((own[:, None] >= 0) & (s > -np.inf), i, -1)
                if qnorm2 is not None:
                    s = np.where(i >= 0, 2.0 * s - qnorm2[:, None], -np.inf)
            else:
                s, i = _knn_chunk_jit(self.descriptors, self.ids, nv_dev,
                                      self.scales,
                                      jnp.asarray(s0, jnp.int32),
                                      mask, k=k, use_pallas=use_pallas,
                                      chunk=chunk, int4=self.is_int4,
                                      l2=self.is_l2)
                s, i = fetch(s, i)
            take = min(chunk - off, nv - start)
            out_s[start:start + take] = s[off:off + take]
            out_i[start:start + take] = i[off:off + take]
        return out_s, out_i

    def find_duplicates(self, tau: float = 0.97, k: int = 16,
                        chunk: int | None = None, subset=None,
                        group: bool = False, mesh=None):
        """Near-duplicate detection over the indexed corpus — the classic
        instance-search production application (dedup before training,
        copyright/provenance sweeps). Default: ``(pairs [P, 2] int32
        dataset ids, scores [P] f32)``, each unordered pair once
        (``id_a < id_b``), score ≥ ``tau``, sorted best-first. With
        ``group=True``: connected components of the pair graph as
        ``list[list[str]]`` image-name groups (size ≥ 2), largest first
        — transitive closure, so a chain a~b~c lands in one group even
        when a·c < tau.

        Built on :meth:`knn_graph`, so each row contributes at most its
        ``k`` nearest neighbors as edges: a row with more than ``k``
        matches above ``tau`` still groups transitively through its
        neighbors' own edges, but the PAIR list caps at k per row —
        raise ``k`` for exhaustive pair enumeration at high duplicate
        density. ``subset`` restricts the neighbor side; ``mesh`` routes
        the underlying kNN graph through the row-sharded machinery.
        l2-metric indexes: ``tau`` is the Euclidean RADIUS (pairs within
        distance tau; reported pair scores are ``-||a - b||^2``)."""
        s, i = self.knn_graph(k=k, chunk=chunk, subset=subset, mesh=mesh)
        thr = -(float(tau) ** 2) if self.is_l2 else tau
        row_ids = np.asarray(self.ids)[:self.num_valid]
        qa = np.repeat(row_ids, k).reshape(-1)
        qb = i.reshape(-1)
        sc = s.reshape(-1)
        keep = (qb >= 0) & (sc >= thr) & (qa != qb)
        qa, qb, sc = qa[keep], qb[keep], sc[keep]
        lo, hi = np.minimum(qa, qb), np.maximum(qa, qb)
        # dedupe symmetric edges, keeping each pair's best score
        order = np.lexsort((-sc, hi, lo))
        lo, hi, sc = lo[order], hi[order], sc[order]
        first = np.ones(len(lo), bool)
        first[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        lo, hi, sc = lo[first], hi[first], sc[first]
        best = np.argsort(-sc, kind="stable")
        pairs = np.stack([lo[best], hi[best]], axis=1).astype(np.int32)
        sc = sc[best].astype(np.float32)
        if not group:
            return pairs, sc
        parent = {}                          # union-find over dataset ids

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:     # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in pairs:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[ra] = rb
        comps = {}
        for a in set(pairs.reshape(-1).tolist()):
            comps.setdefault(find(a), []).append(a)
        groups = sorted(comps.values(), key=len, reverse=True)
        return [[self.name_of(a) for a in sorted(g)] for g in groups]

    def stats(self) -> dict:
        """Introspection snapshot for operators (`cli info` prints it):
        row/capacity/dim/dtype, device-resident bytes per store, and the
        parameters + scan economics of every attached view. Host-only —
        reads array metadata, never fetches device data."""
        def nbytes(a):
            return 0 if a is None else int(a.size * a.dtype.itemsize)

        out = {
            "rows": self.num_valid,
            "capacity": int(self.descriptors.shape[0]),
            "dim": self.dim - (1 if self.is_l2 else 0),  # user width
            "metric": self.cfg.index.metric,
            "dtype": self.cfg.index.dtype,
            "layout_gen": self._layout_gen,
            "has_extractor": self.extractor is not None,
            "bytes": {
                "descriptors": nbytes(self.descriptors),
                "scales": nbytes(self.scales),
                "regional": nbytes(self.regional)
                + nbytes(self.regional_scales),
            },
        }
        if self.regional is not None:
            out["regional_kind"] = ("refine" if self.has_refine_store
                                    else "rmac")
            out["regions_per_image"] = int(self.regional.shape[1])
        if self.ivf is not None:
            v = self.ivf
            out["ivf"] = {
                "n_clusters": v.n_clusters, "nprobe": v.nprobe,
                "bucket_capacity": v.bucket_capacity,
                "spill_rows": int(v.spill.shape[0]),
                "scan_fraction": round(v.scan_fraction(), 4),
            }
            out["bytes"]["ivf"] = (nbytes(v.centroids) + nbytes(v.buckets)
                                   + nbytes(v.spill))
        if self.pq is not None:
            v = self.pq
            out["pq"] = {"m": v.m, "depth": v.depth,
                         "bytes_per_row": v.bytes_per_row,
                         "opq": v.rotation is not None,
                         "anisotropic_t": v.anisotropic_t}
            out["bytes"]["pq"] = nbytes(v.codes)
        if self.ivfpq is not None:
            v = self.ivfpq
            out["ivfpq"] = {
                "n_clusters": v.n_clusters, "nprobe": v.nprobe,
                "m": v.m, "depth": v.depth,
                "bucket_capacity": v.bucket_capacity,
                "spill_rows": int(v.spill_codes.shape[0]),
                "scan_fraction": round(v.scan_fraction(), 4),
                "opq": v.rotation is not None,
                "anisotropic_t": v.anisotropic_t,
            }
            out["bytes"]["ivfpq"] = (nbytes(v.centroids) + nbytes(v.codes)
                                     + nbytes(v.spill_codes))
        if self.lw is not None:
            out["lw"] = {"n_clusters": self.lw.n_clusters}
            out["bytes"]["lw"] = (nbytes(self.lw.store)
                                  + nbytes(self.lw.params.P))
        out["bytes"]["total"] = sum(out["bytes"].values())
        return out

    def full_ranking(self, queries) -> np.ndarray:
        """[Q, N] ranked original dataset ids best-first (valid rows only),
        for protocol evaluation. Padding (-inf) sorts last and is cut."""
        queries = self._match_query_dim(jnp.asarray(queries))
        ranked_ids = _full_ranking_jit(self.descriptors, self.ids,
                                       jnp.asarray(queries), self.scales,
                                       int4=self.is_int4)
        return np.asarray(ranked_ids)[:, :self.num_valid]

    # ------------------------------------------------------------------
    def to_sharded(self, mesh=None, use_pallas: bool | None = None):
        """Distribute this index row-sharded over a device mesh
        (SURVEY.md §2.2): returns a :class:`ShardedIndex` serving the same
        ids, including the regional re-ranking store when one was built.
        On a 1-device mesh this is the identical code path. int8 storage
        stays int8: per-row (and per-region) scales shard alongside the
        rows."""
        from .parallel import ShardedIndex, make_mesh
        if mesh is None:
            # ONE policy (was copy-pasted per CLI site): the config pins
            # the shard count when it names one; otherwise shard over
            # every visible device
            n = self.cfg.index.num_shards
            mesh = make_mesh(n if n > 1 else None)
        if use_pallas is None:
            use_pallas = (self.cfg.search.use_pallas
                          and jax.devices()[0].platform == "tpu")
        sidx = ShardedIndex(self.descriptors, self.ids, mesh=mesh,
                            k=self.cfg.search.k, use_pallas=use_pallas,
                            scales=self.scales, regional=self.regional,
                            regional_scales=self.regional_scales,
                            query_chunk=self.cfg.search.query_chunk,
                            int4=self.is_int4,
                            lw_store=None if self.lw is None
                            else self.lw.store,
                            lw_assign=None if self.lw is None
                            else self.lw.assign,
                            lw_params=None if self.lw is None
                            else self.lw.params,
                            regional_geom=self.regional_geom,
                            l2=self.is_l2)
        if self.ivfpq is not None:
            sidx.attach_ivfpq(self.ivfpq)
        return sidx

    # ------------------------------------------------------------------
    # Persistence. Two storage formats behind one API:
    #   * streaming (orbax/tensorstore, SURVEY.md §5 checkpoint row) — the
    #     default: arrays persist shard-by-shard in their storage dtype and
    #     load() places rows directly onto the target mesh's devices with
    #     the requested NamedSharding, no monolithic host buffer.
    #   * npz — compact single-file fallback for small indexes.
    # Extractor weights + seed are always persisted (an index built with
    # fine-tuned weights must reproduce the SAME query descriptors after
    # load — silent seed-0 reinit is wrong retrieval, ADVICE r1).

    _STREAMING_CUTOFF_BYTES = 8 * 1024 * 1024

    def _array_state(self) -> dict:
        state = {"ids": self.ids}
        if self.is_int4:
            state["descriptors_int4"] = self.descriptors    # packed [N, D//2]
            state["scales"] = self.scales
        elif self.descriptors.dtype == jnp.int8:
            state["descriptors_int8"] = self.descriptors
            state["scales"] = self.scales
        else:
            state["descriptors"] = self.descriptors
        if self.extractor is not None and self.extractor.whitening is not None:
            state["whitening_P"] = self.extractor.whitening.P
            state["whitening_mu"] = self.extractor.whitening.mu
        if self.regional is not None:
            if self.regional.dtype == jnp.int8:
                state["regional_int8"] = self.regional
                state["regional_scales"] = self.regional_scales
            else:
                state["regional"] = self.regional
        return state

    def save(self, path: str, streaming: bool | None = None) -> None:
        os.makedirs(path, exist_ok=True)
        state = self._array_state()
        if streaming is None:
            # decide on the TOTAL store size: the regional re-rank store is
            # R x the index size (the system's biggest tensor), so a small
            # descriptor matrix with a big regional store must still stream
            nbytes = sum(v.size * v.dtype.itemsize for v in state.values())
            streaming = nbytes >= self._STREAMING_CUTOFF_BYTES
        if streaming:
            from .utils.checkpoint import save_sharded_pytree
            save_sharded_pytree(os.path.join(path, "store"), state)
        else:
            np.savez(os.path.join(path, "index.npz"),
                     **{k: np.asarray(v.astype(jnp.float32)
                                      if v.dtype == jnp.bfloat16 else v)
                        for k, v in state.items()})
        meta = {"names": self.names,
                "config": json.loads(self.cfg.to_json()),
                "format": "orbax" if streaming else "npz",
                "dtypes": {k: str(v.dtype) for k, v in state.items()},
                "seed": getattr(self.extractor, "seed", 0)}
        if self.ivf is not None:
            self.ivf.save(os.path.join(path, "ivf"))
            meta["ivf"] = True
        if self.lw is not None:
            self.lw.save(os.path.join(path, "lw"))
            meta["lw"] = True
        if self.pq is not None:
            self.pq.save(os.path.join(path, "pq"))
            meta["pq"] = True
        if self.ivfpq is not None:
            self.ivfpq.save(os.path.join(path, "ivfpq"))
            meta["ivfpq"] = True
        if self.regional_geom is not None:
            meta["regional_geom"] = np.asarray(self.regional_geom).tolist()
        if self.extractor is not None:
            from .utils.checkpoint import save_pytree
            save_pytree(os.path.join(path, "variables"),
                        self.extractor.variables)
            meta["weights_saved"] = True
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str, extractor: Optional[Extractor] = None,
             mesh=None) -> "Index":
        """``mesh`` (a 1-D jax Mesh) row-shards the big arrays across its
        first axis at load time — each device reads only its own rows from
        the tensorstore-backed store."""
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        cfg = PipelineConfig.from_json(json.dumps(meta["config"]))
        dtype = _DTYPES.get(cfg.index.dtype)   # None for packed int4
        seed = int(meta.get("seed", 0))

        from jax.sharding import NamedSharding, PartitionSpec as P
        if mesh is not None:
            axis = mesh.axis_names[0]
            rows = NamedSharding(mesh, P(axis))
            rep = NamedSharding(mesh, P())
            spec = {"ids": rows, "descriptors": rows,
                    "descriptors_int8": rows, "descriptors_int4": rows,
                    "scales": NamedSharding(mesh, P(None, axis)),
                    "regional": rows, "regional_int8": rows,
                    "regional_scales": rows,
                    "whitening_P": rep, "whitening_mu": rep}
        else:
            spec = {}

        if meta.get("format") == "orbax":
            from .utils.checkpoint import load_sharded_pytree
            shardings = {k: spec.get(k) for k in meta["dtypes"]}
            data = load_sharded_pytree(os.path.join(path, "store"), shardings)
        else:
            raw = np.load(os.path.join(path, "index.npz"))
            data = {k: jnp.asarray(raw[k], jnp.dtype(meta["dtypes"][k]))
                    if k in meta.get("dtypes", {}) else jnp.asarray(raw[k])
                    for k in raw.files}
            if mesh is not None:      # mesh placement applies to npz too
                data = {k: (jax.device_put(v, spec[k]) if k in spec else v)
                        for k, v in data.items()}

        if extractor is None and meta.get("weights_saved"):
            from .utils.checkpoint import load_pytree
            variables = load_pytree(os.path.join(path, "variables"))
            extractor = Extractor(cfg.extract.replace(whiten=False),
                                  variables=variables, seed=seed)
        # NOTE: when weights were not saved and no extractor is supplied,
        # extractor stays None — fabricating a seed-initialized one here
        # would serve confidently wrong neighbors (the exact failure the
        # weights persistence exists to prevent); callers that pass their
        # own extractor still get the stored whitening attached below.
        if extractor is not None and "whitening_P" in data:
            extractor.whitening = WhiteningParams(
                P=jnp.asarray(data["whitening_P"]),
                mu=jnp.asarray(data["whitening_mu"]))

        regional = data.get("regional")
        regional_scales = None
        if "regional_int8" in data:
            regional = data["regional_int8"]
            regional_scales = data["regional_scales"]
        if "descriptors_int4" in data:
            idx = cls(data["descriptors_int4"], data["ids"],
                      list(meta["names"]), cfg, extractor, regional,
                      scales=data["scales"])
        elif "descriptors_int8" in data:
            idx = cls(data["descriptors_int8"], data["ids"],
                      list(meta["names"]), cfg, extractor, regional,
                      scales=data["scales"])
        else:
            idx = cls(data["descriptors"].astype(dtype), data["ids"],
                      list(meta["names"]), cfg, extractor, regional)
        idx.regional_scales = regional_scales
        if meta.get("ivf"):
            from .search.ivf import IVFIndex
            idx.ivf = IVFIndex.load(os.path.join(path, "ivf"))
        if meta.get("lw"):
            from .search.lw_rerank import LocalWhiteningView
            idx.lw = LocalWhiteningView.load(os.path.join(path, "lw"))
        if meta.get("pq"):
            from .search.pq_view import PQView
            idx.pq = PQView.load(os.path.join(path, "pq"))
        if meta.get("ivfpq"):
            from .search.ivfpq import IVFPQView
            idx.ivfpq = IVFPQView.load(os.path.join(path, "ivfpq"))
        if meta.get("regional_geom") is not None:
            idx.regional_geom = np.asarray(meta["regional_geom"], np.float32)
        return idx
