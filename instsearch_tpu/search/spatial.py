"""Spatial verification for regional re-ranking: weak geometric
consistency by Hough voting over region-pair transform hypotheses.

The region-match stage (search/rerank.py, arXiv:1511.05879 §4) is
ARRANGEMENT-INVARIANT: it takes the best candidate region per query
region independently, so a candidate containing the same visual parts in
a scrambled layout scores as high as the true instance. Classic
instance-search systems close this gap with spatial verification
(RANSAC in Philbin CVPR'07; weak geometric consistency in Jégou
ECCV'08). RANSAC is host-side, per-pair, data-dependent iteration —
everything a TPU program should not be. The WGC formulation, however,
maps onto one matmul:

  - every (query region i, candidate region j) pair implies a transform
    hypothesis t_ij = (dx, dy, dlog s) from the R-MAC grid geometry —
    a TRACE-TIME constant (the grid is fixed per config;
    ops/pooling.rmac_region_geometry);
  - quantize t_ij into a coarse 3-D histogram and precompute the
    one-hot assignment ``V [Rq*Rc, B]`` on the host;
  - at query time the [Q, depth, Rq, Rc] region-similarity tensor the
    re-rank stage already computes votes with weight relu(sim):
    ``votes = relu(sim).reshape(Q, depth, Rq*Rc) @ V`` — one MXU
    matmul — and the spatial score is the best bin, i.e. the total
    similarity mass explainable by ONE consistent transform.

A true instance concentrates its strong matches in one bin; a scrambled
layout spreads them. Cost: Rq*Rc*B extra FLOPs per candidate —
thousandths of the candidate scan."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_vote_matrix(geom_q: np.ndarray, geom_c: np.ndarray,
                      bins_xy: int = 5, bins_scale: int = 3) -> np.ndarray:
    """One-hot transform-bin assignment ``[Rq*Rc, B]`` (f32, host-side).

    ``geom_* [R, 3]`` rows are ``(cx, cy, log side)`` in feature-map
    coordinates (ops/pooling.rmac_region_geometry). Translations are
    normalized by the map extent so the binning is resolution-independent;
    scale changes quantize by R-MAC level steps (log 2/(l+1) spacing)."""
    gq = np.asarray(geom_q, np.float32)
    gc = np.asarray(geom_c, np.float32)
    extent = max(
        float(np.ptp(gq[:, 0]) + np.ptp(gc[:, 0])),
        float(np.ptp(gq[:, 1]) + np.ptp(gc[:, 1])), 1.0)
    dx = (gc[None, :, 0] - gq[:, None, 0]) / extent          # [Rq, Rc]
    dy = (gc[None, :, 1] - gq[:, None, 1]) / extent
    ds = gc[None, :, 2] - gq[:, None, 2]

    def q(v, n, lo, hi):
        return np.clip(((v - lo) / (hi - lo) * n).astype(np.int64), 0, n - 1)

    bx = q(dx, bins_xy, -0.55, 0.55)
    by = q(dy, bins_xy, -0.55, 0.55)
    smax = max(float(np.abs(ds).max()), 1e-3)
    bs = q(ds, bins_scale, -1.001 * smax, 1.001 * smax)
    flat = (bx * bins_xy + by) * bins_scale + bs             # [Rq, Rc]
    b = bins_xy * bins_xy * bins_scale
    v = np.zeros((gq.shape[0] * gc.shape[0], b), np.float32)
    v[np.arange(v.shape[0]), flat.reshape(-1)] = 1.0
    return v


def spatial_consistency_scores(sim: jax.Array, vote_matrix) -> jax.Array:
    """``sim [Q, depth, Rq, Rc]`` region similarities -> ``[Q, depth]``
    spatial score: the largest single-transform-bin vote mass, normalized
    by query-region count (same normalization as the region match)."""
    qn, d, rq, rc = sim.shape
    w = jnp.maximum(sim, 0.0).reshape(qn, d, rq * rc)
    votes = jnp.einsum("qdp,pb->qdb", w, jnp.asarray(vote_matrix))
    return jnp.max(votes, axis=-1) / rq
