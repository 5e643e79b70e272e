"""Diffusion re-ranking on the candidate similarity graph.

Iscen et al., "Efficient Diffusion on Region Manifolds", CVPR 2017
(arXiv:1611.05113): retrieval scores are re-estimated by diffusing the
query's affinity through the k-NN graph of its top-``L`` database
candidates — ranking by manifold distance instead of raw cosine, which
recovers relevant images that are close to the query's neighbors but not
to the query itself. The classic quality step beyond αQE (which only
moves the query point once; diffusion propagates through the whole
candidate set).

TPU-native truncated formulation (arXiv:1611.05113 §4.3 "truncation"),
everything static-shaped and batched over queries:

1. candidates: top-``L`` rows by global cosine (the fused Pallas kernel
   in the production composite; ``lax.top_k`` in the oracle),
2. graph: mutual-``knn`` affinity ``A_ij = relu(v_i . v_j)^3`` over the
   gathered candidate vectors ([Q, L, L] batched matmul on the MXU),
   symmetrically normalized ``W = D^-1/2 A D^-1/2``,
3. seeds: ``y_i = relu(g_i)^3`` for the ``seeds`` best candidates,
4. solve ``(I - alpha W) f = y`` by ``iters`` conjugate-gradient steps
   (fixed iteration count — compiler-friendly ``fori_loop``, no
   data-dependent convergence test; I - alpha*W is positive-definite for
   alpha < 1 since the normalized affinity has spectral radius <= 1),
5. re-rank the candidates by ``f``.

Invalid candidate slots (global score -inf, i.e. index padding or
L > num_valid) are cut out of the graph, seeded 0, and emerge as -inf —
they can never be promoted. Nodes disconnected from every seed get
``f = 0``; a tiny ``1e-4 * g`` tie-break keeps their relative order.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _mutual_knn_affinity(v: jax.Array, valid: jax.Array, knn: int,
                         gamma: float = 3.0) -> jax.Array:
    """``v [Q, L, D]`` unit rows, ``valid [Q, L]`` bool ->
    symmetrically-normalized mutual-knn affinity ``W [Q, L, L]``."""
    sim = jnp.einsum("qld,qmd->qlm", v, v)                    # [Q, L, L]
    l = v.shape[1]
    eye = jnp.eye(l, dtype=bool)
    ok = valid[:, :, None] & valid[:, None, :] & ~eye
    a = jnp.where(ok, jnp.clip(sim, 0.0, None) ** gamma, 0.0)
    # top-knn per row via the knn-th largest value as a threshold (ties
    # may keep a few extras — harmless, the graph just gains an edge)
    kk = min(knn, l - 1) if l > 1 else 1
    thresh = jax.lax.top_k(a, kk)[0][..., -1:]                # [Q, L, 1]
    keep = (a >= jnp.maximum(thresh, 1e-12)) & ok
    keep = keep & jnp.swapaxes(keep, 1, 2)                    # mutual
    a = jnp.where(keep, a, 0.0)
    a = 0.5 * (a + jnp.swapaxes(a, 1, 2))                     # exact symmetry
    deg = jnp.sum(a, axis=-1)                                 # [Q, L]
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    return a * dinv[:, :, None] * dinv[:, None, :]


def _cg_solve(w: jax.Array, y: jax.Array, alpha: float,
              iters: int) -> jax.Array:
    """Batched CG for ``(I - alpha W) f = y``; ``w [Q, L, L]``,
    ``y [Q, L]`` -> ``f [Q, L]``."""
    def apply_a(x):
        return x - alpha * jnp.einsum("qlm,qm->ql", w, x)

    def dot(a, b):
        return jnp.sum(a * b, axis=-1, keepdims=True)         # [Q, 1]

    x0 = y
    r0 = y - apply_a(x0)
    p0 = r0

    def body(_, st):
        x, r, p, rs = st
        ap = apply_a(p)
        a = rs / jnp.maximum(dot(p, ap), 1e-20)
        x = x + a * p
        r = r - a * ap
        rs_new = dot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-20)
        p = r + beta * p
        return x, r, p, rs_new

    x, *_ = jax.lax.fori_loop(0, iters, body, (x0, r0, p0, dot(r0, r0)))
    return x


def diffuse_from_candidates(cand: jax.Array, top_g: jax.Array,
                            *, knn: int = 10, alpha: float = 0.99,
                            iters: int = 20, seeds: int = 10) -> jax.Array:
    """Diffused scores for pre-selected candidates.

    ``cand [Q, L, D]`` f32 candidate vectors (invalid rows anything),
    ``top_g [Q, L]`` their global cosine (invalid slots -inf) ->
    ``f [Q, L]`` diffused scores, -inf at invalid slots. Shared by the
    full-matrix oracle, the fused-kernel composite (index.py) and the
    sharded stage (parallel/sharded_index.py) — one graph/seed/solve
    definition."""
    valid = top_g > -jnp.inf
    v = jnp.where(valid[..., None], cand.astype(jnp.float32), 0.0)
    w = _mutual_knn_affinity(v, valid, knn)
    g = jnp.where(valid, top_g, 0.0)
    l = top_g.shape[1]
    ss = min(seeds, l)
    thresh = jax.lax.top_k(g, ss)[0][:, -1:]                  # [Q, 1]
    y = jnp.where(valid & (g >= thresh), jnp.clip(g, 0.0, None) ** 3, 0.0)
    f = _cg_solve(w, y, alpha, iters)
    # tie-break disconnected (f == 0) candidates by their global order
    f = f + 1e-4 * g
    return jnp.where(valid, f, -jnp.inf)


def diffusion_rerank_from_candidates(ids: jax.Array, top_g: jax.Array,
                                     top_pos: jax.Array, cand: jax.Array,
                                     *, k: int = 10, knn: int = 10,
                                     alpha: float = 0.99, iters: int = 20,
                                     seeds: int = 10):
    """Re-rank candidates by diffusion: ``top_g/top_pos [Q, L]`` from any
    top-L selector + ``cand [Q, L, D]`` their gathered vectors ->
    ``(scores [Q, k], ids [Q, k])`` (same k-vs-depth padding contract as
    rerank_from_candidates)."""
    f = diffuse_from_candidates(cand, top_g, knn=knn, alpha=alpha,
                                iters=iters, seeds=seeds)
    l = top_g.shape[1]
    kk = min(k, l)
    new_s, order = jax.lax.top_k(f, kk)
    new_pos = jnp.take_along_axis(top_pos, order, axis=1)
    new_ids = jnp.where(new_s > -jnp.inf, jnp.take(ids, new_pos), -1)
    if kk < k:
        pad = ((0, 0), (0, k - kk))
        new_s = jnp.pad(new_s, pad, constant_values=-jnp.inf)
        new_ids = jnp.pad(new_ids, pad, constant_values=-1)
    return new_s, new_ids


@partial(jax.jit, static_argnames=("depth", "k", "knn", "iters", "seeds"))
def diffusion_rerank_scores(descriptors: jax.Array, ids: jax.Array,
                            global_scores: jax.Array,
                            *, depth: int = 200, k: int = 10,
                            knn: int = 10, alpha: float = 0.99,
                            iters: int = 20, seeds: int = 10,
                            scales: "jax.Array | None" = None):
    """Reference oracle over a full ``[Q, N]`` score matrix (padding
    already -inf): select top-``depth``, gather + dequantize their rows,
    diffuse, re-rank. The production composite in Index.search selects
    candidates with the fused kernel instead."""
    top_g, top_pos = jax.lax.top_k(global_scores, depth)
    cand = jnp.take(descriptors, jnp.maximum(top_pos, 0),
                    axis=0).astype(jnp.float32)
    if descriptors.dtype == jnp.int8:
        cand = cand * jnp.take(scales[0], jnp.maximum(top_pos, 0))[..., None]
    return diffusion_rerank_from_candidates(ids, top_g, top_pos, cand, k=k,
                                            knn=knn, alpha=alpha,
                                            iters=iters, seeds=seeds)
