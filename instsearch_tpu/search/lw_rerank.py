"""Local-whitening re-ranking: per-cluster metric re-scoring of the
top-depth candidates (the end-to-end consumer of ops/local_whiten.py).

The reference scores every pair with one global metric (SURVEY.md C9's
single PCA-whitening). The local-whitening bank conditions the metric on
the CANDIDATE's neighborhood: every indexed row is stored whitened by
its own cluster's transform, and at query time the (post-QE) query is
whitened by all E transforms at once — candidate c is then re-scored as

    s(q, c) = < L2(P_e(q - mu_e)), L2(P_e(x_c - mu_e)) >,  e = cluster(c)

i.e. the cosine under cluster e's Mahalanobis geometry — both sides
always transformed by the SAME expert, which is what makes the mixed
metric principled (the flat-metric alternative of whitening query and
row by *different* clusters compares incomparable spaces).

Cost model (why this is the right TPU shape):
  - whitening the query by all E experts is ONE [B, E, D] × [E, dim, D]
    batched einsum — at B=128, E=1024, D=dim=512 that is ~34 GFLOP of
    pure MXU work, microseconds against a 1M-row scan;
  - the per-candidate side is all PRECOMPUTED: a [N, dim] bf16 store +
    [N] assignments, gathered by candidate position exactly like the
    regional re-rank store — O(B·depth·dim) gather bytes per query.

The stage slots into the same one-program composite as every other
re-scorer (index._lw_composite_jit): fused top-depth candidate scan →
all-cluster query whitening → gather → rowwise dot → top-k.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.local_whiten import LocalWhiteningParams
from ..ops.pooling import l2_normalize

NEG_INF = np.float32(-np.inf)


def whiten_all_clusters(q: jax.Array, P: jax.Array, mu: jax.Array):
    """Whiten queries by EVERY expert: ``q [B, D] -> [B, E, dim]``,
    L2-normalized per (query, expert). One batched MXU einsum."""
    xm = q.astype(jnp.float32)[:, None, :] - mu[None]        # [B, E, D]
    out = jnp.einsum("bed,eod->beo", xm, P)                  # [B, E, dim]
    return l2_normalize(out, axis=-1)


def lw_rescore_from_candidates(store, assign, ids, cand_scores, pos,
                               q_all, *, k: int):
    """Re-score candidates under their own cluster's metric.

    ``store [N_pad, dim]`` whitened rows (bf16), ``assign [N_pad]`` their
    cluster ids, ``pos [B, depth]`` candidate row positions (-1 invalid),
    ``q_all [B, E, dim]`` the all-cluster whitened queries. Returns
    ``(scores [B, k], dataset ids [B, k])``."""
    safe = jnp.maximum(pos, 0)
    xw = jnp.take(store, safe, axis=0).astype(jnp.float32)   # [B, depth, dim]
    ac = jnp.take(assign, safe)                              # [B, depth]
    qw = jnp.take_along_axis(q_all, ac[:, :, None], axis=1)  # [B, depth, dim]
    s = jnp.sum(qw * xw, axis=-1)
    s = jnp.where((cand_scores > NEG_INF) & (pos >= 0), s, NEG_INF)
    top_s, idx = jax.lax.top_k(s, k)
    top_pos = jnp.take_along_axis(pos, idx, axis=1)
    out_ids = jnp.where(top_s > NEG_INF,
                        jnp.take(ids, jnp.maximum(top_pos, 0)), -1)
    return top_s, out_ids


class LocalWhiteningView:
    """Attachable per-cluster-metric view over an Index (the lw analog of
    the IVF view): the fitted expert bank plus the precomputed whitened
    row store. The main store stays authoritative — ``Index.add`` is
    ABSORBED (:meth:`absorb_add` routes + whitens new rows under the
    frozen bank) and ``Index.remove`` is ABSORBED (:meth:`absorb_remove`
    replays the compaction moves); DBA still invalidates this view;
    refit with ``Index.fit_local_whitening`` (one k-means + one moments
    pass)."""

    def __init__(self, params: LocalWhiteningParams, store: jax.Array,
                 assign: jax.Array):
        self.params = params       # router + bank (centroids, P, mu)
        self.store = store         # [N_pad, dim] bf16, rows whitened by
        #                            their OWN cluster, L2-normalized
        self.assign = assign       # [N_pad] int32 cluster per row (0 pad)

    @property
    def n_clusters(self) -> int:
        return self.params.P.shape[0]

    @property
    def dim(self) -> int:
        return self.store.shape[1]

    # ------------------------------------------------------------------
    @classmethod
    def from_index(cls, index, n_clusters: int | None = None,
                   dim: int | None = None, tau: float = 64.0,
                   iters: int = 10, seed: int = 0,
                   chunk: int = 65536) -> "LocalWhiteningView":
        """Fit the bank on the index's rows and precompute the whitened
        store. ``n_clusters`` defaults to ~sqrt(N) as a power of two
        (same sizing as the IVF coarse quantizer)."""
        from ..ops.local_whiten import (apply_local_whitening,
                                        fit_local_whitening, route)
        nv = index.num_valid
        if nv < 2:
            raise ValueError("local whitening needs at least 2 indexed rows")
        if n_clusters is None:
            n_clusters = max(2, 1 << int(round(np.log2(max(2, np.sqrt(nv))))))
        n_clusters = min(n_clusters, nv)

        # f32 view of the rows, streamed to host in bounded chunks (the
        # store may be int8/int4 — _rows_f32_chunk dequantizes on device)
        n_pad = index.descriptors.shape[0]
        d = index.dim
        xf = np.zeros((n_pad, d), np.float32)
        step = max(1, min(chunk, n_pad))
        for s0 in range(0, n_pad, step):
            c = min(step, n_pad - s0)
            xf[s0:s0 + c] = np.asarray(index._rows_f32_chunk(s0, c))

        params = fit_local_whitening(xf[:nv], n_clusters, dim=dim, tau=tau,
                                     iters=iters, seed=seed)
        dim_out = params.P.shape[1]
        store = np.zeros((n_pad, dim_out), np.float32)
        assign = np.zeros((n_pad,), np.int32)
        for s0 in range(0, nv, step):
            c = min(step, nv - s0)
            rows = jnp.asarray(xf[s0:s0 + c])
            assign[s0:s0 + c] = np.asarray(route(rows, params))
            store[s0:s0 + c] = np.asarray(
                apply_local_whitening(rows, params))
        return cls(params, jnp.asarray(store, jnp.bfloat16),
                   jnp.asarray(assign))

    # ------------------------------------------------------------------
    def absorb_add(self, index, start: int, n_new: int) -> None:
        """Absorb freshly-added rows [start, start+n_new) of the (already
        updated) main store: route + whiten them with the FROZEN bank and
        write into the position-aligned whitened store — grown first when
        the add re-padded the main store. The frozen experts drift from
        the corpus over many adds (re-scoring quality, never validity);
        refit (``Index.fit_local_whitening``) on a large corpus change."""
        from ..ops.local_whiten import apply_local_whitening, route
        n_pad = index.descriptors.shape[0]
        if int(self.store.shape[0]) != n_pad:
            grow = n_pad - int(self.store.shape[0])
            self.store = jnp.concatenate(
                [self.store,
                 jnp.zeros((grow, self.store.shape[1]), self.store.dtype)])
            self.assign = jnp.concatenate(
                [self.assign, jnp.zeros((grow,), jnp.int32)])
        # power-of-two-padded read + whole-block write-back (compile
        # hygiene: one program per ~log2 size class, not per n_new);
        # re-whitening an existing row under the frozen bank is
        # identical, rows past num_valid are never gathered
        rows, off = index._rows_f32_chunk_padded(start, n_new)
        self.store = jax.lax.dynamic_update_slice(
            self.store,
            apply_local_whitening(rows, self.params).astype(
                self.store.dtype), (start - off, 0))
        self.assign = jax.lax.dynamic_update_slice(
            self.assign, jnp.asarray(route(rows, self.params), jnp.int32),
            (start - off,))

    def absorb_remove(self, src: jax.Array, dst: jax.Array) -> None:
        """Absorb a main-store removal: the whitened store and routing
        assignments are position-aligned with the main store, so they
        replay the exact compaction moves of ``Index.remove``. Re-scoring
        only ever gathers at candidate positions (< num_valid), so stale
        tail rows are unreachable."""
        from ..index import _move_rows_jit
        self.store = _move_rows_jit(self.store, src, dst)
        self.assign = _move_rows_jit(self.assign, src, dst)

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "lw.npz"),
                 centroids=np.asarray(self.params.centroids),
                 P=np.asarray(self.params.P),
                 mu=np.asarray(self.params.mu),
                 store=np.asarray(self.store.astype(jnp.float32)),
                 assign=np.asarray(self.assign))
        with open(os.path.join(path, "lw.json"), "w") as f:
            json.dump({"n_clusters": self.n_clusters, "dim": self.dim}, f)

    @classmethod
    def load(cls, path: str) -> "LocalWhiteningView":
        raw = np.load(os.path.join(path, "lw.npz"))
        params = LocalWhiteningParams(
            centroids=jnp.asarray(raw["centroids"]),
            P=jnp.asarray(raw["P"]), mu=jnp.asarray(raw["mu"]))
        return cls(params, jnp.asarray(raw["store"], jnp.bfloat16),
                   jnp.asarray(raw["assign"]))
