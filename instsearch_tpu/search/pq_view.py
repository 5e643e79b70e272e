"""PQ compressed-domain coarse tier: ADC candidate scan + exact re-score.

The reference's only search is one brute-force matmul over full-precision
rows (SURVEY.md §1.1 C11). This view is the rebuild's deepest compression
rung (after int8 and packed int4): rows are product-quantized to 4-bit
codes (ops/pq.py — M=D/8 subspaces, 16 centroids each, 32 B per 512-d
row) and a query's candidate scan reads ONLY the code stream through the
fused ADC kernel (kernels/pq_scan.py). Because PQ is lossy, the view is
always a cascade: the ADC scan selects ``depth`` candidates, which are
re-scored EXACTLY against the resident main store (f32 gather + dot) in
the same jitted program — ADC ranks the haystack, the exact tier ranks
the needles. With ``depth`` ≥ the corpus this degenerates to exact search
(the equality the integration tests pin).

Like the IVF and local-whitening views, the PQ view is POSITION-aligned
with the padded main store: candidates compose with αQE neighbor gathers
and regional re-ranking verbatim (the quality math lives in search/qe.py
and search/rerank.py, shared with the exact path). ``Index.add`` is
ABSORBED (``absorb_add`` encodes the new rows with the frozen codebook
at their positions) and so is ``Index.remove`` (``absorb_remove``
replays the compaction moves on the position-aligned codes); augment
still invalidates the view — re-encode with ``Index.build_pq`` (one
codebook fit + a chunked encode pass).

Memory story at D=512: codes are 32 B/row — a 16 GB chip holds the code
stream for ~400M rows; the main store stays the capacity limit, so the
view's value is LATENCY (scan 16× fewer bytes than int4, 64× fewer than
bf16) and scan-cost isolation for huge-N serving, not standalone
capacity. Codes ride save()/load() with the index.
"""
from __future__ import annotations

import json
import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pq import PQCodebook, encode_pq, fit_pq, pq_lut

NEG_INF = np.float32(-np.inf)


def _pq_candidates(codes, centroids, descriptors, scales, q, nv,
                   rotation=None, mask=None, *, depth: int, int4: bool,
                   use_pallas: bool):
    """Trace-time candidate stage: ADC coarse top-``depth`` scan over the
    code stream, then EXACT f32 re-score of those rows from the main
    store. Returns ``(exact scores [B, depth] f32 desc-sorted, pos
    [B, depth] int32 positions, -1 for empty)``.

    ``rotation`` (OPQ, ops/pq.fit_opq): codes quantize X·R, so the ADC
    side scores with the rotated query — ``(q·R)·(x·R) = q·x`` up to the
    (reduced) quantization error; the exact re-score keeps the ORIGINAL
    query against the unrotated main store, so only candidate recall
    changes, never the re-scored ordering.

    ``mask`` (search/subset.py): applied at ADC SELECTION — the depth
    budget is spent entirely on allowed rows, so a selective filter
    keeps the cascade's recall model instead of post-filtering it."""
    cb = PQCodebook(centroids)
    q_adc = q if rotation is None else (q @ rotation).astype(q.dtype)
    if use_pallas:
        from ..kernels.pq_scan import pq_topk
        _, pos = pq_topk(codes, q_adc, cb, k=depth, num_valid=nv,
                         mask=mask)
    else:
        # XLA oracle (CPU rigs / tiny stores): same ADC quantity via the
        # LUT identity, full [B, N] materialized — test-scale only
        from ..ops.pq import unpack_pq
        lut = pq_lut(q_adc, cb)                              # [B, M, 16]
        c = unpack_pq(codes)                                 # [N, M]
        oh = jax.nn.one_hot(c, 16, dtype=jnp.float32)        # [N, M, 16]
        s = jnp.einsum("bmk,nmk->bn", lut, oh)
        rows_ok = jnp.arange(codes.shape[0]) < nv
        if mask is not None:
            rows_ok = rows_ok & (mask[0] > 0)
        s = jnp.where(rows_ok[None, :], s, NEG_INF)
        s_sel, pos = jax.lax.top_k(s, depth)
        # -inf selections (padding / masked-out rows filling the depth)
        # must NOT reach the exact re-score, which would hand them real
        # scores again — tombstone to -1 like the kernel does
        pos = jnp.where(s_sel > NEG_INF, pos, -1)
    from ..index import _gather_rows_f32
    safe = jnp.maximum(pos, 0)
    rows = _gather_rows_f32(descriptors, safe, scales, int4=int4)
    exact = jnp.einsum("bkd,bd->bk", rows, q.astype(jnp.float32))
    exact = jnp.where(pos >= 0, exact, NEG_INF)
    # re-sort by the exact score so downstream stages (QE top-n slice,
    # re-rank fusion) see the cascade's actual ranking
    exact, order = jax.lax.top_k(exact, depth)
    pos = jnp.take_along_axis(pos, order, axis=1)
    return exact, jnp.where(exact > NEG_INF, pos, -1)


@partial(jax.jit, static_argnames=("k", "depth", "qe_n", "qe_alpha",
                                   "do_qe", "do_rerank", "int4",
                                   "use_pallas", "spatial_weight",
                                   "rerank_depth"))
def _pq_composite_jit(codes, centroids, descriptors, ids, scales,
                      regional, regional_scales, query_regional, q, nv,
                      vote_matrix=None, rotation=None, mask=None, *, k: int,
                      depth: int, qe_n: int,
                      qe_alpha: float, do_qe: bool, do_rerank: bool,
                      int4: bool, use_pallas: bool,
                      spatial_weight: float = 0.0, rerank_depth: int = 0):
    """The PQ mirror of index._search_composite_jit: every candidate-
    selection stage is the ADC-scan→exact-re-score cascade instead of the
    full-precision scan; QE rows and re-rank regions gather from the MAIN
    store by position, sharing the quality math with the exact path."""
    q = jnp.asarray(q, jnp.float32)
    sel = partial(_pq_candidates, codes, centroids, descriptors, scales,
                  rotation=rotation, mask=mask,
                  depth=depth, int4=int4, use_pallas=use_pallas)
    if do_qe:
        s, pos = sel(q, nv)
        s_n, pos_n = s[:, :qe_n], pos[:, :qe_n]
        from ..index import _gather_rows_f32
        rows = _gather_rows_f32(descriptors, jnp.maximum(pos_n, 0), scales,
                                int4=int4)
        rows = jnp.where((s_n > NEG_INF)[..., None], rows, 0.0)
        from .qe import expand_from_candidates
        q = expand_from_candidates(q, s_n, rows, qe_alpha)
    s, pos = sel(q, nv)
    if do_rerank:
        # re-rank over the top-rerank_depth of the cascade's EXACT
        # ranking — the same candidate pool the exact/IVF composites
        # hand their rerank stage (depth >= rerank_depth enforced by
        # the caller), so full-depth PQ == exact rerank verbatim
        rd = min(rerank_depth or depth, depth)
        s, pos = s[:, :rd], pos[:, :rd]
        from .rerank import rerank_from_candidates
        return rerank_from_candidates(
            regional, ids, s, pos, query_regional, k=k,
            regional_scales=regional_scales,
            spatial_weight=spatial_weight, vote_matrix=vote_matrix)
    out_ids = jnp.where(pos >= 0, jnp.take(ids, jnp.maximum(pos, 0)), -1)
    return s[:, :k], out_ids[:, :k]


class PQView:
    """Product-quantized coarse-scan view over an
    :class:`instsearch_tpu.Index`.

    Build with :meth:`from_index` (or ``Index.build_pq``); routes
    ``Index.search`` when ``SearchConfig.pq_depth > 0``. The main store
    stays authoritative — codes hold the SAME padded row positions, and
    every returned candidate is exactly re-scored against it, so quality
    degrades only through candidate recall (measure with
    :meth:`measure_recall`)."""

    def __init__(self, codebook: PQCodebook, codes: jax.Array,
                 depth: int = 100, rotation: "jax.Array | None" = None,
                 anisotropic_t: "float | None" = None):
        self.codebook = codebook        # centroids [M, 16, ds] f32
        self.codes = codes              # [N_pad, M/2] int8 packed nibbles
        self.depth = depth
        self.rotation = rotation        # OPQ rotation [D, D] f32 or None
        self.anisotropic_t = anisotropic_t  # ScaNN threshold (fit record)

    # ------------------------------------------------------------------
    @property
    def m(self) -> int:
        return self.codebook.m

    @property
    def bytes_per_row(self) -> int:
        return self.codes.shape[1]

    # ------------------------------------------------------------------
    @classmethod
    def from_index(cls, index, m: int | None = None, iters: int = 15,
                   seed: int = 0, sample: "int | None" = 262_144,
                   depth: int = 100, chunk: int = 65_536,
                   opq_iters: int = 0,
                   anisotropic_t: "float | None" = None) -> "PQView":
        """Fit the codebook and encode every stored row.

        ``m`` defaults to D/8 (4-bit codes at 16× bf16 compression,
        clamped so each subspace keeps ≥4 dims); the fit runs on at most
        ``sample`` dequantized rows, the encode covers all of them in
        ``chunk``-row slices (never materializing a full f32 copy of a
        quantized store). ``opq_iters > 0`` additionally learns an OPQ
        rotation (ops/pq.fit_opq) on the fit sample — codes then quantize
        X·R and queries rotate once at scan time. ``anisotropic_t`` fits
        and encodes under the score-aware ScaNN loss instead
        (ops/pq.fit_apq; raw-ADC quality — the exactly-re-scored cascade
        measures no gain, see ops/pq.py)."""
        nv = index.num_valid
        d = index.dim
        if m is None:
            from ..ops.pq import default_m
            m = default_m(d)
        if nv < 16:
            raise ValueError("PQ needs at least 16 indexed rows")

        n_pad = index.descriptors.shape[0]
        chunk = math.gcd(n_pad, max(8, chunk))
        # fit sample: contiguous dequantized slices up to `sample` rows
        fit_rows = min(nv, sample if sample is not None else nv)
        take = []
        got = 0
        for start in range(0, n_pad, chunk):
            if got >= fit_rows:
                break
            sl = index._rows_f32_chunk(start, chunk)
            keep = min(chunk, fit_rows - got, max(0, nv - start))
            if keep <= 0:
                break
            take.append(np.asarray(sl[:keep]))
            got += keep
        fit_x = jnp.asarray(np.concatenate(take, axis=0))
        rot = None
        if anisotropic_t is not None and opq_iters > 0:
            raise ValueError(
                "anisotropic_t and opq_iters are mutually exclusive "
                "(the score-aware alternation is not defined through a "
                "jointly-learned rotation; pick one)")
        if anisotropic_t is not None:
            from ..ops.pq import fit_apq
            cb = fit_apq(fit_x, m=m, t=anisotropic_t, init_iters=iters,
                         seed=seed)
        elif opq_iters > 0:
            from ..ops.pq import fit_opq
            rot, cb = fit_opq(fit_x, m=m, opq_iters=opq_iters,
                              pq_iters=iters, seed=seed)
        else:
            cb = fit_pq(fit_x, m=m, iters=iters, seed=seed)

        codes = np.empty((n_pad, m // 2), np.int8)
        for start in range(0, n_pad, chunk):
            sl = index._rows_f32_chunk(start, chunk)
            if rot is not None:
                sl = sl @ rot
            if anisotropic_t is not None:
                from ..ops.pq import encode_apq
                codes[start:start + chunk] = np.asarray(
                    encode_apq(sl, cb, t=anisotropic_t))
            else:
                codes[start:start + chunk] = np.asarray(encode_pq(sl, cb))
        return cls(cb, jnp.asarray(codes), depth=depth, rotation=rot,
                   anisotropic_t=anisotropic_t)

    # ------------------------------------------------------------------
    def absorb_add(self, index, start: int, n_new: int) -> None:
        """Absorb freshly-added rows [start, start+n_new) of the (already
        updated) main store: encode them with the FROZEN codebook (and
        rotation / anisotropic loss, when fit with one) and write the
        codes at their positions in the position-aligned array — the
        codes array grows first when the add re-padded the main store.
        The frozen fit drifts from the corpus distribution over many
        adds (candidate recall, never the exactly-re-scored ordering);
        rebuild (``Index.build_pq``) on a large corpus change.

        Compile hygiene (serve-time adds): the read + encode run through
        power-of-two-PADDED shapes (``_rows_f32_chunk_padded``) and the
        whole padded block writes back at its window start — re-encoding
        an existing row under the frozen fit is identical, and codes
        past ``num_valid`` are masked — so repeated adds of varying
        sizes reuse ~log₂ many compiled programs."""
        n_pad = index.descriptors.shape[0]
        if int(self.codes.shape[0]) != n_pad:
            grow = n_pad - int(self.codes.shape[0])
            self.codes = jnp.concatenate(
                [self.codes,
                 jnp.zeros((grow, self.codes.shape[1]), jnp.int8)])
        rows, off = index._rows_f32_chunk_padded(start, n_new)
        if self.rotation is not None:
            rows = rows @ self.rotation
        if self.anisotropic_t is not None:
            from ..ops.pq import encode_apq
            codes_new = encode_apq(rows, self.codebook,
                                   t=self.anisotropic_t)
        else:
            codes_new = encode_pq(rows, self.codebook)
        self.codes = jax.lax.dynamic_update_slice(
            self.codes, jnp.asarray(codes_new, jnp.int8), (start - off, 0))

    def absorb_remove(self, src: jax.Array, dst: jax.Array) -> None:
        """Absorb a main-store removal: the codes array is
        position-ALIGNED with the main store, so it replays the exact
        compaction moves of ``Index.remove`` (gather-before-write,
        padding entries are self-moves). Stale codes past ``num_valid``
        are masked by the scan's validity bound, like fresh builds."""
        from ..index import _move_rows_jit
        self.codes = _move_rows_jit(self.codes, src, dst)

    # ------------------------------------------------------------------
    def candidates(self, index, queries: jax.Array, depth: int | None = None,
                   use_pallas: bool | None = None):
        """(exact scores [B, depth], row POSITIONS [B, depth]) — the
        composable cascade stage, already exactly re-scored."""
        depth = min(depth or self.depth, self.codes.shape[0])
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform == "tpu"
        nv = jnp.asarray(index.num_valid, jnp.int32)
        return _pq_run_candidates_jit(
            self.codes, self.codebook.centroids, index.descriptors,
            index.scales, q, nv, self.rotation, depth=depth,
            int4=index.is_int4, use_pallas=use_pallas)

    def search(self, index, queries, k: int = 10,
               depth: int | None = None):
        """Descriptor-space cascade search → ``(scores [B,k], dataset
        ids)``; mirrors ``Index.search`` output."""
        s, pos = self.candidates(index, queries, depth)
        ids = jnp.where(pos >= 0, jnp.take(index.ids, jnp.maximum(pos, 0)),
                        -1)
        from ..utils.chunking import fetch
        return fetch(s[:, :k], ids[:, :k])

    # ------------------------------------------------------------------
    def measure_recall(self, index, queries, k: int = 10,
                       depth: int | None = None) -> float:
        """recall@k vs the exact brute-force ranking — the build-time
        honesty number for a chosen cascade depth."""
        exact_s, exact_ids = index.search(
            queries, index.cfg.search.replace(k=k, qe_enabled=False,
                                              rerank_enabled=False,
                                              pq_depth=0))
        _, pq_ids = self.search(index, queries, k=k, depth=depth)
        hits = total = 0
        for e, a in zip(np.asarray(exact_ids), np.asarray(pq_ids)):
            es = set(int(i) for i in e if i >= 0)
            if not es:
                continue
            hits += len(es & set(int(i) for i in a if i >= 0))
            total += len(es)
        return hits / max(total, 1)

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        arrs = {"centroids": np.asarray(self.codebook.centroids),
                "codes": np.asarray(self.codes)}
        if self.rotation is not None:
            arrs["rotation"] = np.asarray(self.rotation)
        np.savez(os.path.join(path, "pq.npz"), **arrs)
        with open(os.path.join(path, "pq.json"), "w") as f:
            json.dump({"depth": self.depth,
                       "anisotropic_t": self.anisotropic_t}, f)

    @classmethod
    def load(cls, path: str) -> "PQView":
        with open(os.path.join(path, "pq.json")) as f:
            meta = json.load(f)
        raw = np.load(os.path.join(path, "pq.npz"))
        rot = (jnp.asarray(raw["rotation"])
               if "rotation" in raw.files else None)
        return cls(PQCodebook(jnp.asarray(raw["centroids"])),
                   jnp.asarray(raw["codes"], jnp.int8),
                   depth=int(meta["depth"]), rotation=rot,
                   anisotropic_t=meta.get("anisotropic_t"))


@partial(jax.jit, static_argnames=("depth", "int4", "use_pallas"))
def _pq_run_candidates_jit(codes, centroids, descriptors, scales, q, nv,
                           rotation=None, *, depth: int, int4: bool,
                           use_pallas: bool):
    return _pq_candidates(codes, centroids, descriptors, scales, q, nv,
                          rotation, depth=depth, int4=int4,
                          use_pallas=use_pallas)
