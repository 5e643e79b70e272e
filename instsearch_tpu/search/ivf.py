"""IVF (inverted-file) ANN tier: coarse k-means quantizer + cluster-pruned
scan.

The reference searches by ONE brute-force scan over every row (SURVEY.md
C11) — exact, but every query pays the full N·D bytes. This tier is a
rebuild-side capability for single-query serving latency and huge-N
capacity: rows are bucketed by their nearest k-means centroid
(ops/kmeans.py), and a query scores only the ``nprobe`` buckets whose
centroids it matches — reading ``nprobe/​n_clusters`` of the index bytes
(≈3% at the 32/1024 default) for a recall hit measured per build
(IVFIndex.measure_recall, and adversarially on uniform-sphere data in the
bench).

TPU-first layout — everything static-shape:

  * buckets ``[C, M, D]`` — fixed capacity M per cluster (the classic
    ragged inverted lists would be dynamic shapes); slots hold ROW
    POSITIONS into the padded main store, so QE and regional re-ranking
    compose with IVF candidates exactly like with exact candidates.
  * overflow rows past M land in a dense SPILL matrix scanned on every
    query — capping M at ``cap_factor``×mean keeps pathological clusters
    from inflating every query, while spill keeps ``nprobe == n_clusters``
    EXACTLY equal to brute force (the property tests pin this on f32
    stores; bf16/int8 stores can reorder ulp-level near-ties vs the
    Pallas kernel's summation order — measured ~3% of top-10 slots at
    |Δscore| ≈ 1e-4 on random unit-sphere data, real chip).
  * the query program is one jit: centroid matmul → top-nprobe → bucket
    gather → batched region matmul → masked top-k merge with the spill
    scan. Per-query gathers do not amortize over a batch (unlike the
    brute-force kernel's shared scan), so IVF targets B=1..8 serving;
    batched throughput stays on the fused brute-force kernel.

int8 storage quantizes bucket rows with the SAME per-row scheme as the
main store (ops/quantize.quantize_rows); scores dequantize by row scale
before the merge, so int8 IVF ranks within one quantization step of f32.
"""
from __future__ import annotations

import json
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = np.float32(-np.inf)


def _bucket_layout(assignments: np.ndarray, num_valid: int, n_clusters: int,
                   cap_factor: float):
    """Host-side layout pass: cluster assignment -> (bucket_pos [C, M],
    spill_pos [S]) of row POSITIONS, -1 padding. O(N) numpy, no Python
    per-row loop."""
    a = np.asarray(assignments[:num_valid])
    order = np.argsort(a, kind="stable").astype(np.int64)
    a_sorted = a[order]
    sizes = np.bincount(a, minlength=n_clusters)
    mean = max(1.0, num_valid / n_clusters)
    cap = int(min(sizes.max(initial=1),
                  max(8, int(np.ceil(cap_factor * mean)))))
    m = ((cap + 7) // 8) * 8
    starts = np.zeros(n_clusters + 1, np.int64)
    np.cumsum(sizes, out=starts[1:])
    rank = np.arange(num_valid, dtype=np.int64) - starts[a_sorted]
    keep = rank < m
    bucket_pos = np.full((n_clusters, m), -1, np.int32)
    bucket_pos[a_sorted[keep], rank[keep]] = order[keep]
    spill_pos = order[~keep].astype(np.int32)
    return bucket_pos, spill_pos


@partial(jax.jit, static_argnames=("is_int8",))
def _fill_buckets_jit(descriptors, scales, ids, bucket_pos, *, is_int8):
    """Gather the bucketed view out of the main store on device:
    positions -> (rows [C, M, D] store-dtype, row scales or None,
    dataset ids [C, M])."""
    safe = jnp.maximum(bucket_pos, 0)
    rows = jnp.take(descriptors, safe, axis=0)             # [C, M, D]
    valid = bucket_pos >= 0
    rows = jnp.where(valid[..., None], rows, 0)
    bids = jnp.where(valid, jnp.take(ids, safe), -1)
    bscales = None
    if is_int8:
        bscales = jnp.where(valid, jnp.take(scales[0], safe), 0.0)
    return rows, bscales, bids


def _score_rows(rows, row_scales, q):
    """``rows [..., D]`` (store dtype) x ``q [B, D]`` -> f32 scores with
    int8 dequantization by row scale. rows leading dims either [N] (shared
    scan: [B, N]) or [B, ...] (per-query gather: [B, ...]).

    Compute dtype follows the STORAGE dtype: bf16/int8 stores score in
    bf16 (their precision ceiling — matches the brute-force kernel), but
    an f32 store scores in f32 so full-probe IVF is bit-comparable to the
    f32 oracle (near-ties must not flip vs the exact path)."""
    ct = jnp.float32 if rows.dtype == jnp.float32 else jnp.bfloat16
    qb = q.astype(ct)
    rf = rows.astype(ct)
    if rows.ndim == 2:                                     # shared [N, D]
        s = jax.lax.dot_general(
            qb, rf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [B, N]
        if row_scales is not None:
            s = s * row_scales[None, :]
        return s
    # per-query [B, p, M, D]
    s = jnp.einsum("bpmd,bd->bpm", rf, qb,
                   preferred_element_type=jnp.float32)
    if row_scales is not None:
        s = s * row_scales
    return s


@partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_candidates_jit(centroids, buckets, bucket_scales, bucket_pos,
                        spill, spill_scales, spill_pos, q, mask=None,
                        *, k: int, nprobe: int):
    """ONE jitted candidate selection: returns ``(scores [B, k] f32 desc,
    pos [B, k] int32 row positions, -1 for empty slots)``.

    The pruned scan: centroid matmul [B, C] -> top-nprobe -> gather
    [B, nprobe, M, D] -> batched matvec -> merge with the (always-scanned)
    spill block. Positions, not ids — callers compose QE row gathers and
    regional re-rank lookups against the main store. ``mask`` ([1, N]
    int8, search/subset.py) gathers by candidate position and folds into
    the padding -inf mask — filtering is exact within probed buckets.
    """
    b = q.shape[0]
    cq = jax.lax.dot_general(
        q.astype(jnp.float32), centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [B, C]
    _, cids = jax.lax.top_k(cq, nprobe)                    # [B, p]

    rows = jnp.take(buckets, cids, axis=0)                 # [B, p, M, D]
    pos = jnp.take(bucket_pos, cids, axis=0)               # [B, p, M]
    rsc = (jnp.take(bucket_scales, cids, axis=0)
           if bucket_scales is not None else None)
    s = _score_rows(rows, rsc, q)                          # [B, p, M]
    m = buckets.shape[1]
    flat_s = jnp.where(pos.reshape(b, -1) >= 0,
                       s.reshape(b, nprobe * m), NEG_INF)
    flat_p = pos.reshape(b, nprobe * m)

    if spill.shape[0]:
        sp = _score_rows(spill, spill_scales, q)           # [B, S]
        sp = jnp.where(spill_pos[None, :] >= 0, sp, NEG_INF)
        flat_s = jnp.concatenate([flat_s, sp], axis=1)
        flat_p = jnp.concatenate(
            [flat_p, jnp.broadcast_to(spill_pos[None, :],
                                      (b, spill_pos.shape[0]))], axis=1)

    if mask is not None:
        # subset filter (search/subset.py): candidates carry positions,
        # so one tiny gather marks the disallowed ones (-1 padding maps
        # to slot 0 but is already -inf)
        allowed = jnp.take(mask[0], jnp.maximum(flat_p, 0)) > 0
        flat_s = jnp.where(allowed, flat_s, NEG_INF)

    top_s, idx = jax.lax.top_k(flat_s, k)
    top_p = jnp.take_along_axis(flat_p, idx, axis=1)
    return top_s, jnp.where(top_s > NEG_INF, top_p, -1)


@partial(jax.jit, static_argnames=("k", "depth", "qe_n", "qe_alpha",
                                   "nprobe", "do_qe", "do_rerank",
                                   "spatial_weight"))
def _ivf_composite_jit(centroids, buckets, bucket_scales, bucket_pos,
                       spill, spill_scales, spill_pos,
                       descriptors, ids, scales, regional, regional_scales,
                       query_regional, q, vote_matrix=None, mask=None,
                       *, k: int, depth: int, qe_n: int,
                       qe_alpha: float, nprobe: int, do_qe: bool,
                       do_rerank: bool, spatial_weight: float = 0.0):
    """The IVF mirror of index._search_composite_jit — ONE jitted program
    where every candidate-selection stage is the cluster-pruned scan
    instead of the full brute-force scan. QE neighbor rows and regional
    re-rank rows gather from the MAIN store by position (the IVF view
    stores positions), so the quality math is shared verbatim with the
    exact path (search/qe.py, search/rerank.py)."""
    ivf = (centroids, buckets, bucket_scales, bucket_pos,
           spill, spill_scales, spill_pos)
    q = jnp.asarray(q, jnp.float32)
    if do_qe:
        s, pos = _ivf_candidates_jit(*ivf, q, mask, k=qe_n, nprobe=nprobe)
        rows = jnp.take(descriptors, jnp.maximum(pos, 0),
                        axis=0).astype(jnp.float32)          # [Q, n, D]
        if descriptors.dtype == jnp.int8:
            rows = rows * jnp.take(scales[0], jnp.maximum(pos, 0))[..., None]
        rows = jnp.where((s > NEG_INF)[..., None], rows, 0.0)
        from .qe import expand_from_candidates
        q = expand_from_candidates(q, s, rows, qe_alpha)
    if do_rerank:
        g, pos = _ivf_candidates_jit(*ivf, q, mask, k=depth, nprobe=nprobe)
        from .rerank import rerank_from_candidates
        return rerank_from_candidates(
            regional, ids, g, pos, query_regional, k=k,
            regional_scales=regional_scales,
            spatial_weight=spatial_weight, vote_matrix=vote_matrix)
    s, pos = _ivf_candidates_jit(*ivf, q, mask, k=k, nprobe=nprobe)
    out_ids = jnp.where(pos >= 0, jnp.take(ids, jnp.maximum(pos, 0)), -1)
    return s, out_ids


class IVFIndex:
    """Cluster-pruned ANN view over an :class:`instsearch_tpu.Index`.

    Build with :meth:`from_index`; query with :meth:`search` (descriptor
    space) — or pass ``nprobe`` through ``Index.search`` once attached.
    The main store stays authoritative: buckets hold row positions.
    ``Index.add`` is ABSORBED (:meth:`absorb_add` appends the new rows to
    the always-scanned spill, keeping full-probe == brute force exactly);
    ``Index.remove`` is ABSORBED too (:meth:`absorb_remove` remaps
    positions, tombstoning removed slots); DBA still invalidates the
    view — rebuild it (``from_index`` is a single k-means fit + two
    device gathers).
    """

    def __init__(self, centroids, buckets, bucket_scales, bucket_pos,
                 spill, spill_scales, spill_pos, nprobe: int = 32):
        self.centroids = centroids            # [C, D] f32, unit rows
        self.buckets = buckets                # [C, M, D] store dtype
        self.bucket_scales = bucket_scales    # [C, M] f32 | None
        self.bucket_pos = bucket_pos          # [C, M] int32 positions
        self.spill = spill                    # [S_pad, D] store dtype
        self.spill_scales = spill_scales      # [S_pad] f32 | None
        self.spill_pos = spill_pos            # [S_pad] int32
        self.nprobe = nprobe

    # ------------------------------------------------------------------
    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def bucket_capacity(self) -> int:
        return self.buckets.shape[1]

    def scan_fraction(self, nprobe: int | None = None) -> float:
        """Fraction of index rows a query touches (bucket slots + spill)."""
        p = min(nprobe or self.nprobe, self.n_clusters)
        total = self.n_clusters * self.bucket_capacity + self.spill.shape[0]
        return (p * self.bucket_capacity + self.spill.shape[0]) / max(total, 1)

    # ------------------------------------------------------------------
    @classmethod
    def from_index(cls, index, n_clusters: int | None = None,
                   nprobe: int = 32, iters: int = 10, seed: int = 0,
                   cap_factor: float = 4.0,
                   sample: int | None = 262_144) -> "IVFIndex":
        """Fit the coarse quantizer and bucket the index rows.

        ``n_clusters`` defaults to ~sqrt(N) rounded to a power of two (the
        standard IVF sizing); the k-means fit runs on at most ``sample``
        rows (fit quality saturates long before 1M rows; assignment always
        covers every row). ``cap_factor`` caps bucket capacity at that
        multiple of the mean cluster size — overflow spills to the dense
        always-scanned block.
        """
        from ..ops.kmeans import assign_clusters, fit_kmeans, pick_chunk
        nv = index.num_valid
        if nv < 2:
            raise ValueError("IVF needs at least 2 indexed rows")
        if n_clusters is None:
            n_clusters = max(2, 1 << int(round(np.log2(max(2, np.sqrt(nv))))))
        n_clusters = min(n_clusters, nv)

        x = index.descriptors
        scales = index.scales
        is_int8 = x.dtype == jnp.int8
        xf = _dequant_rows_f32(x, scales) if is_int8 else x

        if sample is not None and nv > sample:
            rng = np.random.default_rng(seed)
            take = np.sort(rng.choice(nv, size=sample, replace=False))
            fit_rows = jnp.take(xf, jnp.asarray(take), axis=0)
            cent, _ = fit_kmeans(fit_rows, n_clusters, iters=iters,
                                 seed=seed)
            assignments = assign_clusters(
                xf, cent, nv, chunk=pick_chunk(xf.shape[0]))
        else:
            cent, assignments = fit_kmeans(xf, n_clusters, num_valid=nv,
                                           iters=iters, seed=seed)

        bucket_pos, spill_pos = _bucket_layout(
            np.asarray(assignments), nv, n_clusters, cap_factor)
        s_pad = max(8, ((len(spill_pos) + 7) // 8) * 8) \
            if len(spill_pos) else 0
        sp = np.full((s_pad,), -1, np.int32)
        sp[:len(spill_pos)] = spill_pos

        bucket_pos = jnp.asarray(bucket_pos)
        spill_pos = jnp.asarray(sp)
        buckets, bscales, _ = _fill_buckets_jit(
            x, scales, index.ids, bucket_pos, is_int8=is_int8)
        if s_pad:
            spill, sscales, _ = _fill_buckets_jit(
                x, scales, index.ids, spill_pos[None, :], is_int8=is_int8)
            spill, sscales = spill[0], (sscales[0] if is_int8 else None)
        else:
            spill = jnp.zeros((0, x.shape[1]), x.dtype)
            sscales = jnp.zeros((0,), jnp.float32) if is_int8 else None
        return cls(cent, buckets, bscales, bucket_pos, spill, sscales,
                   spill_pos, nprobe=nprobe)

    # ------------------------------------------------------------------
    def absorb_add(self, index, start: int, n_new: int) -> None:
        """Absorb freshly-added rows [start, start+n_new) of the (already
        updated) main store into the ALWAYS-SCANNED spill block, in store
        dtype — the bucketed layout is untouched, so full-probe search
        stays exactly equal to brute force (the view's strongest
        invariant) and any-nprobe search always sees the new rows. The
        spill grows geometrically (power-of-two steps) on overflow;
        repeated adds degrade the scan fraction, not correctness —
        rebuild (``Index.build_ivf``) when the spill stops being small.

        Compile hygiene (serve-time adds): reads and writes run through
        power-of-two BLOCKS (pad positions carry -1, masked like padding)
        so repeated adds of varying sizes reuse ~log₂ many compiled
        programs instead of one per distinct n_new."""
        d = index.descriptors.shape[1]
        n_pad = index.descriptors.shape[0]
        blk = max(8, 1 << max(0, n_new - 1).bit_length())
        P = min(blk, n_pad)
        s0 = min(start, n_pad - P)
        rows_np = np.asarray(jax.lax.dynamic_slice(
            index.descriptors, (s0, 0), (P, d)))[start - s0:
                                                 start - s0 + n_new]
        rows_blk = np.zeros((blk, d), rows_np.dtype)
        rows_blk[:n_new] = rows_np
        pos_blk = np.full((blk,), -1, np.int32)
        pos_blk[:n_new] = np.arange(start, start + n_new, dtype=np.int32)

        used = int((np.asarray(self.spill_pos) >= 0).sum())
        cap = int(self.spill_pos.shape[0])
        if used + blk > cap:
            self.reserve_spill(max(used + blk, 2 * cap), index)
        self.spill = jax.lax.dynamic_update_slice(
            self.spill, jnp.asarray(rows_blk), (used, 0))
        self.spill_pos = jax.lax.dynamic_update_slice(
            self.spill_pos, jnp.asarray(pos_blk), (used,))
        if self.spill_scales is not None:
            sc_np = np.asarray(jax.lax.dynamic_slice(
                index.scales[0], (s0,), (P,)))[start - s0:
                                               start - s0 + n_new]
            sc_blk = np.zeros((blk,), np.float32)
            sc_blk[:n_new] = sc_np
            self.spill_scales = jax.lax.dynamic_update_slice(
                self.spill_scales, jnp.asarray(sc_blk), (used,))

    def reserve_spill(self, min_capacity: int, index) -> None:
        """Pre-grow the spill arrays to ≥ ``min_capacity`` slots (rounded
        up to a power of two) without adding entries. Search-program
        trace shapes include the spill arrays, so an absorb-add that
        grows them RECOMPILES the serving composite (~90-110 s through
        this box's tunnel) — and a well-balanced build ships an EMPTY
        spill, so the first live add almost always grew it. ``cli
        serve`` reserves capacity at startup so absorbed adds stay
        inside pre-compiled shapes until they exceed the reservation."""
        cap = int(self.spill_pos.shape[0])
        want = max(8, 1 << max(0, min_capacity - 1).bit_length())
        if want <= cap:
            return
        grow = want - cap
        self.spill = jnp.concatenate(
            [self.spill,
             jnp.zeros((grow, index.descriptors.shape[1]),
                       index.descriptors.dtype)])
        self.spill_pos = jnp.concatenate(
            [self.spill_pos, jnp.full((grow,), -1, jnp.int32)])
        if self.spill_scales is not None:
            self.spill_scales = jnp.concatenate(
                [self.spill_scales, jnp.zeros((grow,), jnp.float32)])

    def absorb_remove(self, pos_map: jax.Array) -> None:
        """Absorb a main-store removal (``Index.remove`` compaction):
        remap every stored row position through ``pos_map`` (old -> new;
        removed rows map to -1, which masks the slot exactly like a
        padding slot). Bucket/spill row VALUES are untouched — compaction
        only MOVES surviving rows, it never changes them, so the copies
        stay score-correct at their remapped positions. Tombstoned spill
        entries are compacted to keep the valid prefix that
        ``absorb_add``'s append cursor assumes. Buckets hollow out over
        many removals — rebuild (``Index.build_ivf``) to compact them."""
        from ..index import _remap_positions_jit
        self.bucket_pos = _remap_positions_jit(self.bucket_pos, pos_map)
        if self.spill_pos.shape[0]:
            sp = np.asarray(_remap_positions_jit(self.spill_pos, pos_map))
            order = jnp.asarray(
                np.argsort(sp < 0, kind="stable").astype(np.int32))
            self.spill_pos = jnp.take(jnp.asarray(sp), order)
            self.spill = jnp.take(self.spill, order, axis=0)
            if self.spill_scales is not None:
                self.spill_scales = jnp.take(self.spill_scales, order)

    # ------------------------------------------------------------------
    def candidates(self, queries: jax.Array, k: int,
                   nprobe: int | None = None, mask=None):
        """(scores [B, k], row POSITIONS [B, k]) — the composable form.
        ``mask``: optional [1, N] int8 subset filter (search/subset.py)."""
        p = min(nprobe or self.nprobe, self.n_clusters)
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        # bound the [B, p, M, D] gather: chunk the batch so the gathered
        # block stays under ~256 MB (IVF is a low-batch serving path; the
        # chunking just keeps huge batches safe, not fast)
        row_bytes = self.buckets.shape[2] * self.buckets.dtype.itemsize
        per_q = max(1, p * self.bucket_capacity * row_bytes)
        chunk = max(1, min(q.shape[0], (256 << 20) // per_q))
        from ..utils.chunking import run_chunked
        run = lambda qq: _ivf_candidates_jit(
            self.centroids, self.buckets, self.bucket_scales,
            self.bucket_pos, self.spill, self.spill_scales, self.spill_pos,
            qq, mask, k=k, nprobe=p)
        return run_chunked(run, chunk, q)

    def search(self, index, queries, k: int = 10,
               nprobe: int | None = None, mask=None):
        """Descriptor-space ANN search -> ``(scores [B,k], dataset ids)``;
        mirrors ``Index.search`` output. ``index`` supplies the position ->
        dataset-id mapping (the IVF view stores positions only)."""
        s, pos = self.candidates(queries, k, nprobe, mask=mask)
        ids = jnp.where(pos >= 0, jnp.take(index.ids, jnp.maximum(pos, 0)),
                        -1)
        from ..utils.chunking import fetch
        return fetch(s, ids)

    # ------------------------------------------------------------------
    def measure_recall(self, index, queries, k: int = 10,
                       nprobe: int | None = None) -> float:
        """recall@k vs the exact brute-force ranking, averaged over
        queries — the build-time honesty number for a chosen nprobe.

        ``ivf_nprobe=0`` in the reference config is load-bearing: once
        this view is attached (Index.build_ivf sets cfg.search.ivf_nprobe)
        ``index.search`` routes through the IVF path, and without the
        reset the "exact" reference IS the ANN result — recall comes back
        a vacuous 1.0 at any nprobe (found via the r4 bench honesty curve,
        where full-probe recall ranked BELOW nprobe=8)."""
        exact_s, exact_ids = index.search(
            queries, index.cfg.search.replace(k=k, qe_enabled=False,
                                              rerank_enabled=False,
                                              ivf_nprobe=0))
        _, ivf_ids = self.search(index, queries, k=k, nprobe=nprobe)
        return recall_vs_exact(exact_ids, ivf_ids)

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        state = {"centroids": self.centroids, "buckets": self.buckets,
                 "bucket_pos": self.bucket_pos, "spill": self.spill,
                 "spill_pos": self.spill_pos}
        if self.bucket_scales is not None:
            state["bucket_scales"] = self.bucket_scales
            state["spill_scales"] = self.spill_scales
        np.savez(os.path.join(path, "ivf.npz"),
                 **{k: np.asarray(v.astype(jnp.float32)
                                  if v.dtype == jnp.bfloat16 else v)
                    for k, v in state.items()})
        with open(os.path.join(path, "ivf.json"), "w") as f:
            json.dump({"nprobe": self.nprobe,
                       "dtypes": {k: str(v.dtype) for k, v in state.items()}},
                      f)

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        with open(os.path.join(path, "ivf.json")) as f:
            meta = json.load(f)
        raw = np.load(os.path.join(path, "ivf.npz"))
        d = {k: jnp.asarray(raw[k], jnp.dtype(meta["dtypes"][k]))
             for k in raw.files}
        return cls(d["centroids"], d["buckets"], d.get("bucket_scales"),
                   d["bucket_pos"], d["spill"], d.get("spill_scales"),
                   d["spill_pos"], nprobe=int(meta["nprobe"]))


@jax.jit
def _dequant_rows_f32(x_int8, scales):
    return x_int8.astype(jnp.float32) * scales.reshape(-1, 1)


def recall_vs_exact(exact_ids, approx_ids) -> float:
    """Set-overlap recall of ``approx_ids`` against the exact top-k,
    averaged over queries ([Q, k] id arrays, -1 = empty slot). Shared by
    measure_recall and the bench honesty curves (one exact ranking can be
    reused across many nprobe/depth points)."""
    hits = 0
    total = 0
    for e, a in zip(np.asarray(exact_ids), np.asarray(approx_ids)):
        e = set(int(i) for i in e if i >= 0)
        if not e:
            continue
        hits += len(e & set(int(i) for i in a if i >= 0))
        total += len(e)
    return hits / max(total, 1)
