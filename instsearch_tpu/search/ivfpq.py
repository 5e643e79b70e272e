"""IVF-PQ: coarse k-means pruning over 4-bit residual PQ codes — the
classic IVFADC system (Jégou et al., TPAMI 2011 §IV) rebuilt TPU-first.

Why it exists next to the IVF and PQ tiers it composes:

  * The IVF tier (search/ivf.py) prunes the scan to ``nprobe/C`` of the
    rows, but its buckets hold full rows — at 64M×512 even int8 buckets
    are 32 GB, past a 16 GB chip.
  * The PQ tier (search/pq_view.py) stores 32 B/row (2 GB at 64M) but
    scans EVERY code: its ADC expansion is the whole cost (~99 ms B=1 at
    64M, bench_pq_capacity).
  * IVF-PQ keeps the 32 B/row store AND prunes the ADC to the probed
    buckets: the expansion cost — the PQ tier's entire bottleneck —
    scales down by the scan fraction.

The TPU-native trick — bucket-independent LUTs: codes quantize the
RESIDUAL ``r = x − c(x)`` (much smaller variance than raw rows → finer
quantization at the same 4 bits), and for the INNER-PRODUCT metric

    score(q, x̂) = q·c + q·r̂ = cq[cluster] + Σ_m lut[m, code_m],
    lut[m, j] = q_m · C[m, j]

so the per-bucket term is the centroid score the probe selection already
computed, and ONE query LUT serves every bucket — no per-bucket LUT
rebuild (the classic CPU IVFADC recomputes ``(q−c)``-LUTs per probed
list; on TPU that would be nprobe tiny matmuls of dynamic provenance).
Euclidean-metric IVFADC needs per-bucket LUTs; unit-norm descriptor
search is inner-product, which is why this factorization is exact here.

Static-shape layout mirrors the IVF tier (same ``_bucket_layout``):
``codes [C, M, m/2]`` fixed-capacity buckets of packed nibbles +
always-scanned spill codes with their cluster ids for the offset. Like
every compressed tier this is a CASCADE: ADC selects ``depth``
candidates, exactly re-scored against the main store in the same jitted
program — full probe + full depth degenerates to brute force (the
integration tests' exactness anchor).
"""
from __future__ import annotations

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pq import PQCodebook, encode_pq, fit_pq, pq_lut, unpack_pq

NEG_INF = np.float32(-np.inf)


def _adc_block(codes_packed: jax.Array, lut: jax.Array) -> jax.Array:
    """ADC scores of a shared code block: ``codes [N', m/2]`` int8 ×
    ``lut [B, m, 16]`` f32 → ``[B, N']`` f32. One-hot × LUT einsum — the
    16-wide contraction the PQ scan kernel uses, in XLA form (the
    blocks here are gathered per query, so the streaming kernel's fixed
    layout doesn't apply)."""
    c = unpack_pq(codes_packed)                             # [N', m]
    oh = jax.nn.one_hot(c, 16, dtype=jnp.float32)           # [N', m, 16]
    return jnp.einsum("nmk,bmk->bn", oh, lut)


def _adc_select(centroids, codes, bucket_pos, spill_codes, spill_pos,
                spill_cluster, pq_centroids, q, rotation=None, mask=None, *,
                depth: int, nprobe: int):
    """The pruned residual-ADC selection (trace-time stage, no exact
    re-score): centroid matmul → top-``nprobe`` → bucket-code gather →
    ADC + centroid offset → spill merge → top-``depth``. Returns
    ``(adc scores [B, dd], pos [B, dd])`` with dd = min(depth, scanned
    slots). Shared by the cascade composite and the codes-only capacity
    bench (at 64M rows no exact store fits the chip — deployment gathers
    exact rows for the depth-candidates from host storage).

    ``rotation`` (OPQ in residual space, ops/pq.fit_opq): codes quantize
    ``(x − c)·R``, and since R is orthogonal ``q·r = (q·R)·(r·R)`` — the
    LUT side rotates the QUERY once; the centroid-offset term ``q·c`` is
    untouched (the rotation lives entirely inside the residual factor).

    ``mask`` (search/subset.py): applied HERE, at ADC selection — the
    depth budget is spent entirely on allowed rows, so selective subset
    filters keep the cascade's recall model."""
    b = q.shape[0]
    qf = q.astype(jnp.float32)
    cq = jax.lax.dot_general(
        qf, centroids, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [B, C]
    _, cids = jax.lax.top_k(cq, nprobe)                     # [B, p]
    cb = PQCodebook(pq_centroids)
    q_adc = qf if rotation is None else qf @ rotation
    lut = pq_lut(q_adc, cb)                                 # [B, m, 16]

    codes_g = jnp.take(codes, cids, axis=0)                 # [B, p, M, m/2]
    pos_g = jnp.take(bucket_pos, cids, axis=0)              # [B, p, M]
    coff = jnp.take_along_axis(cq, cids, axis=1)            # [B, p]
    m_cap = codes.shape[1]

    # probes are processed in GROUPS of up to 8: a per-probe scan
    # serializes nprobe tiny einsums (measured dispatch-bound at B=1 on
    # chip), while one ungrouped one-hot over all probes materializes a
    # [B, p·M, m, 16] intermediate — grouping bounds the buffer to 8
    # buckets and cuts the sequential steps 8x
    g = 8 if nprobe % 8 == 0 else (4 if nprobe % 4 == 0 else
                                   (2 if nprobe % 2 == 0 else 1))
    rows_g = g * m_cap

    def probe_step(_, op):
        cp, off = op                                # [B,g,M,m/2], [B,g]
        c = unpack_pq(cp.reshape(b * rows_g, -1)).reshape(b, rows_g, -1)
        oh = jax.nn.one_hot(c, 16, dtype=jnp.float32)   # [B,gM,m,16]
        s = jnp.einsum("bnmk,bmk->bn", oh, lut)         # [B, gM]
        return None, (s.reshape(b, g, m_cap)
                      + off[:, :, None]).reshape(b, rows_g)

    _, s_probe = jax.lax.scan(
        probe_step, None,
        (codes_g.reshape(b, nprobe // g, g, m_cap, -1).transpose(
            1, 0, 2, 3, 4),
         coff.reshape(b, nprobe // g, g).transpose(1, 0, 2)))
    # s_probe [p/g, B, gM] -> [B, p*M]
    flat_s = jnp.where(pos_g.reshape(b, -1) >= 0,
                       s_probe.transpose(1, 0, 2).reshape(b, -1), NEG_INF)
    flat_p = pos_g.reshape(b, nprobe * m_cap)

    if spill_codes.shape[0]:
        sp = (_adc_block(spill_codes, lut)
              + jnp.take(cq, jnp.maximum(spill_cluster, 0), axis=1))
        sp = jnp.where(spill_pos[None, :] >= 0, sp, NEG_INF)
        flat_s = jnp.concatenate([flat_s, sp], axis=1)
        flat_p = jnp.concatenate(
            [flat_p, jnp.broadcast_to(spill_pos[None, :],
                                      (b, spill_pos.shape[0]))], axis=1)

    if mask is not None:
        # subset filter: candidates carry positions, one tiny gather
        # (-1 padding maps to slot 0 but is already -inf)
        allowed = jnp.take(mask[0], jnp.maximum(flat_p, 0)) > 0
        flat_s = jnp.where(allowed, flat_s, NEG_INF)

    dd = min(depth, flat_s.shape[1])
    adc_s, idx = jax.lax.top_k(flat_s, dd)
    pos = jnp.where(adc_s > NEG_INF,
                    jnp.take_along_axis(flat_p, idx, axis=1), -1)
    return adc_s, pos


@partial(jax.jit, static_argnames=("pad",))
def _dequant_pad_jit(blk, sc, *, pad: int):
    """Raw storage chunk → f32 rows in ONE program (dequantize + pad):
    the device side of ``HostRowStore.rows_device``."""
    x = blk.astype(jnp.float32)
    if sc is not None:
        x = x * sc[:, None]
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


@partial(jax.jit, static_argnames=("chunk",))
def _assign_residual_jit(x, cent, nv_local, *, chunk: int):
    """Coarse assignment + residuals in ONE program — the encode loop
    runs once per chunk, and separate eager dispatches cost ~25 ms each
    through this box's tunnel (CLAUDE.md); 1024 chunks at 64M rows make
    that a minute of pure dispatch."""
    from ..ops.kmeans import assign_clusters
    a = assign_clusters(x, cent, nv_local, chunk=chunk)
    res = x - jnp.take(cent, jnp.maximum(a, 0), axis=0)
    return a, res


@partial(jax.jit, static_argnames=("depth", "nprobe"))
def _adc_select_jit(centroids, codes, bucket_pos, spill_codes, spill_pos,
                    spill_cluster, pq_centroids, q, rotation=None,
                    mask=None, *, depth: int, nprobe: int):
    return _adc_select(centroids, codes, bucket_pos, spill_codes,
                       spill_pos, spill_cluster, pq_centroids, q,
                       rotation, mask, depth=depth, nprobe=nprobe)


@partial(jax.jit, static_argnames=("depth", "nprobe", "int4"))
def _ivfpq_candidates_jit(centroids, codes, bucket_pos,
                          spill_codes, spill_pos, spill_cluster,
                          pq_centroids, descriptors, scales, q, nv,
                          rotation=None, mask=None, *, depth: int,
                          nprobe: int, int4: bool):
    """ONE jitted cascade stage: the pruned ADC selection (_adc_select)
    followed by the EXACT re-score from the main store (the ORIGINAL
    query against unrotated rows — an OPQ rotation changes only
    candidate recall, never the re-scored ordering). Returns
    ``(exact scores [B, depth] desc, pos [B, depth], -1 empty)``."""
    qf = q.astype(jnp.float32)
    adc_s, pos = _adc_select(centroids, codes, bucket_pos, spill_codes,
                             spill_pos, spill_cluster, pq_centroids, qf,
                             rotation, mask, depth=depth, nprobe=nprobe)
    dd = adc_s.shape[1]

    # exact re-score from the main store (the cascade's quality anchor)
    from ..index import _gather_rows_f32
    rows = _gather_rows_f32(descriptors, jnp.maximum(pos, 0), scales,
                            int4=int4)                      # [B, dd, D]
    exact = jnp.einsum("bkd,bd->bk", rows, qf)
    exact = jnp.where(pos >= 0, exact, NEG_INF)
    exact, order = jax.lax.top_k(exact, dd)
    pos = jnp.take_along_axis(pos, order, axis=1)
    pos = jnp.where(exact > NEG_INF, pos, -1)
    if dd < depth:
        pad = ((0, 0), (0, depth - dd))
        exact = jnp.pad(exact, pad, constant_values=NEG_INF)
        pos = jnp.pad(pos, pad, constant_values=-1)
    return exact, pos


@partial(jax.jit, static_argnames=("k", "depth", "qe_n", "qe_alpha",
                                   "nprobe", "do_qe", "do_rerank", "int4",
                                   "spatial_weight", "rerank_depth"))
def _ivfpq_composite_jit(centroids, codes, bucket_pos,
                         spill_codes, spill_pos, spill_cluster,
                         pq_centroids, descriptors, ids, scales,
                         regional, regional_scales, query_regional, q, nv,
                         vote_matrix=None, rotation=None, mask=None, *,
                         k: int, depth: int, qe_n: int, qe_alpha: float,
                         nprobe: int, do_qe: bool, do_rerank: bool,
                         int4: bool, spatial_weight: float = 0.0,
                         rerank_depth: int = 0):
    """The IVF-PQ mirror of the exact/IVF/PQ composites: every candidate
    stage is the pruned-ADC→exact-re-score cascade; QE rows and re-rank
    regions gather from the MAIN store by position (shared quality math,
    search/qe.py + search/rerank.py)."""
    q = jnp.asarray(q, jnp.float32)

    def sel(qq, nvv):
        return _ivfpq_candidates_jit(
            centroids, codes, bucket_pos, spill_codes, spill_pos,
            spill_cluster, pq_centroids, descriptors, scales, qq, nvv,
            rotation, mask, depth=depth, nprobe=nprobe, int4=int4)
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
        rd = min(rerank_depth or depth, depth)
        s, pos = s[:, :rd], pos[:, :rd]
        from .rerank import rerank_from_candidates
        return rerank_from_candidates(
            regional, ids, s, pos, query_regional, k=k,
            regional_scales=regional_scales,
            spatial_weight=spatial_weight, vote_matrix=vote_matrix)
    out_ids = jnp.where(pos >= 0, jnp.take(ids, jnp.maximum(pos, 0)), -1)
    return s[:, :k], out_ids[:, :k]


class IVFPQView:
    """Pruned compressed-domain cascade view over an
    :class:`instsearch_tpu.Index` — IVF bucketing of 4-bit residual PQ
    codes. Build with :meth:`from_index` (or ``Index.build_ivfpq``);
    routes ``Index.search`` when ``SearchConfig.ivfpq_nprobe > 0``. The
    main store stays authoritative (codes hold padded row positions;
    every candidate is exactly re-scored), so quality degrades only
    through candidate recall: measure with :meth:`measure_recall`, over
    (nprobe, depth) jointly."""

    def __init__(self, centroids, codes, bucket_pos, spill_codes,
                 spill_pos, spill_cluster, codebook: PQCodebook,
                 nprobe: int = 32, depth: int = 400, rotation=None,
                 anisotropic_t: "float | None" = None):
        self.centroids = centroids          # [C, D] f32 unit rows
        self.codes = codes                  # [C, M, m/2] int8 packed
        self.bucket_pos = bucket_pos        # [C, M] int32 positions
        self.spill_codes = spill_codes      # [S_pad, m/2] int8
        self.spill_pos = spill_pos          # [S_pad] int32
        self.spill_cluster = spill_cluster  # [S_pad] int32 (-1 pad)
        self.codebook = codebook            # residual-space [m, 16, ds]
        self.rotation = rotation            # OPQ residual-space [D, D]
        self.anisotropic_t = anisotropic_t  # ScaNN threshold (fit record)
        self.nprobe = nprobe
        self.depth = depth

    # ------------------------------------------------------------------
    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def bucket_capacity(self) -> int:
        return self.codes.shape[1]

    @property
    def m(self) -> int:
        return self.codebook.m

    @property
    def bytes_per_row(self) -> int:
        return self.codes.shape[2]

    def scan_fraction(self, nprobe: int | None = None) -> float:
        p = min(nprobe or self.nprobe, self.n_clusters)
        total = (self.n_clusters * self.bucket_capacity
                 + self.spill_codes.shape[0])
        return (p * self.bucket_capacity
                + self.spill_codes.shape[0]) / max(total, 1)

    # ------------------------------------------------------------------
    @classmethod
    def from_index(cls, index, n_clusters: int | None = None,
                   nprobe: int = 32, m: int | None = None,
                   kmeans_iters: int = 10, pq_iters: int = 15,
                   seed: int = 0, cap_factor: float = 4.0,
                   sample: "int | None" = 262_144, depth: int = 400,
                   chunk: int = 65_536, opq_iters: int = 0,
                   anisotropic_t: "float | None" = None
                   ) -> "IVFPQView":
        """Coarse k-means fit + residual PQ fit + chunked encode + bucket
        layout. The k-means fit and the bucket layout are the IVF tier's
        (ops/kmeans.py, search/ivf._bucket_layout) — one coarse-quantizer
        definition across tiers; the PQ fit runs on residual samples.
        ``opq_iters > 0`` learns an OPQ rotation (ops/pq.fit_opq) in
        RESIDUAL space — codes then quantize ``(x − c)·R`` and the ADC
        side rotates the query once; the centroid-score term is
        untouched. ``anisotropic_t`` fits/encodes the residual codes
        under the score-aware ScaNN loss with the ORIGINAL rows as the
        parallel directions (ops/pq.fit_apq; raw-ADC quality for
        :meth:`search_adc` — the exactly-re-scored cascade doesn't need
        it)."""
        def rows_f32(start, count):
            return index._rows_f32_chunk(start, count)

        return cls._fit(rows_f32, index.num_valid,
                        index.descriptors.shape[0], index.dim,
                        n_clusters=n_clusters, nprobe=nprobe, m=m,
                        kmeans_iters=kmeans_iters, pq_iters=pq_iters,
                        seed=seed, cap_factor=cap_factor, sample=sample,
                        depth=depth, chunk=chunk, opq_iters=opq_iters,
                        anisotropic_t=anisotropic_t)

    @classmethod
    def _fit(cls, rows_f32, nv: int, n_pad: int, d: int, *,
             n_clusters, nprobe, m, kmeans_iters, pq_iters, seed,
             cap_factor, sample, depth, chunk, opq_iters,
             anisotropic_t=None, rows_dev=None,
             rows_sample=None) -> "IVFPQView":
        """The shared fit core behind :meth:`from_index` and
        :meth:`from_host_store`: ``rows_f32(start, count)`` yields
        dequantized f32 row chunks from WHEREVER the exact rows live
        (device store or host memmap) — everything else (sampled coarse
        fit, residual PQ fit, chunked encode, bucket layout) is
        identical. ``rows_dev`` (optional) yields the same chunks as
        DEVICE arrays for the full-corpus encode pass — host stores ship
        raw int8 bytes and dequantize on device (4× less tunnel
        traffic); defaults to shipping the ``rows_f32`` output.
        ``rows_sample`` (optional) gathers an arbitrary row subset
        ``[len(idx), D]`` f32 in one call — memmap stores random-read
        just the sampled rows instead of dequantizing every chunk they
        fall in."""
        import math

        from ..ops.kmeans import assign_clusters, fit_kmeans, pick_chunk
        from .ivf import _bucket_layout

        if nv < 16:
            raise ValueError("IVF-PQ needs at least 16 indexed rows")
        if n_clusters is None:
            n_clusters = max(2, 1 << int(round(np.log2(max(2,
                                                           np.sqrt(nv))))))
        n_clusters = min(n_clusters, nv)
        if m is None:
            from ..ops.pq import default_m
            m = default_m(d)

        chunk = math.gcd(n_pad, max(8, chunk))

        # --- coarse quantizer on dequantized rows (sampled fit) --------
        if sample is not None and nv > sample:
            rng = np.random.default_rng(seed)
            take = np.sort(rng.choice(nv, size=sample, replace=False))
            if rows_sample is not None:
                fit_x = jnp.asarray(rows_sample(take))
            else:
                # gather the sample in chunk-sized strides (no full f32
                # copy)
                parts = []
                for start in range(0, n_pad, chunk):
                    sel = take[(take >= start) & (take < start + chunk)]
                    if len(sel):
                        sl = rows_f32(start, chunk)
                        # host readers (HostRowStore memmap) subset in
                        # numpy — jnp.take would ship the whole chunk to
                        # the device just to keep a few sampled rows
                        if isinstance(sl, np.ndarray):
                            parts.append(sl[sel - start])
                        else:
                            parts.append(np.asarray(jnp.take(
                                sl, jnp.asarray(sel - start), axis=0)))
                fit_x = jnp.asarray(np.concatenate(parts, axis=0))
        else:
            parts = [np.asarray(rows_f32(s, chunk))
                     for s in range(0, n_pad, chunk)]
            fit_x = jnp.asarray(np.concatenate(parts, axis=0)[:nv])
        cent, _ = fit_kmeans(fit_x, n_clusters, iters=kmeans_iters,
                             seed=seed)

        # --- residual PQ fit on the sample ------------------------------
        nfit = fit_x.shape[0]
        pad = (-nfit) % 8
        fit_pad = jnp.pad(fit_x, ((0, pad), (0, 0)))
        a_fit = assign_clusters(fit_pad, cent, nfit,
                                chunk=pick_chunk(nfit + pad))[:nfit]
        res_fit = fit_x - jnp.take(cent, jnp.maximum(a_fit, 0), axis=0)
        rot = None
        if anisotropic_t is not None and opq_iters > 0:
            raise ValueError(
                "anisotropic_t and opq_iters are mutually exclusive "
                "(the score-aware alternation is not defined through a "
                "jointly-learned rotation; pick one)")
        if anisotropic_t is not None:
            from ..ops.pq import fit_apq
            cb = fit_apq(res_fit, m=m, directions=fit_x,
                         t=anisotropic_t, init_iters=pq_iters, seed=seed)
        elif opq_iters > 0:
            from ..ops.pq import fit_opq
            rot, cb = fit_opq(res_fit, m=m, opq_iters=opq_iters,
                              pq_iters=pq_iters, seed=seed)
        else:
            cb = fit_pq(res_fit, m=m, iters=pq_iters, seed=seed)

        # --- full-corpus assignment + chunked residual encode ----------
        if rows_dev is None:
            def rows_dev(start, count):
                return jnp.asarray(rows_f32(start, count))
        assignments = np.empty((n_pad,), np.int32)
        codes_all = np.empty((n_pad, m // 2), np.int8)
        for start in range(0, n_pad, chunk):
            sl = rows_dev(start, chunk)          # ONE transfer per chunk
            nv_local = int(np.clip(nv - start, 0, chunk))
            a, res = _assign_residual_jit(sl, cent, nv_local,
                                          chunk=pick_chunk(chunk))
            assignments[start:start + chunk] = np.asarray(a)
            if rot is not None:
                res = res @ rot
            if anisotropic_t is not None:
                from ..ops.pq import encode_apq
                codes_all[start:start + chunk] = np.asarray(
                    encode_apq(res, cb, directions=sl,
                               t=anisotropic_t))
            else:
                codes_all[start:start + chunk] = np.asarray(
                    encode_pq(res, cb))

        bucket_pos, spill_pos = _bucket_layout(assignments, nv,
                                               n_clusters, cap_factor)
        s_pad = (max(8, ((len(spill_pos) + 7) // 8) * 8)
                 if len(spill_pos) else 0)
        sp = np.full((s_pad,), -1, np.int32)
        sp[:len(spill_pos)] = spill_pos
        spc = np.full((s_pad,), -1, np.int32)
        if len(spill_pos):
            spc[:len(spill_pos)] = assignments[spill_pos]

        codes_j = jnp.asarray(codes_all)
        bucket_pos = jnp.asarray(bucket_pos)
        codes_b = jnp.take(codes_j, jnp.maximum(bucket_pos, 0), axis=0)
        codes_b = jnp.where((bucket_pos >= 0)[..., None], codes_b, 0)
        if s_pad:
            spill_codes = jnp.take(codes_j,
                                   jnp.maximum(jnp.asarray(sp), 0), axis=0)
            spill_codes = jnp.where((jnp.asarray(sp) >= 0)[:, None],
                                    spill_codes, 0)
        else:
            spill_codes = jnp.zeros((0, m // 2), jnp.int8)
        return cls(cent, codes_b, bucket_pos, spill_codes,
                   jnp.asarray(sp), jnp.asarray(spc), cb,
                   nprobe=nprobe, depth=depth, rotation=rot,
                   anisotropic_t=anisotropic_t)

    # ------------------------------------------------------------------
    def absorb_add(self, index, start: int, n_new: int) -> None:
        """Absorb freshly-added rows [start, start+n_new) of the (already
        updated) main store: residual-encode them against the FROZEN
        coarse quantizer + codebook and append (codes, position, cluster)
        to the always-scanned spill block — bucket layout untouched, so
        the new rows are visible at ANY nprobe and the cascade's exact
        re-score keeps returned scores exact. Spill grows geometrically
        in power-of-two steps; rebuild (``Index.build_ivfpq``) when it
        stops being small.

        Compile hygiene (serve-time adds): the batch reads and encodes
        through power-of-two-PADDED shapes (``_rows_f32_chunk_padded``)
        and the spill write is a power-of-two block with -1-position
        padding, so repeated adds of varying sizes reuse ~log₂ many
        compiled programs instead of one per distinct n_new (~90-110 s
        each through this box's tunnel)."""
        from ..ops.kmeans import pick_chunk
        rows_p, off = index._rows_f32_chunk_padded(start, n_new)
        P = rows_p.shape[0]
        a, res = _assign_residual_jit(rows_p, self.centroids, P,
                                      chunk=pick_chunk(P))
        if self.rotation is not None:
            res = res @ self.rotation
        if self.anisotropic_t is not None:
            from ..ops.pq import encode_apq
            codes_p = encode_apq(res, self.codebook, directions=rows_p,
                                 t=self.anisotropic_t)
        else:
            codes_p = encode_pq(res, self.codebook)
        # the new rows' codes/assignments slice out HOST-side (tiny
        # blocks; device slicing would re-introduce per-n_new programs)
        groups = self.codes.shape[2]
        codes_np = np.asarray(codes_p)[off:off + n_new]
        a_np = np.asarray(a)[off:off + n_new]
        blk = max(8, 1 << max(0, n_new - 1).bit_length())
        codes_blk = np.zeros((blk, groups), np.int8)
        codes_blk[:n_new] = codes_np
        pos_blk = np.full((blk,), -1, np.int32)
        pos_blk[:n_new] = np.arange(start, start + n_new, dtype=np.int32)
        clu_blk = np.full((blk,), -1, np.int32)
        clu_blk[:n_new] = a_np

        used = int((np.asarray(self.spill_pos) >= 0).sum())
        cap = int(self.spill_pos.shape[0])
        if used + blk > cap:
            self.reserve_spill(max(used + blk, 2 * cap))
        self.spill_codes = jax.lax.dynamic_update_slice(
            self.spill_codes, jnp.asarray(codes_blk), (used, 0))
        self.spill_pos = jax.lax.dynamic_update_slice(
            self.spill_pos, jnp.asarray(pos_blk), (used,))
        self.spill_cluster = jax.lax.dynamic_update_slice(
            self.spill_cluster, jnp.asarray(clu_blk), (used,))

    def reserve_spill(self, min_capacity: int) -> None:
        """Pre-grow the spill arrays to ≥ ``min_capacity`` slots (rounded
        up to a power of two) without adding entries. Every IVF-PQ search
        program's trace shape includes the spill arrays, so an absorb-add
        that grows them RECOMPILES the serving composite (~90-110 s
        through this box's tunnel) — and a well-balanced build ships an
        EMPTY spill, so the first live add almost always grew it. Serve
        startup reserves capacity up front (``cli serve``) so absorbed
        adds stay inside pre-compiled shapes until they exceed the
        reservation."""
        cap = int(self.spill_pos.shape[0])
        want = max(8, 1 << max(0, min_capacity - 1).bit_length())
        if want <= cap:
            return
        grow = want - cap
        self.spill_codes = jnp.concatenate(
            [self.spill_codes,
             jnp.zeros((grow, self.codes.shape[2]), jnp.int8)])
        self.spill_pos = jnp.concatenate(
            [self.spill_pos, jnp.full((grow,), -1, jnp.int32)])
        self.spill_cluster = jnp.concatenate(
            [self.spill_cluster, jnp.full((grow,), -1, jnp.int32)])

    def absorb_remove(self, pos_map: jax.Array) -> None:
        """Absorb a main-store removal: remap stored positions through
        ``pos_map`` (removed -> -1, masked like padding). Residual codes
        quantize row VALUES against the frozen coarse quantizer — moves
        don't change values, so codes stay valid at their remapped
        positions; the cascade's exact re-score gathers the moved rows
        by the NEW position. Spill compacts its valid prefix (the
        ``absorb_add`` append-cursor contract). Rebuild
        (``Index.build_ivfpq``) to compact hollowed buckets."""
        from ..index import _remap_positions_jit
        self.bucket_pos = _remap_positions_jit(self.bucket_pos, pos_map)
        if self.spill_pos.shape[0]:
            sp = np.asarray(_remap_positions_jit(self.spill_pos, pos_map))
            order = jnp.asarray(
                np.argsort(sp < 0, kind="stable").astype(np.int32))
            self.spill_pos = jnp.take(jnp.asarray(sp), order)
            self.spill_codes = jnp.take(self.spill_codes, order, axis=0)
            self.spill_cluster = jnp.where(
                self.spill_pos >= 0,
                jnp.take(self.spill_cluster, order), -1)

    # ------------------------------------------------------------------
    def candidates(self, index, queries, depth: int | None = None,
                   nprobe: int | None = None):
        """(exact scores [B, depth], row POSITIONS) — the composable,
        already-exactly-re-scored cascade stage."""
        p = min(nprobe or self.nprobe, self.n_clusters)
        depth = depth or self.depth
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        nv = jnp.asarray(index.num_valid, jnp.int32)
        return _ivfpq_candidates_jit(
            self.centroids, self.codes, self.bucket_pos,
            self.spill_codes, self.spill_pos, self.spill_cluster,
            self.codebook.centroids, index.descriptors, index.scales,
            q, nv, self.rotation, depth=depth, nprobe=p,
            int4=index.is_int4)

    def search(self, index, queries, k: int = 10,
               depth: int | None = None, nprobe: int | None = None):
        s, pos = self.candidates(index, queries, depth, nprobe)
        ids = jnp.where(pos >= 0,
                        jnp.take(index.ids, jnp.maximum(pos, 0)), -1)
        from ..utils.chunking import fetch
        return fetch(s[:, :k], ids[:, :k])

    # ------------------------------------------------------------------
    # Capacity-scale serving: codes on chip, exact rows on the host.
    @classmethod
    def from_host_store(cls, store: "HostRowStore",
                        n_clusters: int | None = None, nprobe: int = 32,
                        m: int | None = None, kmeans_iters: int = 10,
                        pq_iters: int = 15, seed: int = 0,
                        cap_factor: float = 4.0,
                        sample: "int | None" = 262_144, depth: int = 400,
                        chunk: int = 65_536, opq_iters: int = 0,
                        anisotropic_t: "float | None" = None
                        ) -> "IVFPQView":
        """Build the view straight from a :class:`HostRowStore` — no
        device-resident Index required, which is the whole point at
        capacity scale (64M×512 exact rows = 32–128 GB; only the ~2 GB
        of codes ever reach the chip). The encode pass streams the RAW
        storage bytes host→device once (``rows_device`` — int8 ships 4×
        fewer bytes than f32 and dequantizes on device) and the coarse
        fit random-reads only its sampled rows (``rows_sample``)."""
        def rows_sample(idx):
            blk = np.asarray(store.rows[idx], np.float32)
            if store.scales is not None:
                blk = blk * store.scales[idx][:, None]
            return blk

        return cls._fit(store.rows_f32, store.n, store.n, store.d,
                        n_clusters=n_clusters, nprobe=nprobe, m=m,
                        kmeans_iters=kmeans_iters, pq_iters=pq_iters,
                        seed=seed, cap_factor=cap_factor, sample=sample,
                        depth=depth, chunk=chunk, opq_iters=opq_iters,
                        anisotropic_t=anisotropic_t,
                        rows_dev=store.rows_device,
                        rows_sample=rows_sample)

    def search_adc(self, queries, k: int = 10,
                   depth: int | None = None, nprobe: int | None = None,
                   ids: "np.ndarray | None" = None, mask=None):
        """Raw-ADC search: ranking straight from the pruned
        compressed-domain scan — NO exact re-score, NO row gather. The
        serving mode for capacity deployments where the exact rows live
        in a host file and the per-query host gather + re-score
        (:meth:`search_host`) is the latency floor; everything here is
        one on-chip program over the resident codes.

        Quality is the RAW-ADC ranking: fit the view with
        ``anisotropic_t`` (score-aware codes, ops/pq.py) to hold top-1 —
        measured profile in ops/pq.py and tests/unit/test_apq.py.
        ``ids``: optional [N] id array (``Index.ids`` / ``store.ids``);
        row POSITIONS are returned when omitted. ``mask``: optional
        [1, N] int8 subset filter over row positions
        (search/subset.py)."""
        p = min(nprobe or self.nprobe, self.n_clusters)
        depth = max(k, depth or self.depth)
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        s, pos = _adc_select_jit(
            self.centroids, self.codes, self.bucket_pos,
            self.spill_codes, self.spill_pos, self.spill_cluster,
            self.codebook.centroids, q, self.rotation, mask,
            depth=depth, nprobe=p)
        from ..utils.chunking import fetch
        s, pos = fetch(s[:, :k], pos[:, :k])
        if s.shape[1] < k:                  # tiny view: fewer probed rows
            padw = ((0, 0), (0, k - s.shape[1]))
            s = np.pad(s, padw, constant_values=-np.inf)
            pos = np.pad(pos, padw, constant_values=-1)
        if ids is not None:
            ids = np.asarray(ids)
            pos = np.where(pos >= 0, ids[np.maximum(pos, 0)], -1)
        return s, pos.astype(np.int32)

    def search_host(self, store: "HostRowStore", queries, k: int = 10,
                    depth: int | None = None, nprobe: int | None = None,
                    mask=None):
        """The capacity-scale cascade: pruned residual ADC ON CHIP over
        the resident codes (``_adc_select_jit``), then the exact re-score
        ON HOST against the memory-mapped row store — only ``depth`` rows
        per query are ever read (random reads of depth·D bytes), so the
        exact store never needs to fit any chip. Returns
        ``(scores [B, k], ids [B, k])`` with the store's ids (positions
        when none were given). Equals the device cascade's ranking
        exactly — same ADC candidates, same exact scores."""
        p = min(nprobe or self.nprobe, self.n_clusters)
        depth = depth or self.depth
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        _, pos = _adc_select_jit(
            self.centroids, self.codes, self.bucket_pos,
            self.spill_codes, self.spill_pos, self.spill_cluster,
            self.codebook.centroids, jnp.asarray(q), self.rotation, mask,
            depth=depth, nprobe=p)
        pos = np.asarray(pos)                                # [B, dd]
        rows = store.gather(pos)                             # [B, dd, D]
        exact = np.einsum("bkd,bd->bk", rows, q,
                          dtype=np.float32)
        exact = np.where(pos >= 0, exact, -np.inf)
        order = np.argsort(-exact, axis=1, kind="stable")[:, :k]
        s = np.take_along_axis(exact, order, axis=1)
        out_pos = np.take_along_axis(pos, order, axis=1)
        ids = np.where(out_pos >= 0, store.ids_at(out_pos), -1)
        if s.shape[1] < k:
            padw = ((0, 0), (0, k - s.shape[1]))
            s = np.pad(s, padw, constant_values=-np.inf)
            ids = np.pad(ids, padw, constant_values=-1)
        return s.astype(np.float32), ids.astype(np.int32)

    # ------------------------------------------------------------------
    def measure_recall(self, index, queries, k: int = 10,
                       depth: int | None = None,
                       nprobe: int | None = None) -> float:
        """recall@k vs the exact brute-force ranking — the build-time
        honesty number, jointly over (nprobe, depth). The exact reference
        resets EVERY candidate-tier routing field (the IVF tier's r4
        lesson: an attached view must not define its own truth)."""
        from .ivf import recall_vs_exact
        exact_s, exact_ids = index.search(
            queries, index.cfg.search.replace(
                k=k, qe_enabled=False, rerank_enabled=False,
                ivf_nprobe=0, pq_depth=0, ivfpq_nprobe=0))
        _, got = self.search(index, queries, k=k, depth=depth,
                             nprobe=nprobe)
        return recall_vs_exact(exact_ids, got)

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        arrs = dict(centroids=np.asarray(self.centroids),
                    codes=np.asarray(self.codes),
                    bucket_pos=np.asarray(self.bucket_pos),
                    spill_codes=np.asarray(self.spill_codes),
                    spill_pos=np.asarray(self.spill_pos),
                    spill_cluster=np.asarray(self.spill_cluster),
                    pq_centroids=np.asarray(self.codebook.centroids))
        if self.rotation is not None:
            arrs["rotation"] = np.asarray(self.rotation)
        np.savez(os.path.join(path, "ivfpq.npz"), **arrs)
        with open(os.path.join(path, "ivfpq.json"), "w") as f:
            json.dump({"nprobe": self.nprobe, "depth": self.depth,
                       "anisotropic_t": self.anisotropic_t}, f)

    @classmethod
    def load(cls, path: str) -> "IVFPQView":
        with open(os.path.join(path, "ivfpq.json")) as f:
            meta = json.load(f)
        raw = np.load(os.path.join(path, "ivfpq.npz"))
        return cls(jnp.asarray(raw["centroids"]),
                   jnp.asarray(raw["codes"], jnp.int8),
                   jnp.asarray(raw["bucket_pos"], jnp.int32),
                   jnp.asarray(raw["spill_codes"], jnp.int8),
                   jnp.asarray(raw["spill_pos"], jnp.int32),
                   jnp.asarray(raw["spill_cluster"], jnp.int32),
                   PQCodebook(jnp.asarray(raw["pq_centroids"])),
                   nprobe=int(meta["nprobe"]), depth=int(meta["depth"]),
                   rotation=(jnp.asarray(raw["rotation"])
                             if "rotation" in raw.files else None),
                   anisotropic_t=meta.get("anisotropic_t"))


class HostRowStore:
    """Memory-mapped host-side exact-row store for capacity-scale
    serving (the deployment form of the regime ``bench_ivfpq_capacity``
    measures: the chip holds the 32 B/row codes, the host holds the
    exact rows, and a query reads only its ``depth`` candidates — a few
    hundred KB of random reads — never the whole store).

    On-disk layout under ``path/``: ``rows.bin`` ([N, D] row-major in
    the storage dtype), optional ``scales.bin`` ([N] f32 per-row scales
    for int8 storage), optional ``ids.bin`` ([N] int32 — absent means
    ids ARE positions), ``store.json`` metadata. int8 rows dequantize
    with their scales at gather time; float16/float32 pass through.
    """

    def __init__(self, path: str):
        with open(os.path.join(path, "store.json")) as f:
            meta = json.load(f)
        self.n, self.d = int(meta["n"]), int(meta["d"])
        self._dtype = np.dtype(meta["dtype"])
        self.rows = np.memmap(os.path.join(path, "rows.bin"), mode="r",
                              dtype=self._dtype, shape=(self.n, self.d))
        spath = os.path.join(path, "scales.bin")
        # per-row scales / ids are tiny next to the rows (4 B vs D+ B per
        # row) — load them fully, only rows.bin stays a mapping
        self.scales = (np.fromfile(spath, dtype=np.float32)
                       if os.path.exists(spath) else None)
        ipath = os.path.join(path, "ids.bin")
        self.ids = (np.fromfile(ipath, dtype=np.int32)
                    if os.path.exists(ipath) else None)

    # ---- construction -------------------------------------------------
    @classmethod
    def create(cls, path: str, rows, scales=None, ids=None,
               dtype: str = "int8", chunk: int = 262_144
               ) -> "HostRowStore":
        """Write a store from an array-like ``rows`` ([N, D], any float
        dtype, or pre-quantized int8 WITH ``scales``). ``dtype='int8'``
        with float input quantizes per-row symmetric (the int4/int8
        tiers' convention: scale = max|row| / 127)."""
        rows = np.asarray(rows)
        n, d = rows.shape
        os.makedirs(path, exist_ok=True)
        out_dtype = np.dtype(dtype)
        mm = np.memmap(os.path.join(path, "rows.bin"), mode="w+",
                       dtype=out_dtype, shape=(n, d))
        if rows.dtype == np.int8:
            if out_dtype != np.int8 or scales is None:
                raise ValueError("int8 input rows need dtype='int8' and "
                                 "their per-row scales")
            mm[:] = rows
        elif out_dtype == np.int8:
            scales = np.empty((n,), np.float32)
            for s in range(0, n, chunk):
                blk = rows[s:s + chunk].astype(np.float32)
                sc = np.abs(blk).max(axis=1) / 127.0
                sc = np.where(sc > 0, sc, 1.0).astype(np.float32)
                scales[s:s + chunk] = sc
                mm[s:s + chunk] = np.clip(
                    np.rint(blk / sc[:, None]), -127, 127).astype(np.int8)
        else:
            for s in range(0, n, chunk):
                mm[s:s + chunk] = rows[s:s + chunk].astype(out_dtype)
        mm.flush()
        if scales is not None:
            np.asarray(scales, np.float32).tofile(
                os.path.join(path, "scales.bin"))
        if ids is not None:
            np.asarray(ids, np.int32).tofile(os.path.join(path, "ids.bin"))
        with open(os.path.join(path, "store.json"), "w") as f:
            json.dump({"n": n, "d": d, "dtype": out_dtype.name}, f)
        return cls(path)

    # ---- build-side reads ----------------------------------------------
    def rows_device(self, start: int, count: int) -> jax.Array:
        """Dequantized f32 chunk [count, D] ON DEVICE, shipped as the RAW
        storage bytes (int8 = 4× less tunnel/PCIe traffic than f32) and
        dequantized by one jitted program. This is the fit/encode-path
        reader — at 64M×512 the build streams the whole store once, and
        host-side dequantize + f32 transfer was measured 4–8× slower
        end-to-end on this box's ~50 MB/s tunnel."""
        end = min(start + count, self.n)
        blk = jnp.asarray(np.ascontiguousarray(self.rows[start:end]))
        sc = (jnp.asarray(self.scales[start:end])
              if self.scales is not None else None)
        return _dequant_pad_jit(blk, sc, pad=count - (end - start))

    # ---- serving-side reads -------------------------------------------
    def rows_f32(self, start: int, count: int) -> np.ndarray:
        """Dequantized f32 chunk [count, D] (zero-padded past N) — the
        reader contract IVFPQView._fit consumes."""
        end = min(start + count, self.n)
        blk = np.asarray(self.rows[start:end], np.float32)
        if self.scales is not None:
            blk = blk * self.scales[start:end, None]
        if end - start < count:
            blk = np.pad(blk, ((0, count - (end - start)), (0, 0)))
        return blk

    def gather(self, pos: np.ndarray) -> np.ndarray:
        """Dequantized f32 rows at ``pos`` [B, n] (zeros for pos < 0)."""
        safe = np.maximum(pos, 0)
        rows = np.asarray(self.rows[safe.ravel()], np.float32)
        rows = rows.reshape(*pos.shape, self.d)
        if self.scales is not None:
            rows = rows * self.scales[safe][..., None]
        return np.where((pos >= 0)[..., None], rows, 0.0)

    def ids_at(self, pos: np.ndarray) -> np.ndarray:
        safe = np.maximum(pos, 0)
        return (safe if self.ids is None else self.ids[safe]).astype(
            np.int32)
