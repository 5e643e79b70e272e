"""Fused matmul + running top-k Pallas kernel (SURVEY.md N5 — THE native
component, replacing the reference's BLAS matmul + host argsort).

Design (SURVEY.md §3.2, §7 Phase 3): the index matrix X [N, D] streams from
HBM through VMEM in row tiles (Pallas auto-double-buffers the grid); the
query block q [B, D] stays VMEM-resident. Each grid step computes
``q @ tile.T`` on the MXU and folds the tile's scores into a running top-k
carried in VMEM scratch across the sequential TPU grid — the same
online-reduction shape as flash-attention's running max (SURVEY.md §5
long-context analog).

Three tricks make it speed-of-light (HBM-bound):
  * threshold skip — a tile only pays a merge when its max score beats the
    current k-th best (rare after warm-up), so the steady-state per-tile
    work is one matmul + one max-reduce;
  * tiered candidate extraction — merging tiles mostly carry 1-4 new
    candidates, pulled with that many argmax rounds over [B, T];
  * rank-based sorted insert (_insert_sorted) — candidates fold into the
    sorted running top-k by rank arithmetic in O(B*k*m), with compile size
    independent of k (no sort support in Mosaic; the k-round masked-argmax
    merge remains only for the rare dense tiles, cmax > 4).

Padding rows (id < num_valid is false) are masked to -inf before the merge
so they can never enter a top-k.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = np.float32(-np.inf)  # plain numpy: jnp scalars become captured tracers


def _insert_sorted(cand_s, cand_i, top_s, top_i, k: int):
    """Insert m (descending, -inf-padded) candidates into the descending
    [B, k] running top-k by RANK ARITHMETIC — no k-round loop:

      new rank of top[i]  = i + #candidates strictly greater     (i + 0..m)
      new rank of cand[j] = #top >= cand[j] + j   (ties: top wins, stable)

    The ranks are a permutation, so the output scatters as m+1 static
    right-shifts of the top list (each element moves right by its
    candidate count) plus an m-element one-hot add. O(B*k*m) VPU work and
    compile size independent of k — the k-round masked-argmax merge this
    replaces for the insert tiers was O(k*(k+m)) per call and unrolled k
    rounds into the program (k=100 rerank candidates made both costs
    bite). -inf candidates rank past k by construction and drop out.
    """
    b, m = cand_s.shape
    # everything below stays 2-D [B, k] / [B, 1] with the small m axis
    # unrolled (m <= 4) — 3-D [B, m, k] intermediates would force
    # layout-hostile tiny trailing dims through Mosaic
    col = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)     # [B, k]
    shift = jnp.zeros((b, k), jnp.int32)
    cranks = []
    for j in range(m):
        cj = cand_s[:, j:j + 1]                              # [B, 1]
        shift = shift + (cj > top_s).astype(jnp.int32)
        cranks.append(jnp.sum((top_s >= cj).astype(jnp.int32),
                              axis=1, keepdims=True) + j)    # [B, 1]
    out_s = jnp.zeros_like(top_s)
    out_i = jnp.zeros_like(top_i)
    # a shift of s >= k pushes every element selected by it past rank k-1
    # (rank = i + s >= s), so those contribute nothing (bites when m > k)
    for s in range(min(m, k - 1) + 1):
        sel = shift == s
        vs = jnp.where(sel, top_s, 0.0)
        vi = jnp.where(sel, top_i, 0)
        if s:
            vs = jnp.concatenate(
                [jnp.zeros((b, s), top_s.dtype), vs[:, :-s]], axis=1)
            vi = jnp.concatenate(
                [jnp.zeros((b, s), top_i.dtype), vi[:, :-s]], axis=1)
        out_s = out_s + vs
        out_i = out_i + vi
    for j in range(m):
        onehot = col == cranks[j]                            # [B, k]
        out_s = out_s + jnp.where(onehot, cand_s[:, j:j + 1], 0.0)
        out_i = out_i + jnp.where(onehot, cand_i[:, j:j + 1], 0)
    return out_s, out_i


def _merge_topk(scores, ids, top_s, top_i, k: int):
    """Fold [B, T] tile scores into the running [B, k] top-k (descending).

    k rounds of masked argmax over the concatenation; returns new (top_s,
    top_i). All shapes static; runs on the VPU. For k > 16 the rounds are
    ROLLED into a fori_loop (review r3): unrolling k=100 rounds stacked
    ~20 MB of per-round temporaries in scoped VMEM against the 16 MB
    limit — the rolled loop keeps one round's buffers live. Small k stays
    unrolled (the dense tier is the only merge path there and straight-
    line code measures faster)."""
    comb_s = jnp.concatenate([top_s, scores], axis=1)          # [B, k+T]
    comb_i = jnp.concatenate([top_i, ids], axis=1)
    b, m = comb_s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)
    if k <= 16:
        new_s = []
        new_i = []
        for _ in range(k):
            best = jnp.max(comb_s, axis=1, keepdims=True)       # [B, 1]
            am = jnp.argmax(comb_s, axis=1).astype(jnp.int32)   # [B]
            sel = col == am[:, None]                            # one-hot
            best_i = jnp.sum(jnp.where(sel, comb_i, 0), axis=1,
                             keepdims=True)
            new_s.append(best)
            new_i.append(best_i)
            comb_s = jnp.where(sel, NEG_INF, comb_s)
        return (jnp.concatenate(new_s, axis=1),
                jnp.concatenate(new_i, axis=1).astype(jnp.int32))

    kcol = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)       # [B, k]

    def body(j, carry):
        cs, out_s, out_i = carry
        best = jnp.max(cs, axis=1, keepdims=True)               # [B, 1]
        am = jnp.argmax(cs, axis=1).astype(jnp.int32)           # [B]
        sel = col == am[:, None]
        best_i = jnp.sum(jnp.where(sel, comb_i, 0), axis=1, keepdims=True)
        write = kcol == j                                       # column j
        out_s = jnp.where(write, best, out_s)
        out_i = jnp.where(write, best_i, out_i)
        return jnp.where(sel, NEG_INF, cs), out_s, out_i

    _, out_s, out_i = jax.lax.fori_loop(
        0, k, body, (comb_s, jnp.full((b, k), NEG_INF, comb_s.dtype),
                     jnp.full((b, k), -1, jnp.int32)))
    return out_s, out_i.astype(jnp.int32)



def _extract_candidates(scores, row_ids, tau, n_cand: int):
    """Pull the per-query top-``n_cand`` of a tile via n_cand argmax rounds
    over [B, T]; entries not strictly above tau come back (-inf, -1).
    Cheaper than the full merge when only a few candidates exist:
    n_cand rounds of O(T) instead of k rounds of O(T + k)."""
    b, t = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    work = scores
    cs, ci = [], []
    for _ in range(n_cand):
        best = jnp.max(work, axis=1, keepdims=True)             # [B, 1]
        am = jnp.argmax(work, axis=1).astype(jnp.int32)
        sel = col == am[:, None]
        idx = jnp.sum(jnp.where(sel, row_ids, 0), axis=1, keepdims=True)
        good = best > tau
        cs.append(jnp.where(good, best, NEG_INF))
        ci.append(jnp.where(good, idx, -1))
        work = jnp.where(sel, NEG_INF, work)
    return jnp.concatenate(cs, axis=1), jnp.concatenate(ci, axis=1)


def _fold_tile(scores, row_ids, tau, row_max, n_above, top_s, top_i,
               *, k: int, tile_n: int):
    """Tiered fold of one tile's [B, T] scores into the running top-k
    scratch refs — shared by the bf16 and int8 kernels so the merge
    discipline cannot drift between them.

    Tiers by ``cmax`` (max candidates above tau for any query):
      1        -> one argmax pass + rank insert
      2..4     -> 4 extraction rounds + rank insert (common at large B)
      5..16    -> 16 extraction rounds + rank insert, only when k > 16
                  (review r3: at k=100 rerank depth, B>=32 pushes many
                  tiles past cmax=4 and the dense fallback's k unrolled
                  argmax rounds dominated the whole scan — 16 rounds are
                  ~6x cheaper; at k <= 16 the dense merge is itself <= 16
                  rounds, so the tier would only add compile size)
      else     -> dense k-round masked-argmax merge (first tiles)
    """
    b = scores.shape[0]
    cmax = jnp.max(n_above)

    @pl.when(cmax == 1)
    def _insert_one():
        # common case: at most ONE new candidate per query. One argmax
        # pass + a tiny [B, k+1] extraction — O(T) not O(k*T).
        am = jnp.argmax(scores, axis=1).astype(jnp.int32)   # [B]
        col = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
        sel = col == am[:, None]
        cand_i = jnp.sum(jnp.where(sel, row_ids, 0), axis=1, keepdims=True)
        has = n_above[:, None] > 0
        cand_s = jnp.where(has, row_max, NEG_INF)           # [B, 1]
        cand_i = jnp.where(has, cand_i, -1)
        new_s, new_i = _insert_sorted(cand_s, cand_i,
                                      top_s[:], top_i[:], k)
        top_s[:] = new_s
        top_i[:] = new_i

    @pl.when((cmax > 1) & (cmax <= 4))
    def _insert_few():
        # 2-4 candidates somewhere in the batch: 4 extraction rounds
        # over [B, T] + a [B, k+4] merge — ~2.5x cheaper than the
        # full k-round merge
        cand_s, cand_i = _extract_candidates(scores, row_ids, tau, 4)
        new_s, new_i = _insert_sorted(cand_s, cand_i,
                                      top_s[:], top_i[:], k)
        top_s[:] = new_s
        top_i[:] = new_i

    if k > 16:
        @pl.when((cmax > 4) & (cmax <= 16))
        def _insert_mid():
            cand_s, cand_i = _extract_candidates(scores, row_ids, tau, 16)
            new_s, new_i = _insert_sorted(cand_s, cand_i,
                                          top_s[:], top_i[:], k)
            top_s[:] = new_s
            top_i[:] = new_i

    dense = (cmax > 16) if k > 16 else (cmax > 4)

    @pl.when(dense)
    def _merge_full():
        ids_bt = jnp.broadcast_to(row_ids, (b, tile_n))   # merge-only
        new_s, new_i = _merge_topk(scores, ids_bt, top_s[:], top_i[:], k)
        top_s[:] = new_s
        top_i[:] = new_i


def _kernel(num_valid_ref, *refs, k: int, tile_n: int, masked: bool = False):
    """``masked=True`` threads a [1, T] int8 subset-mask block (the
    search/subset.py allow-list) that ANDs into the padding predicate —
    one O(T) compare per tile, 1 byte/row of extra stream."""
    if masked:
        x_ref, mask_ref, q_ref, out_s_ref, out_i_ref, top_s, top_i = refs
    else:
        x_ref, q_ref, out_s_ref, out_i_ref, top_s, top_i = refs
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        top_s[:] = jnp.full_like(top_s, NEG_INF)
        top_i[:] = jnp.full_like(top_i, -1)

    # [B, T] scores on the MXU, f32 accumulation
    scores = jax.lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    base = step * tile_n
    # [1, T] row ids / validity, broadcast against [B, T]: the epilogue
    # runs on EVERY tile, so per-element work there is the batched-mode
    # bottleneck — keep it O(T), not O(B*T)
    row_ids = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    valid = row_ids < num_valid_ref[0]
    if masked:
        valid = valid & (mask_ref[:].astype(jnp.int32) > 0)   # i8 cmpi fails to legalize in Mosaic (like the i8 shift, CLAUDE.md) — compare in i32
    scores = jnp.where(valid, scores, NEG_INF)

    # per-query threshold = current k-th best; a tile is interesting for
    # query b only if some score beats tau_b. Steady state pays ONE
    # max-reduce; the count/argmax passes are gated behind it.
    tau = jnp.min(top_s[:], axis=1, keepdims=True)          # [B, 1]
    row_max = jnp.max(scores, axis=1, keepdims=True)        # [B, 1]
    # NB: elementwise > (not max(row_max - tau)): a fully-padded tile has
    # row_max = tau = -inf and their difference is NaN; -inf > -inf is a
    # well-defined False, so empty tiles skip the merge by construction.
    tile_interesting = jnp.any(row_max > tau)

    @pl.when(tile_interesting)
    def _maybe_merge():
        n_above = jnp.sum(scores > tau, axis=1)             # [B]
        _fold_tile(scores, row_ids, tau, row_max, n_above, top_s, top_i,
                   k=k, tile_n=tile_n)

    @pl.when(step == num_steps - 1)
    def _emit():
        out_s_ref[:] = top_s[:]
        out_i_ref[:] = top_i[:]


def _kernel_int8(num_valid_ref, *refs, k: int, tile_n: int,
                 masked: bool = False):
    """int8 variant: int8 x int8 -> int32 on the MXU, dequantized by
    per-row and per-query scales before the (shared) top-k merge.
    ``masked`` as in _kernel."""
    if masked:
        (x_ref, scales_ref, mask_ref, q_ref, qs_ref,
         out_s_ref, out_i_ref, top_s, top_i) = refs
    else:
        (x_ref, scales_ref, q_ref, qs_ref,
         out_s_ref, out_i_ref, top_s, top_i) = refs
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        top_s[:] = jnp.full_like(top_s, NEG_INF)
        top_i[:] = jnp.full_like(top_i, -1)

    acc = jax.lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                  # [B, T] int32
    scores = acc.astype(jnp.float32) * qs_ref[:] * scales_ref[:]

    base = step * tile_n
    row_ids = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    valid = row_ids < num_valid_ref[0]       # [1, T], broadcasts (see _kernel)
    if masked:
        valid = valid & (mask_ref[:].astype(jnp.int32) > 0)   # i8 cmpi fails to legalize in Mosaic (like the i8 shift, CLAUDE.md) — compare in i32
    scores = jnp.where(valid, scores, NEG_INF)

    tau = jnp.min(top_s[:], axis=1, keepdims=True)
    row_max = jnp.max(scores, axis=1, keepdims=True)
    tile_interesting = jnp.any(row_max > tau)   # NaN-free; see _kernel

    @pl.when(tile_interesting)
    def _maybe_merge():
        n_above = jnp.sum(scores > tau, axis=1)
        _fold_tile(scores, row_ids, tau, row_max, n_above, top_s, top_i,
                   k=k, tile_n=tile_n)

    @pl.when(step == num_steps - 1)
    def _emit():
        out_s_ref[:] = top_s[:]
        out_i_ref[:] = top_i[:]


def _kernel_int4(num_valid_ref, *refs, k: int, tile_n: int,
                 masked: bool = False):
    """int4 variant: the tile streams PACKED [T, D/2] bytes (half the int8
    bytes, quarter of bf16). The offset nibble layout
    (ops/quantize.quantize_rows_int4: byte = 16*hi + lo + 8) moves the
    unpack onto the MXU — the only per-tile VPU op is ONE arithmetic
    shift for the high nibble; the low nibble never materializes:

        q_lo·lo + q_hi·hi = q_lo·byte + (q_hi)·hi − 16·(q_lo·hi) − 8·Σq_lo

    i.e. three int8 MXU matmuls (free in a bandwidth-bound scan — the MXU
    idles between tiles) and a per-query constant ``qoff = 8·Σq_lo``
    computed outside. Measured on-chip: the previous 7-pass VPU unpack
    erased the packed stream's bandwidth win over int8; this form keeps
    it. Merge discipline is the shared _fold_tile. ``masked`` as in
    _kernel."""
    if masked:
        (x_ref, scales_ref, mask_ref, q_ref, qoff_ref, qs_ref,
         out_s_ref, out_i_ref, top_s, top_i) = refs
    else:
        (x_ref, scales_ref, q_ref, qoff_ref, qs_ref,
         out_s_ref, out_i_ref, top_s, top_i) = refs
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        top_s[:] = jnp.full_like(top_s, NEG_INF)
        top_i[:] = jnp.full_like(top_i, -1)

    packed = x_ref[:]                                   # [T, D/2] int8
    # Mosaic has no i8 vector shift (arith.shrsi fails to legalize) —
    # route through int32; three elementwise passes, the whole unpack
    hi = (packed.astype(jnp.int32) >> 4).astype(jnp.int8)  # comp. j + D/2
    dp = packed.shape[1]
    q_lo = q_ref[:, :dp]
    q_hi = q_ref[:, dp:]
    dn = (((1,), (1,)), ((), ()))
    m1 = jax.lax.dot_general(q_lo, packed, dimension_numbers=dn,
                             preferred_element_type=jnp.int32)
    m2 = jax.lax.dot_general(q_hi, hi, dimension_numbers=dn,
                             preferred_element_type=jnp.int32)
    m3 = jax.lax.dot_general(q_lo, hi, dimension_numbers=dn,
                             preferred_element_type=jnp.int32)  # [B, T]
    acc = m1 + m2 - 16 * m3 - qoff_ref[:]
    scores = acc.astype(jnp.float32) * qs_ref[:] * scales_ref[:]

    base = step * tile_n
    row_ids = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    valid = row_ids < num_valid_ref[0]
    if masked:
        valid = valid & (mask_ref[:].astype(jnp.int32) > 0)   # i8 cmpi fails to legalize in Mosaic (like the i8 shift, CLAUDE.md) — compare in i32
    scores = jnp.where(valid, scores, NEG_INF)

    tau = jnp.min(top_s[:], axis=1, keepdims=True)
    row_max = jnp.max(scores, axis=1, keepdims=True)
    tile_interesting = jnp.any(row_max > tau)   # NaN-free; see _kernel

    @pl.when(tile_interesting)
    def _maybe_merge():
        n_above = jnp.sum(scores > tau, axis=1)
        _fold_tile(scores, row_ids, tau, row_max, n_above, top_s, top_i,
                   k=k, tile_n=tile_n)

    @pl.when(step == num_steps - 1)
    def _emit():
        out_s_ref[:] = top_s[:]
        out_i_ref[:] = top_i[:]


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def topk_matmul_int4(x_packed: jax.Array, scales: jax.Array, q: jax.Array,
                     k: int = 10,
                     num_valid: "jax.Array | int | None" = None,
                     tile_n: int | None = None, interpret: bool = False,
                     mask: "jax.Array | None" = None):
    """Fused top-k over a per-row int4-quantized index
    (ops/quantize.quantize_rows_int4): ``x_packed [N, D//2]`` int8 nibble
    pairs, ``scales [1, N]``, ``q [B, D]`` float ->
    ``(scores [B,k] f32, row_ids [B,k] i32)``.

    The HBM scan reads a QUARTER of bf16's bytes; the query is quantized
    to int8 on the fly (finer than the rows — costs nothing, halves the
    quantization noise of the product). ``qoff = 8·Σq_lo`` corrects the
    stored low-nibble offset (see _kernel_int4). ``mask`` ([1, N] int8,
    1 = allowed) restricts selection to a row subset
    (search/subset.py)."""
    n, dp = x_packed.shape
    b, d = q.shape
    if d != 2 * dp:
        raise ValueError(f"query dim {d} != 2 * packed dim {dp}")
    if tile_n is None:
        tile_n = default_tile_n_int4(n, dp, b=b, k=k)
    if n % tile_n:
        raise ValueError(f"N={n} not a multiple of tile_n={tile_n}")
    if k > tile_n:
        raise ValueError(f"k={k} > tile_n={tile_n}")
    nv = jnp.asarray([n if num_valid is None else num_valid], jnp.int32)

    from ..ops.quantize import quantize_rows
    q_qr = quantize_rows(q)                 # int8 query at /127 resolution
    q_int8, q_scale = q_qr.values, q_qr.scales.reshape(-1, 1)    # [B,1]
    qoff = 8 * jnp.sum(q_int8[:, :dp].astype(jnp.int32), axis=1,
                       keepdims=True)                            # [B,1]

    in_specs = [
        pl.BlockSpec((tile_n, dp), lambda i, nv_ref: (i, 0)),
        pl.BlockSpec((1, tile_n), lambda i, nv_ref: (0, i)),
        pl.BlockSpec((b, d), lambda i, nv_ref: (0, 0)),
        pl.BlockSpec((b, 1), lambda i, nv_ref: (0, 0)),
        pl.BlockSpec((b, 1), lambda i, nv_ref: (0, 0)),
    ]
    operands = [x_packed, scales, q_int8, qoff, q_scale]
    if mask is not None:
        in_specs.insert(2, pl.BlockSpec((1, tile_n),
                                        lambda i, nv_ref: (0, i)))
        operands.insert(2, mask.astype(jnp.int8))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile_n,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, k), lambda i, nv_ref: (0, 0)),
            pl.BlockSpec((b, k), lambda i, nv_ref: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
    )
    kernel = functools.partial(_kernel_int4, k=k, tile_n=tile_n,
                               masked=mask is not None)
    out_s, out_i = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=3 * b * n * d,
            bytes_accessed=n * dp + n * 4 + b * d + 2 * b * k * 4,
            transcendentals=0),
        interpret=interpret,
    )(nv, *operands)
    return out_s, out_i


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def topk_matmul_int8(x_int8: jax.Array, scales: jax.Array, q: jax.Array,
                     k: int = 10,
                     num_valid: "jax.Array | int | None" = None,
                     tile_n: int | None = None, interpret: bool = False,
                     mask: "jax.Array | None" = None):
    """Fused top-k over a per-row int8-quantized index
    (ops/quantize.quantize_rows): ``x_int8 [N, D]``, ``scales [1, N]``,
    ``q [B, D]`` float -> ``(scores [B,k] f32, row_ids [B,k] i32)``.

    The query block is quantized per-row on the fly; scoring is
    int8 x int8 -> int32 on the MXU (2x the bf16 throughput) and the HBM
    scan reads half the bytes of bf16. ``mask`` ([1, N] int8, 1 =
    allowed) restricts selection to a row subset (search/subset.py).
    """
    n, d = x_int8.shape
    b = q.shape[0]
    if tile_n is None:
        tile_n = default_tile_n(n, d, jnp.int8, b=b, k=k)
    if n % tile_n:
        raise ValueError(f"N={n} not a multiple of tile_n={tile_n}")
    if k > tile_n:
        raise ValueError(f"k={k} > tile_n={tile_n}")
    nv = jnp.asarray([n if num_valid is None else num_valid], jnp.int32)

    # the SAME per-row symmetric scheme that quantized the index rows
    # (ops/quantize.quantize_rows) — int8 scoring correctness depends on
    # query and index scales agreeing, so one shared definition
    from ..ops.quantize import quantize_rows
    q_qr = quantize_rows(q)
    q_int8, q_scale = q_qr.values, q_qr.scales.reshape(-1, 1)    # [B,1]

    in_specs = [
        pl.BlockSpec((tile_n, d), lambda i, nv_ref: (i, 0)),
        pl.BlockSpec((1, tile_n), lambda i, nv_ref: (0, i)),
        pl.BlockSpec((b, d), lambda i, nv_ref: (0, 0)),
        pl.BlockSpec((b, 1), lambda i, nv_ref: (0, 0)),
    ]
    operands = [x_int8, scales, q_int8, q_scale]
    if mask is not None:
        in_specs.insert(2, pl.BlockSpec((1, tile_n),
                                        lambda i, nv_ref: (0, i)))
        operands.insert(2, mask.astype(jnp.int8))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile_n,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, k), lambda i, nv_ref: (0, 0)),
            pl.BlockSpec((b, k), lambda i, nv_ref: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
    )
    kernel = functools.partial(_kernel_int8, k=k, tile_n=tile_n,
                               masked=mask is not None)
    out_s, out_i = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d + n * 4 + b * d + 2 * b * k * 4,
            transcendentals=0),
        interpret=interpret,
    )(nv, *operands)
    return out_s, out_i


def default_tile_n(n: int, d: int, dtype=jnp.bfloat16, b: int = 1,
                   k: int = 10, masked: bool = False) -> int:
    """Pick a row tile: big enough to amortize, small enough that the
    double-buffered tile pair PLUS the per-tile [B, T] score/merge buffers
    stay under the ~16 MB VMEM budget (the merge concatenates ~3 [B, T]
    f32 temporaries, which dominates for large query batches).

    ``k > 16`` enables the kernel's 16-round extraction tier, whose
    [B, T] rounds make huge tiles merge-expensive at large B — measured
    on-chip at B=128, k=100: int8 tile 4096 -> 6.8 ms, 2048 -> 5.9 ms —
    so large-k selections cap B*T at the measured sweet spot. Every
    k <= 16 path keeps the exact pre-existing tiling.

    int8 (also packed int4) kernels stream a ``[1, N]`` row-scales
    operand in ``(1, tile)`` blocks, and the Mosaic lowering requires a
    block's LAST dim to be a multiple of 128 or the full array dim — so
    scaled dtypes only get 128-multiple tiles, falling back to ONE
    full-width block for small/odd N (found by running the example on
    the real chip with a 56-row int8 index: tile 8 failed to lower).
    ``masked`` (a [1, N] subset-mask operand, search/subset.py) streams
    the same (1, tile) block shape, so it inherits the identical
    constraint for bf16/f32 stores too."""
    bytes_per = jnp.dtype(dtype).itemsize
    int_scaled = jnp.dtype(dtype) == jnp.dtype(jnp.int8) or masked

    def fits(tile):
        tiles = 2 * tile * d * bytes_per            # double-buffered stream
        merge = 3 * b * tile * 4                    # [B, T] f32 temporaries
        return (tiles <= 6 * 1024 * 1024
                and tiles + merge <= 10 * 1024 * 1024
                and (k <= 16 or b * tile <= 128 * 2048))

    for tile in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if int_scaled and tile % 128 and tile != n:
            continue
        if n % tile == 0 and fits(tile):
            return tile
    if int_scaled and fits(n):
        return n        # one full-width block always satisfies the lowering
    raise ValueError(f"no valid row tile for N={n}; pad rows to a multiple of 8")


def default_tile_n_int4(n: int, dp: int, b: int = 1, k: int = 10) -> int:
    """Row tile for the packed-int4 kernel: the stream budget counts
    packed bytes (dp per row; measured on-chip, tile 4096 beat 2048 by
    ~15% at 1M×512). On top of default_tile_n's stream+merge budget the
    kernel holds the shifted high-nibble tile ([T, dp] int8, ~2 more
    dp-bytes per row with double buffering) and three [B, T] int32 matmul
    accumulators — halve while those would crowd the ~16 MB VMEM (stopping
    at 128: the scales block must keep lowering, see default_tile_n)."""
    tile = default_tile_n(n, dp, jnp.int8, b=b, k=k)
    while (tile % 128 == 0 and tile > 128
           and tile * dp * 4 + 7 * b * tile * 4 > 12 * 1024 * 1024):
        tile //= 2
    if n % tile and tile != n:
        raise ValueError(f"N={n} not a multiple of tile_n={tile}")
    return tile


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def topk_matmul(x: jax.Array, q: jax.Array, k: int = 10,
                num_valid: "jax.Array | int | None" = None,
                tile_n: int | None = None, interpret: bool = False,
                mask: "jax.Array | None" = None):
    """Fused brute-force top-k: ``x [N, D]``, ``q [B, D]`` ->
    ``(scores [B, k] f32 desc-sorted, row_ids [B, k] int32)``.

    ``num_valid`` masks padding rows (>= num_valid -> never returned);
    rows with id -1 come back only when fewer than k valid rows exist.
    ``mask`` ([1, N] int8, 1 = allowed) restricts selection to a row
    subset (search/subset.py) — rows outside it behave like padding.
    """
    n, d = x.shape
    b = q.shape[0]
    if tile_n is None:
        tile_n = default_tile_n(n, d, x.dtype, b=b, k=k,
                                masked=mask is not None)
    if n % tile_n:
        raise ValueError(f"N={n} not a multiple of tile_n={tile_n}")
    if k > tile_n:
        raise ValueError(f"k={k} > tile_n={tile_n}")
    nv = jnp.asarray([n if num_valid is None else num_valid], jnp.int32)

    in_specs = [
        pl.BlockSpec((tile_n, d), lambda i, nv_ref: (i, 0)),
        pl.BlockSpec((b, d), lambda i, nv_ref: (0, 0)),
    ]
    operands = [x, q.astype(x.dtype)]
    if mask is not None:
        in_specs.insert(1, pl.BlockSpec((1, tile_n),
                                        lambda i, nv_ref: (0, i)))
        operands.insert(1, mask.astype(jnp.int8))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile_n,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, k), lambda i, nv_ref: (0, 0)),
            pl.BlockSpec((b, k), lambda i, nv_ref: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
    )
    kernel = functools.partial(_kernel, k=k, tile_n=tile_n,
                               masked=mask is not None)
    out_s, out_i = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * x.dtype.itemsize + b * d * 4 + 2 * b * k * 4,
            transcendentals=0),
        interpret=interpret,
    )(nv, *operands)
    return out_s, out_i
