"""Fused PQ-ADC top-k scan kernel — compressed-domain search on the MXU.

Scores ``q · decode(codes)`` for every row WITHOUT decoding: per query,
a lookup table ``lut[m, j] = q_m · C[m, j]`` (ops/pq.pq_lut) reduces a
row's score to ``Σ_m lut[m, code_m]``. The classic CPU/GPU ADC loop is a
random gather per (row, subspace) — the one memory pattern TPUs are bad
at. This kernel restates the lookup as dense linear algebra:

    onehot(codes) [T, M·16]  @  lut_flat [M·16, B]   →  scores [T, B]

i.e. LUT lookup == matmul against a one-hot expansion of the codes. The
one-hot never touches HBM — it is (re)built in VMEM per tile from the
packed nibble stream, so the scan reads **M/2 bytes per row** (32 B at
D=512, M=64 — 8× less than the int4 tier, 32× less than bf16) while the
MXU does the "gather". The merge epilogue (threshold skip, tiered
candidate insert) is shared with the dense kernels via
topk_matmul._fold_tile, so ranking discipline cannot drift between
tiers.

Nibble layout is the proven int4 store format (byte = 16·v_hi +
(v_lo+8); ops/pq.encode_pq): the high code is ONE arithmetic shift (via
int32 — Mosaic has no int8 vector shift, CLAUDE.md landmine) and the low
code a multiply-subtract. Two code→one-hot constructions are kept and
A/B-measured on chip (``variant``):

  * 'matmul' (default) — expand codes through a constant 0/1 matrix R
    ([M/2, M/2·16], R[m, 16m+j] = 1) on the MXU, then compare. One
    extra tiny int8 matmul per half; lowers cleanly everywhere.
  * 'repeat' — broadcast+reshape the [T, M/2] codes to [T, M/2·16] and
    compare against a constant ``col % 16`` row. One VPU compare pass
    per half — but REAL Mosaic cannot lower it at production shapes
    (measured 2026-08-18, libtpu 0.0.34: int8 minor-dim broadcast is
    rejected outright, and the int32 form dies in infer-vector-layout
    on the [T, G, 16]→[T, 16G] shape cast). Kept for interpret-mode
    cross-checks only.

K is fixed at 16 (4-bit codes): the one-hot contraction is then 16/ds·D
wide — at the default ds=8 exactly 2·D, so a PQ scan pays about the MXU
work of a 2×-wider bf16 scan for 1/16 of its HBM traffic. Bandwidth-
bound scans have idle MXUs; that is the trade this whole kernel makes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk_matmul import NEG_INF, _fold_tile


def _onehot_half(codes32, *, groups: int, variant: str):
    """[T, M/2] int32 codes in [0,16) → [T, M/2·16] bf16 one-hot.

    Constants are rebuilt from iota each grid step (Pallas kernels cannot
    capture trace-time arrays): ``col16[c] = c & 15`` selects the slot
    within a group, and the matmul variant's expansion matrix is
    ``R[m, c] = (c >> 4 == m)``. The repeat variant's minor-dim broadcast
    must stay int32 — Mosaic only lowers non-no-op minor-dim insertion
    for 32-bit types (measured failure on int8 at these shapes)."""
    t = codes32.shape[0]
    g16 = groups * 16
    col = jax.lax.broadcasted_iota(jnp.int32, (1, g16), 1)
    col16 = col & 15
    if variant == "repeat":
        rep = jnp.broadcast_to(codes32[:, :, None],
                               (t, groups, 16)).reshape(t, g16)
    else:
        rows = jax.lax.broadcasted_iota(jnp.int32, (groups, g16), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (groups, g16), 1)
        r = (rows == (cols >> 4)).astype(jnp.int8)
        rep = jax.lax.dot_general(
            codes32.astype(jnp.int8), r,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    return (rep == col16).astype(jnp.bfloat16)


def _kernel_pq(num_valid_ref, *refs, k: int, tile_n: int, variant: str,
               masked: bool = False):
    """``masked=True`` threads a [1, T] int8 subset-mask block
    (search/subset.py) ANDed into the padding predicate — filtering at
    ADC *selection*, so the depth budget is spent on allowed rows."""
    if masked:
        (packed_ref, mask_ref, lut_lo_ref, lut_hi_ref,
         out_s_ref, out_i_ref, top_s, top_i) = refs
    else:
        (packed_ref, lut_lo_ref, lut_hi_ref,
         out_s_ref, out_i_ref, top_s, top_i) = refs
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        top_s[:] = jnp.full_like(top_s, NEG_INF)
        top_i[:] = jnp.full_like(top_i, -1)

    packed = packed_ref[:]                          # [T, M/2] int8
    groups = packed.shape[1]
    p32 = packed.astype(jnp.int32)
    v_hi = p32 >> 4                                 # signed nibble [-8, 8)
    lo = p32 - 16 * v_hi                            # c_lo ∈ [0, 16)
    hi = v_hi + 8                                   # c_hi ∈ [0, 16)

    oh_lo = _onehot_half(lo, groups=groups, variant=variant)
    oh_hi = _onehot_half(hi, groups=groups, variant=variant)
    dn = (((1,), (1,)), ((), ()))
    scores = jax.lax.dot_general(                   # [B, T] f32
        lut_lo_ref[:], oh_lo, dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    scores = scores + jax.lax.dot_general(
        lut_hi_ref[:], oh_hi, dimension_numbers=dn,
        preferred_element_type=jnp.float32)

    base = step * tile_n
    row_ids = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    valid = row_ids < num_valid_ref[0]
    if masked:
        valid = valid & (mask_ref[:].astype(jnp.int32) > 0)   # i8 cmpi fails to legalize in Mosaic (like the i8 shift, CLAUDE.md) — compare in i32
    scores = jnp.where(valid, scores, NEG_INF)

    tau = jnp.min(top_s[:], axis=1, keepdims=True)
    row_max = jnp.max(scores, axis=1, keepdims=True)
    tile_interesting = jnp.any(row_max > tau)   # NaN-free (see topk_matmul)

    @pl.when(tile_interesting)
    def _maybe_merge():
        n_above = jnp.sum(scores > tau, axis=1)
        _fold_tile(scores, row_ids, tau, row_max, n_above, top_s, top_i,
                   k=k, tile_n=tile_n)

    @pl.when(step == num_steps - 1)
    def _emit():
        out_s_ref[:] = top_s[:]
        out_i_ref[:] = top_i[:]


def default_tile_n_pq(n: int, groups: int, b: int = 1, k: int = 10) -> int:
    """Row tile for the PQ scan. The VMEM pressure is NOT the packed
    stream (32 B/row is nothing) but the in-VMEM expansion chain per
    half: int32 shift temp [T, M/2], one-hot [T, M/2·16] bf16 (+ its
    int8/int32 precursors), stacked ~3 deep in scoped VMEM, plus the
    [B, T] merge temporaries and the [B, k] running top-k. 1024 rows
    fits comfortably at M=64, B≤128; scale down for small N (must
    divide) and large B·T merges. The merge folds candidates per tile,
    so the tile must also cover k — very deep cascades (depth > 1024,
    e.g. full-depth exactness checks) grow the tile instead of failing,
    VMEM permitting."""
    g16 = groups * 16

    def fits(tile):
        expand = 3 * tile * g16 * 2          # one-hot chain, both halves
        merge = 4 * b * tile * 4             # scores + 3 merge temps f32
        topk = 2 * b * k * 4                 # running (scores, ids)
        return expand + merge + topk <= 11 * 1024 * 1024 and (
            k <= 16 or b * tile <= 128 * 2048 or tile >= k)

    tiles = [t for t in (1024, 512, 256, 128) if t >= k]
    t = 2048
    while t <= n and not tiles:               # k > 1024: grow to cover it
        if t >= k:
            tiles.append(t)
        t *= 2
    for tile in tiles:
        if n % tile == 0 and fits(tile):
            return tile
    if k <= n and fits(n):
        return n                              # one full-width block
    raise ValueError(f"no valid PQ row tile for N={n}, k={k} at "
                     f"M={2 * groups}, B={b} (pad rows / lower depth)")


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret",
                                             "variant"))
def _run_pq(packed, lut_lo, lut_hi, nv, mask=None, *, k: int, tile_n: int,
            interpret: bool, variant: str):
    n, groups = packed.shape
    b = lut_lo.shape[0]
    in_specs = [
        pl.BlockSpec((tile_n, groups), lambda i, nv_ref: (i, 0)),
        pl.BlockSpec((b, groups * 16), lambda i, nv_ref: (0, 0)),
        pl.BlockSpec((b, groups * 16), lambda i, nv_ref: (0, 0)),
    ]
    operands = [packed, lut_lo, lut_hi]
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
    kernel = functools.partial(_kernel_pq, k=k, tile_n=tile_n,
                               variant=variant, masked=mask is not None)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * groups * 32,
            bytes_accessed=n * groups + 2 * b * groups * 16 * 2
            + 2 * b * k * 4,
            transcendentals=0),
        interpret=interpret,
    )(nv, *operands)


def pq_topk(packed: jax.Array, q: jax.Array, codebook, k: int = 10,
            num_valid: "jax.Array | int | None" = None,
            tile_n: int | None = None, interpret: bool = False,
            variant: str = "matmul", mask: "jax.Array | None" = None):
    """Fused ADC top-k over a PQ store: ``packed [N, M/2]`` int8 codes
    (ops/pq.encode_pq), ``q [B, D]`` float, ``codebook`` a PQCodebook →
    ``(scores [B, k] f32 desc-sorted, row_ids [B, k] int32)``.

    Scores equal ``q @ decode_pq(packed).T`` up to the bf16 rounding of
    the per-query LUT (the codes themselves contribute no further error
    — the one-hot contraction is exact). ``mask`` ([1, N] int8, 1 =
    allowed) restricts selection to a row subset (search/subset.py)."""
    from ..ops.pq import pq_lut

    n, groups = packed.shape
    m = 2 * groups
    b = q.shape[0]
    if codebook.m != m:
        raise ValueError(f"packed groups {groups} need m={m}, "
                         f"codebook has m={codebook.m}")
    if q.shape[1] != codebook.dim:
        raise ValueError(f"query dim {q.shape[1]} != codebook dim "
                         f"{codebook.dim}")
    if variant not in ("repeat", "matmul"):
        raise ValueError(f"variant must be repeat|matmul, got {variant!r}")
    if tile_n is None:
        tile_n = default_tile_n_pq(n, groups, b=b, k=k)
    if n % tile_n:
        raise ValueError(f"N={n} not a multiple of tile_n={tile_n}")
    if k > tile_n:
        raise ValueError(f"k={k} > tile_n={tile_n}")
    nv = jnp.asarray([n if num_valid is None else num_valid], jnp.int32)

    lut = pq_lut(q, codebook)                       # [B, M, 16] f32
    lut_lo = lut[:, :groups].reshape(b, groups * 16).astype(jnp.bfloat16)
    lut_hi = lut[:, groups:].reshape(b, groups * 16).astype(jnp.bfloat16)
    return _run_pq(packed, lut_lo, lut_hi, nv, mask, k=k, tile_n=tile_n,
                   interpret=interpret, variant=variant)
