"""Product quantization (PQ) — the compressed-domain storage tier.

The reference scores f32 rows with one BLAS matmul (SURVEY.md §1.1 C11);
its only capacity lever is RAM. The rebuild already added int8/int4 rows
(ops/quantize.py) — PQ is the classic next rung (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011): split D into M
subspaces, vector-quantize each against a tiny per-subspace codebook, and
store only the 4-bit code per subspace. At M = D/8 subquantizers a 512-d
row costs 32 bytes — 8× less than int4, 64× less than bf16 — and scoring
never reconstructs: ``score(q, x) = Σ_m LUT_q[m, code_m(x)]`` where
``LUT_q[m, j] = q_m · C[m, j]`` is per-query (asymmetric distance
computation, ADC — the query stays full precision, so only the DATABASE
side is quantized).

TPU-native design decisions (vs the CPU/GPU literature):

  * K = 16 centroids per subspace (4-bit codes), NOT the classic 256.
    TPUs have no fast random gather — the scan kernel
    (kernels/pq_scan.py) turns the LUT lookup into MXU matmuls against a
    16-wide one-hot, whose cost scales with K·M; K=16, M=D/8 makes the
    one-hot contraction exactly 2·D wide, i.e. the compute of a bf16 scan
    at the bandwidth of a 16×-compressed one. K=256 would be 32·D wide —
    MXU-bound at large query batches, defeating the point.
  * The fit runs ALL subspaces batched in one jitted program: Lloyd's
    assignment is a [chunk, M, K] batched matmul and the accumulation an
    einsum back onto [M, K, ds] — no per-subspace host loop, no sklearn.
    Euclidean k-means (NOT the spherical variant in ops/kmeans.py): PQ
    reconstruction error is what bounds the score error ``|q·x − q·x̂| ≤
    ‖q‖·‖x − x̂‖``, so centroids must live where the sub-vectors live,
    magnitudes included.
  * Codes are packed two per byte in the SAME offset-nibble byte layout
    as the int4 row store (ops/quantize.quantize_rows_int4: byte =
    16·v_hi + (v_lo + 8) with v = code − 8, split-half subspace
    mapping), so the scan kernel unpacks with the one proven int32 shift
    and keeps every remaining op on the MXU.

PQ is lossy — it is the coarse tier of a coarse→exact cascade
(IndexRefine pairs it with an exact re-score, same as the int4 tier);
recall@depth against the exact scan is the quality metric, measured in
tests and on-chip benches.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .kmeans import pick_chunk


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class PQCodebook:
    """Per-subspace centroids ``[M, K, ds]`` f32; ``M·ds = D``, K = 16."""
    centroids: jax.Array

    def tree_flatten(self):
        return (self.centroids,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def m(self) -> int:
        return self.centroids.shape[0]

    @property
    def k(self) -> int:
        return self.centroids.shape[1]

    @property
    def ds(self) -> int:
        return self.centroids.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.ds


def default_m(d: int) -> int:
    """Largest even subquantizer count ≤ max(2, d//8) that divides d —
    the D/8 heuristic of Jégou TPAMI'11 adjusted to the nibble packing
    (even m) and the subspace constraint (m | d). Plain d//8 breaks on
    dims like 56 (m=7: odd) that real scaled-down extractors produce."""
    for m in range(max(2, (d // 8) & ~1), 1, -2):
        if d % m == 0:
            return m
    raise ValueError(f"no even subquantizer count divides dim {d}")


def _check_dims(d: int, m: int) -> int:
    if m % 2:
        raise ValueError(f"m={m} must be even (codes pack two per byte)")
    if d % m:
        raise ValueError(f"descriptor dim {d} not divisible by m={m}")
    return d // m


@partial(jax.jit, static_argnames=("n_clusters", "chunk"))
def _pq_lloyd_iter(xs: jax.Array, cent: jax.Array,
                   num_valid, *, n_clusters: int, chunk: int):
    """One Lloyd iteration over ALL subspaces at once.

    ``xs [N/chunk, chunk, M, ds]`` (pre-reshaped), ``cent [M, K, ds]`` →
    (new centroids, counts [M, K], total sqerr). Assignment minimizes the
    true Euclidean distance; ‖x‖² is constant per row so argmin over
    ``‖c‖² − 2·x·c`` suffices.
    """
    nv = jnp.asarray(num_valid, jnp.int32)
    cb = cent.astype(jnp.bfloat16)
    cn2 = jnp.sum(cent * cent, axis=-1)                     # [M, K] f32

    def step(carry, xc):
        base, sums, counts, err = carry
        xf = xc.astype(jnp.bfloat16)                        # [chunk, M, ds]
        # batched over M: [M, chunk, ds] · [M, K, ds] -> [M, chunk, K]
        dots = jax.lax.dot_general(
            xf.transpose(1, 0, 2), cb,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dist = cn2[:, None, :] - 2.0 * dots                 # [M, chunk, K]
        a = jnp.argmin(dist, axis=2)                        # [M, chunk]
        pos = base + jnp.arange(chunk, dtype=jnp.int32)
        valid = (pos < nv).astype(jnp.bfloat16)             # [chunk]
        onehot = (jax.nn.one_hot(a, n_clusters, dtype=jnp.bfloat16)
                  * valid[None, :, None])                   # [M, chunk, K]
        # accumulation on the MXU: [M, K, chunk] @ [M, chunk, ds]
        sums = sums + jax.lax.dot_general(
            onehot, xf.transpose(1, 0, 2),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # [M, K, ds]
        counts = counts + jnp.sum(onehot, axis=1).astype(jnp.int32)
        # residual ‖x − c_a‖² = ‖x‖² + min dist (up to bf16 rounding)
        xn2 = jnp.sum(xf.astype(jnp.float32) ** 2, axis=-1)  # [chunk, M]
        err = err + jnp.sum(jnp.where(valid[:, None] > 0,
                                      xn2 + jnp.min(dist, axis=2).T, 0.0))
        return (base + chunk, sums, counts, err), None

    init = (jnp.int32(0),
            jnp.zeros_like(cent),
            jnp.zeros((cent.shape[0], n_clusters), jnp.int32),
            jnp.float32(0.0))
    (_, sums, counts, err), _ = jax.lax.scan(step, init, xs)
    new = jnp.where(counts[..., None] > 0,
                    sums / jnp.maximum(counts[..., None], 1).astype(jnp.float32),
                    cent)
    return new, counts, err


def _lloyd_loop(x: jax.Array, cent: jax.Array, nv: int, iters: int,
                chunk: int, rng, k: int) -> jax.Array:
    """``iters`` Lloyd iterations over ALL subspaces with empty-cluster
    respawn on fresh row samples — the shared core of fit_pq (cold init)
    and fit_opq (warm-started refresh after each rotation update)."""
    n, d = x.shape
    m, _, ds = cent.shape
    xs = x.reshape(n // chunk, chunk, m, ds)
    for _ in range(iters):
        cent, counts, _ = _pq_lloyd_iter(xs, cent, nv, n_clusters=k,
                                         chunk=chunk)
        counts_np = np.asarray(counts)                      # [M, K]
        if (counts_np == 0).any():
            rows = rng.choice(nv, size=k, replace=False)
            resp = np.asarray(x[rows], np.float32).reshape(k, m, ds)
            # np.array, not asarray: device arrays view as READ-ONLY
            # numpy (surfaced the first time a respawn actually fired)
            cent_np = np.array(cent)
            for mi, ki in zip(*np.nonzero(counts_np == 0)):
                cent_np[mi, ki] = resp[ki, mi]
            cent = jnp.asarray(cent_np)
    return cent


def fit_pq(x: jax.Array, m: int = 64, k: int = 16, *,
           num_valid: int | None = None, iters: int = 15, seed: int = 0,
           chunk: int = 16384) -> PQCodebook:
    """Fit a PQ codebook on ``x [N, D]`` (rows ≥ num_valid are padding).

    K is fixed at 16 by the scan kernel's one-hot width (module
    docstring); the parameter exists so the constraint is explicit at the
    call site. Init is a deterministic row sample per subspace; empty
    clusters respawn on rows of the currently-largest cluster.
    """
    n, d = x.shape
    ds = _check_dims(d, m)
    if k != 16:
        raise ValueError("PQ tier is 4-bit: k must be 16 "
                         "(kernels/pq_scan.py one-hot width)")
    nv = int(num_valid if num_valid is not None else n)
    if nv < k:
        raise ValueError(f"{nv} rows < {k} centroids")
    chunk = pick_chunk(n, chunk)
    rng = np.random.default_rng(seed)
    take = rng.choice(nv, size=k, replace=False)
    sample = np.asarray(x[take], np.float32)                # [K, D]
    cent = jnp.asarray(sample.reshape(k, m, ds).transpose(1, 0, 2))
    return PQCodebook(_lloyd_loop(x, cent, nv, iters, chunk, rng, k))


@jax.jit
def _procrustes_update(x: jax.Array, xhat: jax.Array) -> jax.Array:
    """Orthogonal Procrustes: ``argmin_R ‖X·R − X̂‖_F`` over R ∈ O(D) is
    ``R = U·Vᵀ`` for ``Xᵀ·X̂ = U·S·Vᵀ`` — one [D, D] SVD on device."""
    mm = jax.lax.dot_general(x, xhat, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    u, _, vt = jnp.linalg.svd(mm, full_matrices=False)
    return u @ vt


def fit_opq(x: jax.Array, m: int = 64, k: int = 16, *,
            num_valid: int | None = None, opq_iters: int = 8,
            pq_iters: int = 15, refine_iters: int = 4, seed: int = 0,
            chunk: int = 16384) -> "tuple[jax.Array, PQCodebook]":
    """Optimized Product Quantization (Ge et al., "Optimized Product
    Quantization for Approximate Nearest Neighbor Search", CVPR 2013 —
    the non-parametric alternation of §4.1): learn an orthogonal rotation
    ``R [D, D]`` so PQ in the rotated space has minimal reconstruction
    error. Plain PQ quantizes each D/M-dim slice independently, so
    correlated dimensions that straddle subspace boundaries (the norm in
    whitened/PCA'd descriptor spaces, where variance is deliberately
    spread) waste code entropy; the rotation re-mixes coordinates to
    balance variance and decorrelate across subspaces.

    Alternation, everything on device: (1) encode X·R under the current
    codebook and decode to X̂; (2) Procrustes-solve R ← U·Vᵀ from
    SVD(Xᵀ·X̂) — the closed-form optimal rotation for fixed codes; (3)
    refresh the codebook with warm-started Lloyd iterations in the new
    space. Since R is orthogonal, ``q·x = (q·R)·(x·R)`` — scoring rotates
    the QUERY once ([B, D] matmul, free) and the ADC kernel is untouched.

    Returns ``(rotation [D, D] f32, PQCodebook)``; reconstruction error
    is non-increasing in the alternation up to Lloyd re-assignment noise
    (pinned looser in tests)."""
    n, d = x.shape
    _check_dims(d, m)
    nv = int(num_valid if num_valid is not None else n)
    chunk = pick_chunk(n, chunk)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(x, jnp.float32)
    cb = fit_pq(x, m=m, k=k, num_valid=nv, iters=pq_iters, seed=seed,
                chunk=chunk)
    r = jnp.eye(d, dtype=jnp.float32)
    xr = x
    for _ in range(opq_iters):
        xhat = decode_pq(encode_pq(xr, cb, chunk=chunk), cb)
        r = _procrustes_update(x[:nv], xhat[:nv])
        xr = x @ r
        cent = _lloyd_loop(xr, cb.centroids, nv, refine_iters, chunk,
                           rng, k)
        cb = PQCodebook(cent)
    return r, cb


def pq_reconstruction_mse(x: jax.Array, cb: PQCodebook,
                          rotation: "jax.Array | None" = None) -> float:
    """Mean squared reconstruction error of the (optionally rotated) PQ
    code of ``x`` — the quantity OPQ's alternation minimizes, and the
    honest A/B number between a plain and an OPQ codebook."""
    xr = x if rotation is None else x @ rotation
    err = xr - decode_pq(encode_pq(xr, cb), cb)
    return float(jnp.mean(jnp.sum(err * err, axis=1)))


@partial(jax.jit, static_argnames=("chunk",))
def _encode_chunked(xs: jax.Array, cent: jax.Array, *, chunk: int):
    cb = cent.astype(jnp.bfloat16)
    cn2 = jnp.sum(cent * cent, axis=-1)                     # [M, K]

    def step(_, xc):
        dots = jax.lax.dot_general(
            xc.astype(jnp.bfloat16).transpose(1, 0, 2), cb,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # [M, chunk, K]
        a = jnp.argmin(cn2[:, None, :] - 2.0 * dots, axis=2)
        return None, a.T.astype(jnp.int32)                  # [chunk, M]

    _, codes = jax.lax.scan(step, None, xs)
    return codes


def encode_pq(x: jax.Array, cb: PQCodebook, *,
              chunk: int = 16384) -> jax.Array:
    """Encode ``x [N, D]`` → packed codes ``[N, M/2]`` int8.

    Split-half offset-nibble layout (shared with quantize_rows_int4 so
    kernels unpack identically): byte j holds subspace j in the LOW
    nibble and subspace j + M/2 in the HIGH nibble, with the code c
    stored as the signed nibble v = c − 8:  byte = 16·v_hi + (v_lo + 8).
    """
    n, d = x.shape
    m = cb.m
    ds = _check_dims(d, m)
    if ds != cb.ds:
        raise ValueError(f"x dim {d} != codebook dim {cb.dim}")
    chunk = pick_chunk(n, chunk)
    codes = _encode_chunked(x.reshape(n // chunk, chunk, m, ds),
                            cb.centroids, chunk=chunk)
    codes = codes.reshape(n, m)
    v = codes - 8                                            # [-8, 8)
    lo, hi = v[:, :m // 2], v[:, m // 2:]
    return (16 * hi + lo + 8).astype(jnp.int8)


def unpack_pq(packed: jax.Array) -> jax.Array:
    """Packed ``[N, M/2]`` int8 → codes ``[N, M]`` int32 in [0, 16)."""
    p = packed.astype(jnp.int32)
    v_hi = p >> 4                       # exact: low half stored offset +8
    lo = p - 16 * v_hi                  # = v_lo + 8 ∈ [0, 16)
    return jnp.concatenate([lo, v_hi + 8], axis=1)


def decode_pq(packed: jax.Array, cb: PQCodebook) -> jax.Array:
    """Reconstruct ``x̂ [N, D]`` f32 — the test/oracle inverse; production
    scoring never decodes (ADC in kernels/pq_scan.py)."""
    codes = unpack_pq(packed)                                # [N, M]
    m_idx = jnp.arange(cb.m)[None, :]                        # [1, M]
    gathered = cb.centroids[m_idx, codes]                    # [N, M, ds]
    return gathered.reshape(packed.shape[0], -1)


# ---------------------------------------------------------------------------
# Anisotropic (score-aware) PQ — Guo et al., "Accelerating Large-Scale
# Inference with Anisotropic Vector Quantization" (ScaNN), ICML 2020.
#
# Vanilla PQ minimizes reconstruction MSE ‖x − x̂‖², but inner-product
# RANKING error is dominated by the residual component PARALLEL to the
# datapoint: queries that score x highly point roughly along x, so an
# error along x moves x's score for exactly those queries, while the
# orthogonal error averages out. The score-aware loss re-weights:
#
#     ℓ(x, x̂) = ‖r‖² + (η − 1)·⟨r, x⟩²/‖x‖²,     r = x − x̂,
#
# with η = h∥/h⊥ ≥ 1 derived from the paper's threshold parameter T
# (Theorem 3.2 for unit-norm data): η = (d − 1)·T²/(1 − T²).
#
# TPU-native implementation notes:
#   * The parallel term couples subspaces (⟨r, x⟩ = Σ_m ⟨r_m, x_m⟩), so
#     assignment is coordinate descent over subspaces — ONE lax.scan over
#     the m-axis per sweep, each step a [N, K] matmul + argmin, carrying
#     the running total s_i = ⟨r_i, x_i⟩. No per-subspace host loop.
#   * The codebook update is closed-form per (subspace, cluster): setting
#     the gradient of the summed loss to zero gives the K ds×ds systems
#       [n_k·I + Σ_i h_ik γ_i d_i d_iᵀ]·c = Σ_i h_ik y_i
#                     + Σ_i h_ik γ_i (s_other,i + ⟨y_i, d_i⟩)·d_i
#     solved batched on device (ds = 8 → trivially small solves), also a
#     scan over m so s_other tracks the sequentially-updated centroids.
#   * ``y`` (the quantized vector) and ``d`` (the score direction) are
#     separate arguments: flat PQ uses y = d = x; the IVF-PQ tier fits
#     RESIDUALS y = x − c_coarse while the ranking direction stays the
#     original row d = x (q·x̂ error is still along x).
#   * Everything runs full-array on the fit SAMPLE (≤ a few hundred k
#     rows, [N, D] f32) — the encode of the full store stays chunked.
#
# Measured profile at THIS framework's operating point (4-bit codes,
# unit-norm descriptors; A/B in tests/unit/test_apq.py and preserved
# sweeps in experiments/): parallel error E[⟨r, x⟩²] drops ~7× at t=0.2
# (total MSE +60% — the designed trade), raw-ADC score error at the true
# match of near-duplicate queries drops ~2.6× and raw-ADC top-1 rises
# (0.92→0.95 typical). Cascade candidate recall at depth ≫ k is FLAT
# (t-sweep 0.05–0.2, multiple seeds): competitor items y with q ∦ y feel
# the enlarged orthogonal error, which cancels the true-match win when
# an exact re-score follows anyway. Use ``anisotropic_t`` for ADC-only
# serving (scores consumed without re-score); leave it off for the
# re-scored cascade, where it buys nothing and costs fit/encode sweeps.
# ---------------------------------------------------------------------------


def eta_from_threshold(t: float, d: int) -> float:
    """ScaNN's parallel/orthogonal weight ratio η for unit-norm data at
    score threshold ``t`` (arXiv:1908.10396 Theorem 3.2): as t → 0 the
    loss degrades to plain MSE (η → 1 is enforced as the floor)."""
    if not 0.0 <= t < 1.0:
        raise ValueError(f"anisotropic threshold t={t} must be in [0, 1)")
    return max(1.0, (d - 1) * t * t / (1.0 - t * t))


def _apq_prep(y: jax.Array, d_vec: jax.Array, m: int, eta: float):
    """Reshape to the [M, N, ds] scan layout + per-point parallel weight
    γ_i = (η − 1)/‖d_i‖² (zero-norm rows get γ = 0 → plain MSE)."""
    n, dim = y.shape
    ds = dim // m
    ym = jnp.asarray(y, jnp.float32).reshape(n, m, ds).transpose(1, 0, 2)
    dm = jnp.asarray(d_vec, jnp.float32).reshape(n, m, ds).transpose(1, 0, 2)
    dn2 = jnp.sum(jnp.asarray(d_vec, jnp.float32) ** 2, axis=1)      # [N]
    gam = jnp.where(dn2 > 0, (eta - 1.0) / jnp.maximum(dn2, 1e-12), 0.0)
    return ym, dm, gam


@partial(jax.jit, static_argnames=("k",))
def _apq_assign_sweep(ym, dm, gam, cent, codes, t, *, k: int):
    """One coordinate-descent assignment sweep over all subspaces.

    Carries s_i = Σ_m t_im; per subspace m picks the centroid minimizing
    ‖y_m − c_j‖² + γ·(s_other + ⟨y_m − c_j, d_m⟩)² given the other
    subspaces' CURRENT codes — the exact per-coordinate loss, so each
    step never increases the total anisotropic loss."""
    s = jnp.sum(t, axis=0)                                   # [N]

    def step(s, inp):
        y1, d1, c1, t1 = inp                # [N,ds], [N,ds], [K,ds], [N]
        s_other = s - t1
        dots_y = y1 @ c1.T                                   # [N, K]
        cn2 = jnp.sum(c1 * c1, axis=-1)                      # [K]
        e = jnp.sum(y1 * y1, axis=-1)[:, None] - 2.0 * dots_y + cn2[None]
        yd = jnp.sum(y1 * d1, axis=-1)                       # [N]
        b = yd[:, None] - d1 @ c1.T                          # ⟨y−c_j, d⟩
        loss = e + gam[:, None] * jnp.square(s_other[:, None] + b)
        a = jnp.argmin(loss, axis=1).astype(jnp.int32)
        t_new = jnp.take_along_axis(b, a[:, None], axis=1)[:, 0]
        return s_other + t_new, (a, t_new)

    s, (codes, t) = jax.lax.scan(step, s, (ym, dm, cent, t))
    return codes, t


@partial(jax.jit, static_argnames=("k",))
def _apq_update_sweep(ym, dm, gam, cent, codes, t, *, k: int):
    """One codebook-update sweep: per subspace (sequential, so s_other
    reflects already-updated subspaces) solve the K closed-form ds×ds
    systems for fixed codes, then refresh that subspace's t."""
    s = jnp.sum(t, axis=0)
    ds = ym.shape[-1]
    eye = jnp.eye(ds, dtype=jnp.float32)

    def step(s, inp):
        y1, d1, c1, a1, t1 = inp
        s_other = s - t1
        h = jax.nn.one_hot(a1, k, dtype=jnp.float32)         # [N, K]
        nk = jnp.sum(h, axis=0)                              # [K]
        dg = d1 * gam[:, None]                               # [N, ds]
        a_mat = (jnp.einsum("nk,nd,ne->kde", h, dg, d1)
                 + nk[:, None, None] * eye)
        yd = jnp.sum(y1 * d1, axis=-1)
        rhs = (h.T @ y1
               + jnp.einsum("nk,n,nd->kd", h, gam * (s_other + yd), d1))
        c_new = jnp.linalg.solve(a_mat, rhs[..., None])[..., 0]
        c_new = jnp.where(nk[:, None] > 0, c_new, c1)
        t_new = yd - jnp.sum(c_new[a1] * d1, axis=-1)
        return s_other + t_new, (c_new, t_new)

    _, (cent, t) = jax.lax.scan(step, s, (ym, dm, cent, codes, t))
    return cent, t


@jax.jit
def _apq_loss(ym, dm, gam, cent, codes):
    """Mean anisotropic loss of the current (codes, centroids) — the
    quantity the alternation minimizes; pinned non-increasing in tests."""
    def step(carry, inp):
        e, s = carry
        y1, d1, c1, a1 = inp
        r = y1 - c1[a1]
        return (e + jnp.sum(r * r, axis=-1),
                s + jnp.sum(r * d1, axis=-1)), None
    n = ym.shape[1]
    (e, s), _ = jax.lax.scan(
        step, (jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32)),
        (ym, dm, cent, codes))
    return jnp.mean(e + gam * s * s)


def fit_apq(y: jax.Array, m: int = 64, k: int = 16, *,
            directions: "jax.Array | None" = None, t: float = 0.2,
            num_valid: int | None = None, init_iters: int = 15,
            sweeps: int = 6, seed: int = 0,
            chunk: int = 16384) -> PQCodebook:
    """Fit an anisotropic PQ codebook on ``y [N, D]`` (module comment
    above for the loss and the TPU decomposition).

    ``directions`` is the score-direction vector per row (defaults to
    ``y`` itself — flat PQ; IVF-PQ passes the original rows while ``y``
    holds coarse residuals). Init = vanilla Lloyd (``fit_pq``), then
    ``sweeps`` alternations of CD assignment + closed-form updates. Runs
    full-array on the fit sample — callers pass the (bounded) sample they
    already draw, not the whole store."""
    n, d = y.shape
    _check_dims(d, m)
    nv = int(num_valid if num_valid is not None else n)
    y = jnp.asarray(y, jnp.float32)[:nv]
    d_vec = y if directions is None else (
        jnp.asarray(directions, jnp.float32)[:nv])
    if d_vec.shape != y.shape:
        raise ValueError(f"directions {d_vec.shape} != rows {y.shape}")
    eta = eta_from_threshold(t, d)
    cb = fit_pq(y, m=m, k=k, iters=init_iters, seed=seed, chunk=chunk)
    ym, dm, gam = _apq_prep(y, d_vec, m, eta)
    cent = cb.centroids
    # initial codes from the plain-PQ assignment (one MSE E-step: γ = 0
    # makes s_other irrelevant, so zero init codes/t are fine; the
    # returned t is already consistent with the returned codes)
    codes, tpar = _apq_assign_sweep(ym, dm, jnp.zeros_like(gam), cent,
                                    jnp.zeros((m, nv), jnp.int32),
                                    jnp.zeros((m, nv), jnp.float32), k=k)
    for _ in range(sweeps):
        codes, tpar = _apq_assign_sweep(ym, dm, gam, cent, codes, tpar,
                                        k=k)
        cent, tpar = _apq_update_sweep(ym, dm, gam, cent, codes, tpar,
                                       k=k)
    return PQCodebook(cent)


def encode_apq(y: jax.Array, cb: PQCodebook, *,
               directions: "jax.Array | None" = None, t: float = 0.2,
               sweeps: int = 2, chunk: int = 16384) -> jax.Array:
    """Encode under the SAME score-aware loss the codebook was fit with
    (a plain nearest-centroid encode would forfeit most of the ranking
    win — the assignment is where the parallel penalty bites). Chunked
    CD sweeps initialized from the MSE assignment; packed like
    ``encode_pq``."""
    n, d = y.shape
    m = cb.m
    _check_dims(d, m)
    eta = eta_from_threshold(t, d)
    y = jnp.asarray(y, jnp.float32)
    d_all = y if directions is None else jnp.asarray(directions,
                                                     jnp.float32)
    chunk = pick_chunk(n, chunk)
    out = np.empty((n, m), np.int32)
    for s0 in range(0, n, chunk):
        ym, dm, gam = _apq_prep(y[s0:s0 + chunk], d_all[s0:s0 + chunk],
                                m, eta)
        codes, tpar = _apq_assign_sweep(ym, dm, jnp.zeros_like(gam),
                                        cb.centroids,
                                        jnp.zeros((m, chunk), jnp.int32),
                                        jnp.zeros((m, chunk), jnp.float32),
                                        k=cb.k)
        for _ in range(sweeps):
            codes, tpar = _apq_assign_sweep(ym, dm, gam, cb.centroids,
                                            codes, tpar, k=cb.k)
        out[s0:s0 + chunk] = np.asarray(codes.T)
    v = out - 8
    lo, hi = v[:, :m // 2], v[:, m // 2:]
    return jnp.asarray((16 * hi + lo + 8).astype(np.int8))


def pq_lut(q: jax.Array, cb: PQCodebook) -> jax.Array:
    """ADC lookup tables: ``q [B, D]`` → ``[B, M, K]`` f32,
    ``lut[b, m, j] = q[b]_m · C[m, j]``. Scoring a row with codes c is
    ``Σ_m lut[b, m, c_m]`` — equal to ``q · decode(codes)`` exactly."""
    b, d = q.shape
    ds = _check_dims(d, cb.m)
    if ds != cb.ds:
        raise ValueError(f"query dim {d} != codebook dim {cb.dim}")
    qs = q.reshape(b, cb.m, ds)
    return jnp.einsum("bmd,mkd->bmk", qs.astype(jnp.float32),
                      cb.centroids)
