"""On-device spherical k-means — the coarse quantizer for the IVF tier.

The reference (SURVEY.md §1.1) searches by one brute-force scan and has no
ANN structure; the IVF tier (search/ivf.py) is a rebuild-side capability
that needs a clustering fit that runs AT INDEX SCALE on the chip. Lloyd's
algorithm maps perfectly onto the MXU:

  * assignment   = argmax over ``X @ C.T``       (one [chunk, C] matmul)
  * accumulation = ``onehot(assign).T @ X``      (another matmul)

so a fit over 1M x 512 rows is a handful of big batched matmuls per
iteration — no scalar loops, no host round-trips inside an iteration.
Descriptors are unit-norm (cosine == dot), so centroids are re-normalized
every iteration (spherical k-means); empty clusters respawn on the row
least served by the current codebook, which keeps cluster sizes usable as
IVF bucket capacities.

Everything is static-shape: rows are processed in fixed ``chunk`` slices
via ``lax.scan`` (padding rows masked by ``num_valid``), so one compiled
program serves every iteration.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _l2n(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def pick_chunk(n: int, want: int = 16384) -> int:
    """Largest divisor of ``n`` that is <= ``want`` — row stores are padded
    to multiples of 8 at minimum, so this terminates fast."""
    c = min(want, n)
    while n % c:
        c -= 1
    return c


@partial(jax.jit, static_argnames=("chunk",))
def assign_clusters(x: jax.Array, centroids: jax.Array,
                    num_valid: "jax.Array | int", *, chunk: int = 16384):
    """Nearest-centroid assignment: ``x [N, D]`` -> ``[N] int32``.

    Padding rows (position >= num_valid) come back as -1. N must be a
    multiple of ``chunk`` (the index store is tile-padded already);
    scores run in bf16 on the MXU — argmax only, precision is ample.
    """
    n, d = x.shape
    c = centroids.shape[0]
    nv = jnp.asarray(num_valid, jnp.int32)
    cb = centroids.astype(jnp.bfloat16)
    xs = x.reshape(n // chunk, chunk, d)

    def step(base, xc):
        scores = jax.lax.dot_general(
            xc.astype(jnp.bfloat16), cb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [chunk, C]
        a = jnp.argmax(scores, axis=1).astype(jnp.int32)
        pos = base + jnp.arange(chunk, dtype=jnp.int32)
        return base + chunk, jnp.where(pos < nv, a, -1)

    _, out = jax.lax.scan(step, jnp.int32(0), xs)
    return out.reshape(n)


@partial(jax.jit, static_argnames=("chunk", "n_clusters"))
def _lloyd_iter(x: jax.Array, centroids: jax.Array,
                num_valid: "jax.Array | int", *, n_clusters: int,
                chunk: int = 16384):
    """One Lloyd iteration: returns (new centroids [C, D] f32 unit-norm,
    counts [C] int32, mean cosine of each row to its centroid)."""
    n, d = x.shape
    nv = jnp.asarray(num_valid, jnp.int32)
    cb = centroids.astype(jnp.bfloat16)
    xs = x.reshape(n // chunk, chunk, d)

    def step(carry, xc):
        base, sums, counts, simsum = carry
        xf = xc.astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            xf, cb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [chunk, C]
        a = jnp.argmax(scores, axis=1)                     # [chunk]
        best = jnp.max(scores, axis=1)
        pos = base + jnp.arange(chunk, dtype=jnp.int32)
        valid = pos < nv
        onehot = (jax.nn.one_hot(a, n_clusters, dtype=jnp.bfloat16)
                  * valid[:, None].astype(jnp.bfloat16))   # [chunk, C]
        # accumulation on the MXU: [C, chunk] @ [chunk, D]
        sums = sums + jax.lax.dot_general(
            onehot, xf, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(
            onehot.astype(jnp.float32), axis=0).astype(jnp.int32)
        simsum = simsum + jnp.sum(jnp.where(valid, best, 0.0))
        return (base + chunk, sums, counts, simsum), None

    init = (jnp.int32(0),
            jnp.zeros((n_clusters, d), jnp.float32),
            jnp.zeros((n_clusters,), jnp.int32),
            jnp.float32(0.0))
    (_, sums, counts, simsum), _ = jax.lax.scan(step, init, xs)
    # empty clusters keep their previous centroid (respawn handled by the
    # host driver, which sees the counts)
    new = jnp.where(counts[:, None] > 0, _l2n(sums), centroids)
    return new, counts, simsum / jnp.maximum(nv.astype(jnp.float32), 1.0)


def fit_kmeans(x: jax.Array, n_clusters: int, *, num_valid: int | None = None,
               iters: int = 10, seed: int = 0, chunk: int = 16384,
               respawn_empty: bool = True):
    """Spherical k-means over ``x [N, D]`` (N a multiple of ``chunk``;
    rows >= num_valid are padding). Returns ``(centroids [C, D] f32
    unit-norm, assignments [N] int32 with -1 padding)``.

    Init: deterministic uniform row sample (k-means++ buys little for the
    coarse-quantizer use — nprobe > 1 forgives fuzzy boundaries). Empty
    clusters respawn on rows of the largest cluster, which doubles as a
    balance nudge for IVF bucket sizing.
    """
    n, d = x.shape
    nv = int(num_valid if num_valid is not None else n)
    if nv < n_clusters:
        raise ValueError(f"{nv} rows < {n_clusters} clusters")
    chunk = pick_chunk(n, chunk)
    rng = np.random.default_rng(seed)
    take = rng.choice(nv, size=n_clusters, replace=False)
    cent = _l2n(jnp.asarray(np.asarray(x[take], np.float32)))

    for _ in range(iters):
        cent, counts, _ = _lloyd_iter(x, cent, nv, n_clusters=n_clusters,
                                      chunk=chunk)
        if respawn_empty:
            counts_np = np.asarray(counts)
            empty = np.flatnonzero(counts_np == 0)
            if len(empty):
                # respawn on random valid rows (host pick, device write)
                rows = rng.choice(nv, size=len(empty), replace=False)
                cent = cent.at[jnp.asarray(empty)].set(
                    _l2n(jnp.asarray(np.asarray(x[rows], np.float32))))
    assignments = assign_clusters(x, cent, nv, chunk=chunk)
    return cent, assignments
