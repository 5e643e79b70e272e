"""Per-cluster (local) PCA whitening — the expert layer of the EP row.

The reference applies ONE global PCA-whitening to every descriptor
(SURVEY.md C9). A single linear map cannot whiten a mixture: if the
corpus has regions with different local covariance (building facades vs
foliage vs text), the global transform leaves each region's scores
mis-scaled. The classic fix from the ANN literature (per-cell local
rotations, as in locally-optimized PQ, arXiv:1404.1831 §3) is a bank of
per-cluster whitening transforms routed by a coarse quantizer:

    e(x)  = argmax_e  <x, centroid_e>           (same router as the IVF
                                                 tier — ops/kmeans.py)
    out   = L2( P_e(x) @ (x - mu_e) )

This file is the single-device fit/apply; ``parallel/ep.py`` shards the
expert bank over an 'expert' mesh axis (at E=1024, D=512, dim=512 the
bank is 1 GB of f32 — genuinely sharding-worthy) and combines with one
psum.

Fit design (offline, index-build time, TPU-first):

- Routing centroids come from the same spherical k-means as IVF.
- Per-cluster second moments are accumulated on device: rows are
  host-sorted by cluster once, then ONE compiled ``[chunk, D]`` program
  computes masked outer products for the (few, because sorted) clusters
  present in each chunk — ~N/chunk dispatches total, each a batch of
  f32 MXU matmuls, never a per-row host loop.
- Small clusters shrink toward the GLOBAL covariance/mean with weight
  n_e/(n_e + tau) (James–Stein-style), so a 5-member cluster degrades
  to exactly the reference's global whitening instead of exploding; the
  global moments are the sum of the per-cluster ones — no second pass.
- One batched ``eigh`` over ``[E, D, D]`` builds every projection in a
  single device call (identical math to ops/whitening.fit_whitening).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .kmeans import fit_kmeans
from .pooling import l2_normalize


class LocalWhiteningParams(NamedTuple):
    """Pytree of a fitted expert bank: route by ``centroids``, then
    ``apply_e(x) = P[e] @ (x - mu[e])``."""

    centroids: jax.Array   # [E, D] f32 unit-norm router codebook
    P: jax.Array           # [E, dim, D] per-cluster projections
    mu: jax.Array          # [E, D] per-cluster means


@partial(jax.jit, static_argnames=("m",))
def _chunk_moments(xc: jax.Array, ac: jax.Array, eids: jax.Array, *, m: int):
    """Per-cluster moments of one chunk: ``xc [chunk, D]`` f32 rows with
    assignments ``ac [chunk]``, for the ``m`` cluster ids in ``eids``
    (padded with -1). Returns ``(outer [m, D, D], sums [m, D],
    counts [m])`` — a batch of masked f32 MXU matmuls."""
    def one(e):
        mask = (ac == e).astype(jnp.float32)      # -1 pads never match
        xm = xc * mask[:, None]
        outer = jnp.einsum("cd,cf->df", xm, xc,
                           preferred_element_type=jnp.float32)
        return outer, xm.sum(axis=0), mask.sum()

    return jax.vmap(one)(eids[:m])


@partial(jax.jit, static_argnames=("dim", "tau", "shrinkage", "eps"))
def _bank_from_moments(outer, sums, counts, g_cov, g_mu, *, dim: int,
                       tau: float, shrinkage: float, eps: float):
    """Blend per-cluster moments toward the global ones and build the
    projection bank with ONE batched eigh (math mirrors
    ops/whitening.fit_whitening)."""
    n = counts[:, None]                                   # [E, 1]
    mu = sums / jnp.maximum(n, 1.0)                       # [E, D]
    cov = (outer - n[..., None] * mu[:, :, None] * mu[:, None, :]) \
        / jnp.maximum(n[..., None] - 1.0, 1.0)            # [E, D, D]
    w = (counts / (counts + tau))[:, None]                # [E, 1]
    mu = w * mu + (1.0 - w) * g_mu
    cov = w[..., None] * cov + (1.0 - w[..., None]) * g_cov
    if shrinkage > 0.0:
        d = cov.shape[-1]
        tr = jnp.trace(cov, axis1=-2, axis2=-1)[:, None, None]
        cov = (1.0 - shrinkage) * cov + \
            shrinkage * jnp.eye(d) * tr / d
    evals, evecs = jnp.linalg.eigh(cov)                   # ascending, [E,...]
    evals = evals[:, ::-1][:, :dim]                       # [E, dim]
    evecs = evecs[:, :, ::-1][:, :, :dim]                 # [E, D, dim]
    P = jnp.swapaxes(
        evecs * jax.lax.rsqrt(jnp.maximum(evals, eps))[:, None, :], 1, 2)
    return P, mu                                          # [E, dim, D]


def fit_local_whitening(X, n_clusters: int, *, dim: int | None = None,
                        tau: float = 64.0, shrinkage: float = 0.0,
                        num_valid: int | None = None, iters: int = 10,
                        seed: int = 0, chunk: int = 16384,
                        eps: float = 1e-9) -> LocalWhiteningParams:
    """Fit an E-expert local whitening bank on descriptors ``X [N, D]``
    (rows >= ``num_valid`` are padding). ``tau`` is the blend constant:
    a cluster with n members uses n/(n+tau) of its own moments and the
    rest from the global fit — ``tau=0`` is fully local, ``tau=inf``
    recovers exactly the reference's single global whitening."""
    Xnp = np.asarray(X, np.float32)
    n, d = Xnp.shape
    nv = int(num_valid if num_valid is not None else n)
    dim_out = d if dim in (None, 0) else min(dim, d)
    dim_out = min(dim_out, max(nv - 1, 1))

    centroids, assign = fit_kmeans(jnp.asarray(Xnp), n_clusters,
                                   num_valid=nv, iters=iters, seed=seed)
    a_np = np.asarray(assign)

    # host-sort rows by cluster so each fixed-size chunk touches only a
    # handful of cluster ids (one compiled shape for the whole pass)
    order = np.argsort(a_np[:nv], kind="stable")
    xs = Xnp[:nv][order]
    asort = a_np[:nv][order]

    outer = np.zeros((n_clusters, d, d), np.float32)
    sums = np.zeros((n_clusters, d), np.float32)
    counts = np.zeros((n_clusters,), np.float32)
    chunk = min(chunk, nv)
    m_cap = 8  # pad the per-chunk cluster-id list to a fixed width
    for c0 in range(0, nv, chunk):
        xc = xs[c0:c0 + chunk]
        ac = asort[c0:c0 + chunk]
        if xc.shape[0] < chunk:
            pad = chunk - xc.shape[0]
            xc = np.concatenate([xc, np.zeros((pad, d), np.float32)])
            ac = np.concatenate([ac, np.full((pad,), -1, np.int32)])
        present = np.unique(ac[ac >= 0])
        for p0 in range(0, len(present), m_cap):
            eids = present[p0:p0 + m_cap]
            eids = np.concatenate(
                [eids, np.full((m_cap - len(eids),), -1, eids.dtype)])
            o, s, c = _chunk_moments(jnp.asarray(xc),
                                     jnp.asarray(ac, jnp.int32),
                                     jnp.asarray(eids, jnp.int32), m=m_cap)
            live = eids >= 0
            ids = eids[live]
            outer[ids] += np.asarray(o)[live]
            sums[ids] += np.asarray(s)[live]
            counts[ids] += np.asarray(c)[live]

    # global moments are the sums of the per-cluster ones (padding rows
    # carry assignment -1 and were never accumulated)
    n_g = counts.sum()
    g_mu = sums.sum(0) / max(n_g, 1.0)
    g_cov = (outer.sum(0) - n_g * np.outer(g_mu, g_mu)) / max(n_g - 1.0, 1.0)

    P, mu = _bank_from_moments(
        jnp.asarray(outer), jnp.asarray(sums), jnp.asarray(counts),
        jnp.asarray(g_cov), jnp.asarray(g_mu),
        dim=dim_out, tau=float(tau), shrinkage=float(shrinkage),
        eps=float(eps))
    return LocalWhiteningParams(centroids=centroids, P=P, mu=mu)


def route(x: jax.Array, params: LocalWhiteningParams) -> jax.Array:
    """Nearest-centroid expert assignment: ``x [..., D] -> [...] int32``."""
    scores = jnp.einsum("...d,ed->...e", x.astype(jnp.float32),
                        params.centroids)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def apply_local_whitening(x: jax.Array, params: LocalWhiteningParams,
                          renormalize: bool = True) -> jax.Array:
    """Route + whiten: ``x [B, D] -> [B, dim]``. Jittable; the per-row
    projection is a gathered batched matmul (MXU), never a loop."""
    a = route(x, params)
    xm = x.astype(jnp.float32) - params.mu[a]
    out = jnp.einsum("bd,bod->bo", xm, params.P[a])
    if renormalize:
        out = l2_normalize(out, axis=-1)
    return out
