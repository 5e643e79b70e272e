"""PCA-whitening of descriptors (SURVEY.md C9; Jégou & Chum ECCV'12,
arXiv:1711.02512 §3.4).

Fit runs on device (jnp.linalg.eigh on the DxD covariance — D <= 2048, tiny
for the MXU); apply is a single fused matmul ``P @ (x - mu)`` + re-L2.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pooling import l2_normalize


class WhiteningParams(NamedTuple):
    """Pytree of fitted whitening: ``apply(x) = P @ (x - mu)``."""

    P: jax.Array    # [dim_out, D] projection (rows scaled by lambda^-1/2)
    mu: jax.Array   # [D] mean


def fit_whitening(X: jax.Array, dim: int | None = None,
                  shrinkage: float = 0.0, eps: float = 1e-9) -> WhiteningParams:
    """Fit PCA-whitening on held-out descriptors ``X: [N, D]``.

    ``dim`` truncates to the leading components (dimensionality reduction as
    in the reference pipelines); ``shrinkage`` blends the covariance toward
    the identity for stability on small fit sets.
    """
    X = X.astype(jnp.float32)
    n, d = X.shape
    dim = d if dim in (None, 0) else min(dim, d)
    # PCA estimates at most n-1 components; keeping rank-deficient
    # directions would amplify them by rsqrt(eps) and destroy descriptors
    # (bites when the fit set is smaller than D)
    dim = min(dim, max(n - 1, 1))
    mu = jnp.mean(X, axis=0)
    Xc = X - mu
    cov = (Xc.T @ Xc) / jnp.maximum(n - 1, 1)
    if shrinkage > 0.0:
        cov = (1.0 - shrinkage) * cov + shrinkage * jnp.eye(d) * jnp.trace(cov) / d
    # eigh returns ascending eigenvalues; take the top `dim`.
    evals, evecs = jnp.linalg.eigh(cov)
    evals = evals[::-1][:dim]
    evecs = evecs[:, ::-1][:, :dim]
    P = (evecs * jax.lax.rsqrt(jnp.maximum(evals, eps))).T   # [dim, D]
    return WhiteningParams(P=P, mu=mu)


def fit_lw_whitening(anchors: jax.Array, positives: jax.Array,
                     dim: int | None = None,
                     eps: float = 1e-9) -> WhiteningParams:
    """Learned discriminative (Lw) whitening (arXiv:1711.02512 §3.4).

    Whitens with the *intraclass* covariance of matching pairs and rotates
    by the PCA of the projected data:

        C_S = sum_i (a_i - p_i)(a_i - p_i)^T          (within-pair scatter)
        P   = eig(C_S)^(-1/2),  then PCA rotation of P-projected anchors

    ``anchors``/``positives``: [M, D] matched descriptor pairs.
    """
    a = anchors.astype(jnp.float32)
    p = positives.astype(jnp.float32)
    m, d = a.shape
    dim = d if dim in (None, 0) else min(dim, d)
    # same rank discipline as fit_whitening: at most m-1 estimable
    # directions from m pairs
    dim = min(dim, max(m - 1, 1))
    diff = a - p
    cs = (diff.T @ diff) / jnp.maximum(m, 1)
    s_evals, s_evecs = jnp.linalg.eigh(cs)
    # C_S^(-1/2) with a RELATIVE floor: unobserved intraclass directions
    # (rank-deficient C_S) get bounded amplification instead of 1/sqrt(eps)
    floor = jnp.maximum(jnp.max(s_evals) * 1e-4, eps)
    inv_sqrt = s_evecs @ jnp.diag(
        jax.lax.rsqrt(jnp.maximum(s_evals, floor))) @ s_evecs.T  # [D, D]
    mu = jnp.mean(a, axis=0)
    proj = (a - mu) @ inv_sqrt.T
    cov = (proj.T @ proj) / jnp.maximum(m - 1, 1)
    r_evals, r_evecs = jnp.linalg.eigh(cov)
    rot = r_evecs[:, ::-1][:, :dim]                              # top-dim PCA
    P = rot.T @ inv_sqrt                                         # [dim, D]
    return WhiteningParams(P=P, mu=mu)


def apply_whitening(x: jax.Array, params: WhiteningParams,
                    renormalize: bool = True) -> jax.Array:
    """Whiten descriptors ``x: [..., D] -> [..., dim]`` and re-L2 (C9+C10)."""
    out = (x.astype(jnp.float32) - params.mu) @ params.P.T
    if renormalize:
        out = l2_normalize(out, axis=-1)
    return out


def apply_whitening_regional(reg, params: WhiteningParams,
                             chunk: int = 65536):
    """Whiten an [N, R, D] regional store host->device in bounded chunks.

    The self-whitening build extracts the store BEFORE the whitening fit
    exists (the fit consumes the run's own global descriptors), so the
    store is whitened here afterwards. One whole-array apply would move
    N*R*D floats to the device at once — the store is R x the index size,
    the system's biggest tensor — so rows stream through a fixed [chunk, D]
    program (last chunk padded: one compiled shape)."""
    import numpy as np
    n, r, d = reg.shape
    flat = np.asarray(reg, np.float32).reshape(-1, d)
    m = flat.shape[0]
    if m == 0:
        return reg
    if m <= chunk:
        return np.asarray(apply_whitening(jnp.asarray(flat), params)
                          ).reshape(n, r, -1)
    out = None
    for i in range(0, m, chunk):
        piece = flat[i:i + chunk]
        if piece.shape[0] < chunk:
            piece = np.concatenate(
                [piece, np.zeros((chunk - piece.shape[0], d), np.float32)])
        w = np.asarray(apply_whitening(jnp.asarray(piece), params))
        if out is None:
            out = np.empty((m, w.shape[-1]), np.float32)
        out[i:i + chunk] = w[:min(chunk, m - i)]
    return out.reshape(n, r, -1)
