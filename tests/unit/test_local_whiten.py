"""Per-cluster local whitening (ops/local_whiten.py).

Asserted: the fit actually whitens EACH cluster (per-cluster covariance
of projected members ~ identity on an anisotropic mixture, where global
whitening provably cannot), tau=inf degrades exactly to the global
whitening, routing is nearest-centroid, small clusters shrink toward
the global moments, and the chunked moment accumulation matches a
direct numpy computation."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.ops.local_whiten import (
    LocalWhiteningParams, apply_local_whitening, fit_local_whitening, route)
from instsearch_tpu.ops.whitening import apply_whitening, fit_whitening


def _mixture(rng, n_per=600, d=16):
    """Three well-separated clusters with very different covariances."""
    means = np.array([[8.0] + [0.0] * (d - 1),
                      [0.0, 8.0] + [0.0] * (d - 2),
                      [0.0, 0.0, 8.0] + [0.0] * (d - 3)], np.float32)
    covs = []
    for i in range(3):
        scales = np.ones(d, np.float32)
        scales[(3 + i) % d] = 6.0          # a different stretched axis each
        scales[(5 + i) % d] = 0.2
        covs.append(np.diag(scales ** 2))
    xs, labels = [], []
    for i in range(3):
        xs.append(rng.multivariate_normal(
            means[i], covs[i], size=n_per).astype(np.float32))
        labels.append(np.full(n_per, i))
    x = np.concatenate(xs)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x, np.concatenate(labels)


def _percluster_whiteness(out, labels):
    """Mean Frobenius distance of each cluster's covariance (of the
    UN-normalized projection) to a scaled identity."""
    errs = []
    for e in np.unique(labels):
        m = out[labels == e]
        c = np.cov(m.T)
        c = c / np.trace(c) * c.shape[0]     # scale-free comparison
        errs.append(np.linalg.norm(c - np.eye(c.shape[0])))
    return float(np.mean(errs))


def test_local_whitening_whitens_each_cluster(rng):
    x, labels = _mixture(rng)
    params = fit_local_whitening(x, 3, tau=0.0, seed=0, chunk=256)
    lw = np.asarray(apply_local_whitening(
        jnp.asarray(x), params, renormalize=False))
    gw = np.asarray(apply_whitening(
        jnp.asarray(x), fit_whitening(jnp.asarray(x)), renormalize=False))
    # clusters and kmeans labels may be permuted; route() gives the
    # cluster each row was whitened AS — whiteness is measured per route
    a = np.asarray(route(jnp.asarray(x), params))
    assert _percluster_whiteness(lw, a) < 0.25 * _percluster_whiteness(gw, a)


def test_tau_inf_recovers_global_whitening(rng):
    x, _ = _mixture(rng, n_per=200)
    params = fit_local_whitening(x, 3, tau=1e12, seed=0, chunk=128)
    gw = fit_whitening(jnp.asarray(x))
    # every expert's (mu, P) collapses to the global fit (eigenvector
    # sign is arbitrary -> compare the projector P^T P, not P)
    for e in range(3):
        np.testing.assert_allclose(np.asarray(params.mu[e]),
                                   np.asarray(gw.mu), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(params.P[e].T @ params.P[e]),
            np.asarray(gw.P.T @ gw.P), rtol=2e-3, atol=2e-3)


def test_routing_is_nearest_centroid(rng):
    x, _ = _mixture(rng, n_per=100)
    params = fit_local_whitening(x, 3, seed=0, chunk=128)
    a = np.asarray(route(jnp.asarray(x), params))
    expect = np.argmax(x @ np.asarray(params.centroids).T, axis=1)
    assert (a == expect).all()


def test_apply_shapes_and_norms(rng):
    x, _ = _mixture(rng, n_per=100)
    params = fit_local_whitening(x, 3, dim=8, seed=0, chunk=128)
    assert params.P.shape == (3, 8, 16)
    out = np.asarray(apply_local_whitening(jnp.asarray(x[:32]), params))
    assert out.shape == (32, 8)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_moment_accumulation_matches_numpy(rng):
    # fit with tau=0 on a single cluster must equal the direct global fit
    x = rng.standard_normal((300, 8)).astype(np.float32)
    params = fit_local_whitening(x, 1, tau=0.0, seed=0, chunk=64)
    gw = fit_whitening(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(params.mu[0]), np.asarray(gw.mu),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params.P[0].T @ params.P[0]),
        np.asarray(gw.P.T @ gw.P), rtol=2e-3, atol=2e-3)


def test_padding_rows_excluded(rng):
    x, _ = _mixture(rng, n_per=100)
    xpad = np.concatenate([x, np.full((40, 16), 7.0, np.float32)])
    p_ref = fit_local_whitening(x, 3, seed=0, chunk=128)
    p_pad = fit_local_whitening(xpad, 3, num_valid=len(x), seed=0, chunk=128)
    np.testing.assert_allclose(np.asarray(p_pad.P), np.asarray(p_ref.P),
                               rtol=1e-4, atol=1e-5)


def test_small_cluster_shrinks_toward_global(rng):
    x, _ = _mixture(rng, n_per=400)
    # huge tau: even 400-member clusters are "small" -> near-global
    near_global = fit_local_whitening(x, 3, tau=1e6, seed=0, chunk=256)
    local = fit_local_whitening(x, 3, tau=0.0, seed=0, chunk=256)
    gw = fit_whitening(jnp.asarray(x))
    gP = np.asarray(gw.P.T @ gw.P)

    def dist(params):
        return np.mean([np.linalg.norm(
            np.asarray(params.P[e].T @ params.P[e]) - gP) for e in range(3)])

    assert dist(near_global) < 0.05 * dist(local)
