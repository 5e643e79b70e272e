"""Whitening numerics (SURVEY.md §4.1)."""
import jax.numpy as jnp
import numpy as np

from instsearch_tpu.ops import apply_whitening, fit_whitening


def test_whitening_decorrelates():
    # correlated gaussian descriptors; local fixed-seed rng: the shared
    # session rng's state depends on test ORDER, and an unlucky (badly
    # conditioned) mixing matrix trips the 0.15 covariance tolerance via
    # the eigenvalue floor in fit_whitening
    rng = np.random.default_rng(42)
    A = rng.standard_normal((16, 16)).astype(np.float32)
    X = rng.standard_normal((4096, 16)).astype(np.float32) @ A
    params = fit_whitening(jnp.asarray(X))
    Y = np.asarray(apply_whitening(jnp.asarray(X), params, renormalize=False))
    cov = np.cov(Y.T)
    np.testing.assert_allclose(cov, np.eye(16), atol=0.15)


def test_whitening_dim_reduction(rng):
    X = rng.standard_normal((512, 32)).astype(np.float32)
    params = fit_whitening(jnp.asarray(X), dim=8)
    assert params.P.shape == (8, 32)
    Y = np.asarray(apply_whitening(jnp.asarray(X), params))
    assert Y.shape == (512, 8)
    np.testing.assert_allclose(np.linalg.norm(Y, axis=-1), 1.0, rtol=1e-4)


def test_whitening_clamps_to_sample_rank(rng):
    # fit set smaller than D: components clamp to n-1, and whitened
    # near-duplicates must stay closer than random pairs (the un-clamped
    # behavior amplified rank-deficient noise ~1/sqrt(eps) and destroyed
    # this property)
    X = rng.standard_normal((20, 64)).astype(np.float32)
    params = fit_whitening(jnp.asarray(X))
    assert params.P.shape == (19, 64)
    dup = X[:5] + 0.01 * rng.standard_normal((5, 64)).astype(np.float32)
    wa = np.asarray(apply_whitening(jnp.asarray(X[:5]), params))
    wb = np.asarray(apply_whitening(jnp.asarray(dup), params))
    w_rand = np.asarray(apply_whitening(jnp.asarray(X[5:10]), params))
    near = np.sum(wa * wb, axis=1).mean()
    far = np.sum(wa * w_rand, axis=1).mean()
    assert near > far + 0.2, (near, far)


def test_whitening_matches_numpy_oracle(rng):
    # well-separated spectrum so eigenvectors are well-determined
    scales = np.geomspace(1.0, 32.0, 12).astype(np.float32)
    X = rng.standard_normal((256, 12)).astype(np.float32) * scales
    params = fit_whitening(jnp.asarray(X))
    got = np.asarray(apply_whitening(jnp.asarray(X[:4]), params, renormalize=False))
    # numpy oracle
    mu = X.mean(0)
    cov = np.cov(X.T)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    P = (evecs / np.sqrt(np.maximum(evals, 1e-9))).T
    want = (X[:4] - mu) @ P.T
    # eigenvector sign is arbitrary — compare up to per-component sign
    signs = np.sign(np.sum(got * want, axis=0, keepdims=True))
    np.testing.assert_allclose(got, want * signs, rtol=1e-2, atol=1e-3)
