"""Spherical k-means (ops/kmeans.py) — the IVF coarse quantizer."""
import jax.numpy as jnp
import numpy as np

from instsearch_tpu.ops.kmeans import (assign_clusters, fit_kmeans,
                                       pick_chunk)


def _blobs(rng, n_per, centers, d, noise=0.05):
    """Unit-norm gaussian blobs around ``centers`` unit anchors."""
    anchors = rng.standard_normal((centers, d)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    x = np.repeat(anchors, n_per, axis=0)
    x = x + noise * rng.standard_normal(x.shape).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    labels = np.repeat(np.arange(centers), n_per)
    return x, labels


def test_pick_chunk_divides():
    assert pick_chunk(1024, 16384) == 1024
    assert pick_chunk(24, 16) == 12
    assert pick_chunk(16384 * 3, 16384) == 16384


def test_recovers_separated_blobs(rng):
    x, labels = _blobs(rng, n_per=64, centers=4, d=32)
    cent, assign = fit_kmeans(jnp.asarray(x), 4, iters=8, seed=1)
    cent = np.asarray(cent)
    # unit-norm centroids
    np.testing.assert_allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-5)
    a = np.asarray(assign)
    # every true blob maps to exactly one k-means cluster and vice versa
    mapping = {}
    for blob in range(4):
        vals, counts = np.unique(a[labels == blob], return_counts=True)
        assert counts.max() / counts.sum() > 0.95
        mapping[blob] = vals[counts.argmax()]
    assert len(set(mapping.values())) == 4


def test_padding_rows_get_minus_one(rng):
    x, _ = _blobs(rng, n_per=32, centers=2, d=16)
    pad = np.zeros((24, 16), np.float32)
    xp = np.concatenate([x, pad])
    cent, assign = fit_kmeans(jnp.asarray(xp), 2, num_valid=64, iters=4)
    a = np.asarray(assign)
    assert (a[64:] == -1).all()
    assert (a[:64] >= 0).all()


def test_assign_matches_argmax_oracle(rng):
    x = rng.standard_normal((96, 24)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cent = rng.standard_normal((5, 24)).astype(np.float32)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    a = np.asarray(assign_clusters(jnp.asarray(x), jnp.asarray(cent), 96,
                                   chunk=32))
    want = np.argmax(x @ cent.T, axis=1)
    # bf16 scoring may flip genuinely-tied rows; tolerate none here because
    # random cosines are well separated at d=24
    assert (a == want).mean() > 0.98


def test_deterministic(rng):
    x, _ = _blobs(rng, n_per=40, centers=3, d=16)
    c1, a1 = fit_kmeans(jnp.asarray(x), 3, iters=5, seed=7)
    c2, a2 = fit_kmeans(jnp.asarray(x), 3, iters=5, seed=7)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2))


def test_no_empty_clusters_after_respawn(rng):
    # adversarial: all rows in ONE tight blob, ask for 8 clusters — empty
    # clusters must respawn onto data rows, not stay at their stale init
    x, _ = _blobs(rng, n_per=128, centers=1, d=16, noise=0.02)
    cent, assign = fit_kmeans(jnp.asarray(x), 8, iters=6, seed=0)
    a = np.asarray(assign)
    sizes = np.bincount(a, minlength=8)
    assert (sizes > 0).sum() >= 6  # nearly all clusters carry rows
