"""Brute-force search oracle tests."""
import jax.numpy as jnp
import numpy as np

from instsearch_tpu.search import all_scores, search_topk


def test_topk_matches_numpy(rng):
    X = rng.standard_normal((500, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = rng.standard_normal((7, 64)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    scores, ids = search_topk(jnp.asarray(X), jnp.asarray(Q), k=10)
    want_ids = np.argsort(-(Q @ X.T), axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(ids), want_ids)
    np.testing.assert_allclose(np.asarray(scores), np.sort(Q @ X.T, axis=1)[:, ::-1][:, :10], rtol=1e-5)


def test_bf16_index_close_to_f32(rng):
    X = rng.standard_normal((256, 128)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = X[:4] + 0.01 * rng.standard_normal((4, 128)).astype(np.float32)
    s16, i16 = search_topk(jnp.asarray(X, jnp.bfloat16), jnp.asarray(Q), k=1)
    # self-match must survive bf16 storage
    np.testing.assert_array_equal(np.asarray(i16[:, 0]), np.arange(4))


def test_all_scores_shape(rng):
    X = rng.standard_normal((100, 32)).astype(np.float32)
    Q = rng.standard_normal((5, 32)).astype(np.float32)
    s = all_scores(jnp.asarray(X), jnp.asarray(Q))
    assert s.shape == (5, 100)
    np.testing.assert_allclose(np.asarray(s), Q @ X.T, rtol=2e-2, atol=1e-2)
