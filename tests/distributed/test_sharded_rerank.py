"""Distributed regional re-rank must equal the single-device stage."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.parallel import ShardedIndex, make_mesh
from instsearch_tpu.search import regional_rerank_scores


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(31)
    N, R, D, Q = 256, 6, 32, 3
    X = rng.standard_normal((N, D)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    reg = rng.standard_normal((N, R, D)).astype(np.float32)
    reg /= np.linalg.norm(reg, axis=-1, keepdims=True)
    qreg = rng.standard_normal((Q, R, D)).astype(np.float32)
    qreg /= np.linalg.norm(qreg, axis=-1, keepdims=True)
    q = X[:Q] + 0.01 * rng.standard_normal((Q, D)).astype(np.float32)
    ids = np.arange(N, dtype=np.int32)
    return X, reg, qreg, q, ids


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_sharded_rerank_equals_local(data, n_shards):
    X, reg, qreg, q, ids = data
    depth, k = 16, 5
    mesh = make_mesh(n_shards)
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids), mesh=mesh,
                        regional=jnp.asarray(reg))
    s_d, i_d = sidx.search_rerank(jnp.asarray(q), jnp.asarray(qreg),
                                  k=k, depth=depth)
    # single-device oracle
    gscores = q @ X.T
    s_l, i_l = regional_rerank_scores(
        jnp.asarray(reg), jnp.asarray(ids),
        jnp.asarray(gscores.astype(np.float32)), jnp.asarray(qreg),
        depth=depth, k=k)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_l),
                               rtol=1e-4, atol=1e-5)


def test_sharded_rerank_padding(data):
    X, reg, qreg, q, ids = data
    ids2 = ids.copy()
    ids2[-32:] = -1
    mesh = make_mesh(8)
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids2), mesh=mesh,
                        regional=jnp.asarray(reg))
    _, i_d = sidx.search_rerank(jnp.asarray(q), jnp.asarray(qreg),
                                k=5, depth=16)
    assert np.asarray(i_d).max() < 224
