"""Distributed alpha-QE must equal the single-device QE + search exactly."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.parallel import ShardedIndex, make_mesh
from instsearch_tpu.search import alpha_query_expansion, search_topk


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    X = rng.standard_normal((512, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = rng.standard_normal((4, 64)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    ids = np.arange(512, dtype=np.int32)
    return X, Q, ids


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_sharded_qe_equals_local(data, n_shards):
    X, Q, ids = data
    mesh = make_mesh(n_shards)
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids), mesh=mesh)
    s_d, i_d = sidx.search_qe(jnp.asarray(Q), k=10, qe_n=5, alpha=3.0)
    # local oracle: expand then search
    q_exp = alpha_query_expansion(jnp.asarray(X), jnp.asarray(ids),
                                  jnp.asarray(Q), n=5, alpha=3.0)
    s_l, i_l = search_topk(jnp.asarray(X), q_exp, k=10)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_l),
                               rtol=1e-4, atol=1e-5)


def test_sharded_qe_with_padding(data):
    X, Q, ids = data
    ids2 = ids.copy()
    ids2[-64:] = -1
    mesh = make_mesh(8)
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids2), mesh=mesh)
    _, i_d = sidx.search_qe(jnp.asarray(Q), k=10, qe_n=5)
    assert np.asarray(i_d).max() < 448
