"""Distributed search on 8 fake CPU devices (SURVEY.md §4.4): the sharded
result must equal the single-device oracle exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.parallel import ShardedIndex, make_mesh
from instsearch_tpu.search import search_topk


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    X = rng.standard_normal((1024, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = rng.standard_normal((5, 64)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    ids = np.arange(1024, dtype=np.int32)
    return X, Q, ids


@pytest.mark.parametrize("n_shards", [1, 2, 8])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_sharded_equals_oracle(data, n_shards, use_pallas):
    X, Q, ids = data
    mesh = make_mesh(n_shards)
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids), mesh=mesh,
                        use_pallas=use_pallas, interpret=use_pallas)
    s_scores, s_ids = sidx.search(jnp.asarray(Q), k=10)
    o_scores, o_ids = search_topk(jnp.asarray(X), jnp.asarray(Q), k=10)
    np.testing.assert_array_equal(np.asarray(s_ids), np.asarray(o_ids))
    np.testing.assert_allclose(np.asarray(s_scores), np.asarray(o_scores), rtol=1e-5)


def test_sharded_masks_padding(data):
    X, Q, ids = data
    # mark the last 100 rows as padding: they must never appear
    ids2 = ids.copy()
    ids2[-100:] = -1
    mesh = make_mesh(8)
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids2), mesh=mesh)
    _, s_ids = sidx.search(jnp.asarray(Q), k=10)
    assert np.asarray(s_ids).max() < 924
    assert (np.asarray(s_ids) >= 0).all()


def test_rejects_nondivisible_rows(data):
    X, Q, ids = data
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        ShardedIndex(jnp.asarray(X[:900]), jnp.asarray(ids[:900]), mesh=mesh)


def test_sharded_query_chunking_matches_single_pass(data):
    """query_chunk served in fixed pieces (zero-padded remainder) must
    return exactly the unchunked results across search / QE / rerank /
    all_scores."""
    X, Q, ids = data
    rng = np.random.default_rng(9)
    reg = rng.standard_normal((1024, 3, 64)).astype(np.float32)
    reg /= np.linalg.norm(reg, axis=-1, keepdims=True)
    Q11 = np.concatenate([Q, Q + 0.01, Q[:1]])          # 11 queries -> 4+4+3
    Qr = rng.standard_normal((11, 3, 64)).astype(np.float32)
    mesh = make_mesh(4)

    def build(chunk):
        return ShardedIndex(jnp.asarray(X), jnp.asarray(ids), mesh=mesh,
                            regional=jnp.asarray(reg), query_chunk=chunk)

    one, chk = build(0), build(4)
    for name, call in [
        ("search", lambda s: s.search(jnp.asarray(Q11), k=7)),
        ("qe", lambda s: s.search_qe(jnp.asarray(Q11), k=7, qe_n=3)),
        ("rerank", lambda s: s.search_rerank(jnp.asarray(Q11),
                                             jnp.asarray(Qr), k=7, depth=16)),
        ("scores", lambda s: (s.all_scores(jnp.asarray(Q11)),)),
    ]:
        a, b = call(one), call(chk)
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=1e-5, err_msg=name)
