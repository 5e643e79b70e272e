"""int8-native sharded search: exact vs single-device int8 oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.ops.quantize import quantize_rows
from instsearch_tpu.parallel import ShardedIndex, make_mesh


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(41)
    X = rng.standard_normal((512, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = X[:3] + 0.01 * rng.standard_normal((3, 64)).astype(np.float32)
    ids = np.arange(512, dtype=np.int32)
    return X, Q, ids


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_sharded_int8_equals_local(data, n_shards):
    X, Q, ids = data
    qr = quantize_rows(jnp.asarray(X))
    mesh = make_mesh(n_shards)
    sidx = ShardedIndex(qr.values, jnp.asarray(ids), mesh=mesh,
                        scales=qr.scales)
    s_d, i_d = sidx.search(jnp.asarray(Q), k=10)
    # single-device int8 oracle (same math)
    scores = (Q.astype(np.float32) @ np.asarray(qr.values, np.float32).T
              ) * np.asarray(qr.scales)
    import jax
    s_l, i_l = jax.lax.top_k(jnp.asarray(scores), 10)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_l),
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(i_d)[:, 0] == np.arange(3)).all()


def test_int8_requires_scales(data):
    X, Q, ids = data
    qr = quantize_rows(jnp.asarray(X))
    with pytest.raises(ValueError):
        ShardedIndex(qr.values, jnp.asarray(ids), mesh=make_mesh(2))


def test_index_to_sharded_int8(data):
    X, Q, ids = data
    from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
    from instsearch_tpu.index import Index
    cfg = PipelineConfig(index=IndexConfig(dtype="int8", row_tile=8,
                                           num_shards=8),
                         search=SearchConfig(k=5, use_pallas=False))
    idx = Index.from_descriptors(X, [str(i) for i in range(512)], cfg)
    sidx = idx.to_sharded()
    assert sidx.int8
    s, i = sidx.search(jnp.asarray(Q), k=5)
    assert (np.asarray(i)[:, 0] == np.arange(3)).all()
