"""int8-quantized index through the public API: search, QE, save/load."""
import numpy as np
import pytest

from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(21)
    X = rng.standard_normal((600, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X


@pytest.fixture(scope="module")
def idx(data):
    cfg = PipelineConfig(index=IndexConfig(dtype="int8", row_tile=8),
                         search=SearchConfig(k=10, use_pallas=False))
    return Index.from_descriptors(data, [str(i) for i in range(600)], cfg)


def test_int8_storage(idx):
    import jax.numpy as jnp
    assert idx.descriptors.dtype == jnp.int8
    assert idx.scales is not None
    assert idx.scales.shape == (1, idx.descriptors.shape[0])


def test_int8_search_ranking(idx, data):
    q = data[:5] + 0.005 * np.random.default_rng(3).standard_normal((5, 64)).astype(np.float32)
    s, i = idx.search(q)
    assert (i[:, 0] == np.arange(5)).all()
    # top-10 sets mostly agree with exact f32 search
    exact = np.argsort(-(q @ data.T), axis=1)[:, :10]
    overlap = np.mean([len(set(i[r]) & set(exact[r])) for r in range(5)])
    assert overlap >= 8.0


def test_int8_qe(idx, data):
    q = data[:2]
    s, i = idx.search(q, SearchConfig(k=5, qe_enabled=True, qe_n=3,
                                      use_pallas=False))
    assert i.shape == (2, 5)
    assert (i >= 0).all()


def test_int8_full_ranking(idx, data):
    ranks = idx.full_ranking(data[:2])
    assert ranks.shape == (2, 600)
    assert ranks[0, 0] == 0 and ranks[1, 0] == 1


def test_int8_save_load(idx, data, tmp_path):
    idx.save(str(tmp_path / "i8"))
    loaded = Index.load(str(tmp_path / "i8"))
    import jax.numpy as jnp
    assert loaded.descriptors.dtype == jnp.int8
    q = data[:3]
    s1, i1 = idx.search(q)
    s2, i2 = loaded.search(q)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_int8_to_sharded(idx, data):
    sidx = idx.to_sharded()
    s, i = sidx.search(data[:2], k=5)
    assert (np.asarray(i)[:, 0] == [0, 1]).all()
