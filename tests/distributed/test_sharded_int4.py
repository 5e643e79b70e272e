"""Packed-int4 sharded search: exact vs single-device int4 oracle across
every distributed stage (search, QE, diffusion, expansion, full scores)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.ops.quantize import quantize_rows_int4, unpack_int4
from instsearch_tpu.parallel import ShardedIndex, make_mesh


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(47)
    X = rng.standard_normal((512, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = X[:3] + 0.01 * rng.standard_normal((3, 64)).astype(np.float32)
    ids = np.arange(512, dtype=np.int32)
    qr = quantize_rows_int4(jnp.asarray(X))
    deq = (np.asarray(unpack_int4(qr.values), np.float32)
           * np.asarray(qr.scales)[0][:, None])
    return X, Q.astype(np.float32), ids, qr, deq


def _sidx(qr, ids, n_shards):
    return ShardedIndex(qr.values, jnp.asarray(ids),
                        mesh=make_mesh(n_shards), scales=qr.scales,
                        int4=True)


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_sharded_int4_equals_local(data, n_shards):
    X, Q, ids, qr, deq = data
    sidx = _sidx(qr, ids, n_shards)
    s_d, i_d = sidx.search(jnp.asarray(Q), k=10)
    # single-device int4 oracle: the non-pallas scorer uses the FLOAT
    # query against the unpacked rows (same convention as the int8 oracle)
    scores = (Q @ deq.T).astype(np.float32)
    s_l, i_l = jax.lax.top_k(jnp.asarray(scores), 10)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_l),
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(i_d)[:, 0] == np.arange(3)).all()


def test_sharded_int4_qe_matches_single_device(data):
    """The distributed QE must equal Index.search's composite over the
    same packed store — both dequantize candidate rows identically."""
    X, Q, ids, qr, deq = data
    from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
    from instsearch_tpu.index import Index
    cfg = PipelineConfig(
        index=IndexConfig(dtype="int4", row_tile=8),
        search=SearchConfig(k=5, qe_enabled=True, qe_n=4, use_pallas=False))
    idx = Index.from_descriptors(X, [f"i{i}" for i in range(len(X))], cfg)
    want_s, want_i = idx.search(Q)
    sidx = idx.to_sharded(mesh=make_mesh(8), use_pallas=False)
    assert sidx.int4
    s_d, i_d = sidx.search_qe(jnp.asarray(Q), k=5, qe_n=4, alpha=3.0)
    np.testing.assert_array_equal(np.asarray(i_d), want_i)
    np.testing.assert_allclose(np.asarray(s_d), want_s, rtol=1e-4,
                               atol=1e-5)


def test_sharded_int4_diffusion_matches_single_device(data):
    X, Q, ids, qr, deq = data
    from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
    from instsearch_tpu.index import Index
    cfg = PipelineConfig(
        index=IndexConfig(dtype="int4", row_tile=8),
        search=SearchConfig(k=5, diffusion_enabled=True, diffusion_depth=32,
                            diffusion_knn=6, use_pallas=False))
    idx = Index.from_descriptors(X, [f"i{i}" for i in range(len(X))], cfg)
    want_s, want_i = idx.search(Q)
    sidx = idx.to_sharded(mesh=make_mesh(4), use_pallas=False)
    s_d, i_d = sidx.search_diffusion(jnp.asarray(Q), k=5, depth=32, knn=6)
    np.testing.assert_array_equal(np.asarray(i_d), want_i)
    np.testing.assert_allclose(np.asarray(s_d), want_s, rtol=1e-4,
                               atol=1e-5)


def test_sharded_int4_full_scores(data):
    """all_scores over packed rows == dense dequantized matmul (protocol
    evaluation's sharded ranking path)."""
    X, Q, ids, qr, deq = data
    sidx = _sidx(qr, ids, 8)
    got = np.asarray(sidx.all_scores(jnp.asarray(Q)))
    # the oracle scorer (non-pallas) uses the FLOAT query, not int8
    want = (Q @ deq.T).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_int4_requires_scales(data):
    X, Q, ids, qr, deq = data
    with pytest.raises(ValueError):
        ShardedIndex(qr.values, jnp.asarray(ids), mesh=make_mesh(2),
                     int4=True)


def test_sharded_int4_rerank(data):
    """Distributed regional re-rank over an int4 GLOBAL matrix (+ int8
    regional store, the attach_regional_store pairing): the int4 flag
    must reach the candidate-selection _local_topk (review r3 caught it
    being dropped) and the result must equal the single-device composite."""
    X, Q, ids, qr, deq = data
    rng = np.random.default_rng(97)
    from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
    from instsearch_tpu.index import Index, attach_regional_store
    cfg = PipelineConfig(
        index=IndexConfig(dtype="int4", row_tile=8),
        search=SearchConfig(k=5, rerank_enabled=True, rerank_depth=16,
                            use_pallas=False))
    idx = Index.from_descriptors(X, [f"i{i}" for i in range(len(X))], cfg)
    reg = rng.standard_normal((len(X), 4, X.shape[1])).astype(np.float32)
    reg /= np.linalg.norm(reg, axis=-1, keepdims=True)
    attach_regional_store(idx, reg)
    assert idx.regional.dtype == jnp.int8      # int4 index -> int8 store
    qreg = rng.standard_normal((Q.shape[0], 4, X.shape[1])
                               ).astype(np.float32)
    qreg /= np.linalg.norm(qreg, axis=-1, keepdims=True)
    want_s, want_i = idx.search(Q, query_regional=qreg)
    sidx = idx.to_sharded(mesh=make_mesh(8), use_pallas=False)
    s_d, i_d = sidx.search_rerank(jnp.asarray(Q), jnp.asarray(qreg),
                                  k=5, depth=16)
    np.testing.assert_array_equal(np.asarray(i_d), want_i)
    np.testing.assert_allclose(np.asarray(s_d), want_s, rtol=1e-4,
                               atol=1e-5)
