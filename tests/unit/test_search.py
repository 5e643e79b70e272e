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


def test_query_chunking_matches_single_pass(rng):
    """Large query batches served in fixed chunks (search.query_chunk)
    must return exactly the single-pass results, including the zero-padded
    remainder chunk."""
    from instsearch_tpu import ExtractConfig, IndexConfig, PipelineConfig, SearchConfig
    from instsearch_tpu.index import Index

    X = rng.standard_normal((300, 32)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = rng.standard_normal((11, 32)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    names = [f"im{i}" for i in range(300)]

    def build(chunk):
        cfg = PipelineConfig(
            extract=ExtractConfig(dtype="float32"),
            index=IndexConfig(dtype="float32", row_tile=8),
            search=SearchConfig(k=7, query_chunk=chunk, use_pallas=False))
        return Index.from_descriptors(X, names, cfg)

    s_one, i_one = build(0).search(Q)          # chunking disabled
    s_chk, i_chk = build(4).search(Q)          # 11 -> 4+4+3(padded)
    np.testing.assert_array_equal(i_chk, i_one)
    np.testing.assert_allclose(s_chk, s_one, rtol=1e-6)


def test_all_scores_shape(rng):
    X = rng.standard_normal((100, 32)).astype(np.float32)
    Q = rng.standard_normal((5, 32)).astype(np.float32)
    s = all_scores(jnp.asarray(X), jnp.asarray(Q))
    assert s.shape == (5, 100)
    np.testing.assert_allclose(np.asarray(s), Q @ X.T, rtol=2e-2, atol=1e-2)
