"""Distributed protocol-evaluation machinery: full ranking, QE expansion
and the re-rank head through ShardedIndex must equal the single-device
Index paths exactly (SURVEY.md §3.3 over the §2.2 layout)."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index
from instsearch_tpu.search import alpha_query_expansion


@pytest.fixture(scope="module", params=["bfloat16", "int8"])
def pair(request):
    rng = np.random.default_rng(61)
    X = rng.standard_normal((500, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = X[:4] + 0.01 * rng.standard_normal((4, 64)).astype(np.float32)
    cfg = PipelineConfig(index=IndexConfig(dtype=request.param, row_tile=8,
                                           num_shards=8),
                         search=SearchConfig(k=10, use_pallas=False))
    idx = Index.from_descriptors(X, [str(i) for i in range(500)], cfg)
    return idx, idx.to_sharded(), jnp.asarray(Q)


def test_full_ranking_matches(pair):
    idx, sidx, Q = pair
    r_local = idx.full_ranking(Q)
    r_shard = sidx.full_ranking(Q)
    assert r_shard.shape == r_local.shape == (4, 500)
    np.testing.assert_array_equal(r_shard, r_local)


def test_expand_queries_matches(pair):
    idx, sidx, Q = pair
    q_local = np.asarray(alpha_query_expansion(
        idx.descriptors, idx.ids, Q, n=5, alpha=3.0, scales=idx.scales))
    q_shard = np.asarray(sidx.expand_queries(Q, qe_n=5, alpha=3.0))
    np.testing.assert_allclose(q_shard, q_local, rtol=1e-6, atol=1e-7)


def test_rerank_head_matches(pair):
    idx, sidx, Q = pair
    rng = np.random.default_rng(62)
    n_pad = idx.descriptors.shape[0]
    reg = rng.standard_normal((n_pad, 4, 64)).astype(np.float32)
    reg /= np.linalg.norm(reg, axis=-1, keepdims=True)
    qreg = rng.standard_normal((4, 4, 64)).astype(np.float32)
    qreg /= np.linalg.norm(qreg, axis=-1, keepdims=True)
    if idx.descriptors.dtype == jnp.int8:
        from instsearch_tpu.ops.quantize import quantize_rows
        flat = quantize_rows(jnp.asarray(reg.reshape(-1, 64)))
        idx.regional = flat.values.reshape(reg.shape)
        idx.regional_scales = flat.scales.reshape(n_pad, 4)
    else:
        idx.regional = jnp.asarray(reg)
    sidx2 = idx.to_sharded()

    depth = 48   # > rows-per-shard (64 pad / 8 = 8): exercises local_k < depth
    from instsearch_tpu.search.rerank import regional_rerank_scores
    scores = idx._masked_scores(Q)
    s_l, i_l = regional_rerank_scores(
        idx.regional, idx.ids, scores, jnp.asarray(qreg), depth=depth,
        k=depth, regional_scales=idx.regional_scales)
    s_d, i_d = sidx2.search_rerank(Q, jnp.asarray(qreg), k=depth, depth=depth)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_l),
                               rtol=1e-4, atol=1e-5)


def test_splice_head():
    from instsearch_tpu.eval.evaluate import _splice_head
    ranks = np.array([[4, 2, 0, 1, 3], [0, 1, 2, 3, 4]])
    top = np.array([[1, 4, -1], [3, 0, 2]])
    out = _splice_head(ranks, top)
    np.testing.assert_array_equal(out[0], [1, 4, 2, 0, 3])
    np.testing.assert_array_equal(out[1], [3, 0, 2, 1, 4])


def test_diffusion_head_matches(pair):
    """The diffusion head the sharded eval splices must equal the
    single-device composite's (Index.search with diffusion_enabled)."""
    idx, sidx, Q = pair
    depth = 48
    scfg = SearchConfig(k=depth, diffusion_enabled=True,
                        diffusion_depth=depth, diffusion_knn=6,
                        use_pallas=False)
    _, i_local = idx.search(Q, scfg)
    _, i_shard = sidx.search_diffusion(Q, k=depth, depth=depth, knn=6)
    np.testing.assert_array_equal(np.asarray(i_shard), np.asarray(i_local))
