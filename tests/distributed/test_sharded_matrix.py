"""The full sharded feature matrix (SURVEY.md §2.2 / BASELINE configs 3-5):
every distributed stage {search, alpha-QE, regional re-rank} must equal its
single-device oracle for every storage x kernel combination
{f32, int8-with-scales} x {XLA oracle, Pallas interpret}."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.ops.quantize import quantize_rows
from instsearch_tpu.parallel import ShardedIndex, make_mesh
from instsearch_tpu.search import (alpha_query_expansion,
                                   regional_rerank_scores)

N, R, D, NQ = 512, 4, 64, 3


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(51)
    X = rng.standard_normal((N, D)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    reg = rng.standard_normal((N, R, D)).astype(np.float32)
    reg /= np.linalg.norm(reg, axis=-1, keepdims=True)
    qreg = rng.standard_normal((NQ, R, D)).astype(np.float32)
    qreg /= np.linalg.norm(qreg, axis=-1, keepdims=True)
    Q = X[:NQ] + 0.01 * rng.standard_normal((NQ, D)).astype(np.float32)
    ids = np.arange(N, dtype=np.int32)
    return X, reg, qreg, Q, ids


def make_pair(data, int8: bool, use_pallas: bool, n_shards: int = 8):
    """(ShardedIndex, local_arrays) with the same storage on both sides."""
    X, reg, qreg, Q, ids = data
    mesh = make_mesh(n_shards)
    if int8:
        qr = quantize_rows(jnp.asarray(X))
        flat = quantize_rows(jnp.asarray(reg.reshape(-1, D)))
        reg_q = flat.values.reshape(reg.shape)
        reg_sc = flat.scales.reshape(N, R)
        sidx = ShardedIndex(qr.values, jnp.asarray(ids), mesh=mesh,
                            use_pallas=use_pallas, interpret=use_pallas,
                            scales=qr.scales, regional=reg_q,
                            regional_scales=reg_sc)
        local = dict(X=qr.values, scales=qr.scales, reg=reg_q,
                     reg_scales=reg_sc)
    else:
        sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids), mesh=mesh,
                            use_pallas=use_pallas, interpret=use_pallas,
                            regional=jnp.asarray(reg))
        local = dict(X=jnp.asarray(X), scales=None, reg=jnp.asarray(reg),
                     reg_scales=None)
    return sidx, local


def local_scores(local, q):
    X, scales = local["X"], local["scales"]
    if X.dtype == jnp.int8:
        s = jnp.asarray(q, jnp.float32) @ X.T.astype(jnp.float32) * scales
    else:
        s = jnp.asarray(q, jnp.float32) @ X.T
    return s


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("int8", [False, True])
def test_matrix_search(data, int8, use_pallas):
    """8 shards must equal 1 shard (the single-device path, by design the
    same code) exactly; the oracle cells additionally match dense top-k.
    The Pallas int8 kernel quantizes the query on the fly (int8x int8 MXU),
    so its reference is the identically-configured 1-shard run, not the
    f32-query oracle."""
    X, reg, qreg, Q, ids = data
    sidx, local = make_pair(data, int8, use_pallas)
    single, _ = make_pair(data, int8, use_pallas, n_shards=1)
    s_d, i_d = sidx.search(jnp.asarray(Q), k=10)
    s_1, i_1 = single.search(jnp.asarray(Q), k=10)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_1))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_1),
                               rtol=1e-4, atol=1e-5)
    if not use_pallas:
        s_l, i_l = jax.lax.top_k(local_scores(local, Q), 10)
        np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("int8", [False, True])
def test_matrix_qe(data, int8, use_pallas):
    X, reg, qreg, Q, ids = data
    sidx, local = make_pair(data, int8, use_pallas)
    single, _ = make_pair(data, int8, use_pallas, n_shards=1)
    s_d, i_d = sidx.search_qe(jnp.asarray(Q), k=10, qe_n=5, alpha=3.0)
    s_1, i_1 = single.search_qe(jnp.asarray(Q), k=10, qe_n=5, alpha=3.0)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_1))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_1),
                               rtol=1e-4, atol=1e-5)
    if not use_pallas:
        q_exp = alpha_query_expansion(local["X"], jnp.asarray(ids),
                                      jnp.asarray(Q), n=5, alpha=3.0,
                                      scales=local["scales"])
        s_l, i_l = jax.lax.top_k(local_scores(local, q_exp), 10)
        np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("int8", [False, True])
def test_matrix_rerank(data, int8, use_pallas):
    X, reg, qreg, Q, ids = data
    sidx, local = make_pair(data, int8, use_pallas)
    single, _ = make_pair(data, int8, use_pallas, n_shards=1)
    depth, k = 16, 5
    s_d, i_d = sidx.search_rerank(jnp.asarray(Q), jnp.asarray(qreg),
                                  k=k, depth=depth)
    s_1, i_1 = single.search_rerank(jnp.asarray(Q), jnp.asarray(qreg),
                                    k=k, depth=depth)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_1))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_1),
                               rtol=1e-4, atol=1e-5)
    if not use_pallas:
        s_l, i_l = regional_rerank_scores(
            local["reg"], jnp.asarray(ids), local_scores(local, Q),
            jnp.asarray(qreg), depth=depth, k=k,
            regional_scales=local["reg_scales"])
        np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))


@pytest.mark.parametrize("int8", [False, True])
def test_matrix_padding_never_surfaces(data, int8):
    """Tail-padding rows must never reach any stage's output."""
    X, reg, qreg, Q, ids = data
    ids2 = ids.copy()
    ids2[-64:] = -1
    mesh = make_mesh(8)
    if int8:
        qr = quantize_rows(jnp.asarray(X))
        flat = quantize_rows(jnp.asarray(reg.reshape(-1, D)))
        sidx = ShardedIndex(qr.values, jnp.asarray(ids2), mesh=mesh,
                            scales=qr.scales,
                            regional=flat.values.reshape(reg.shape),
                            regional_scales=flat.scales.reshape(N, R))
    else:
        sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids2), mesh=mesh,
                            regional=jnp.asarray(reg))
    _, i1 = sidx.search(jnp.asarray(Q), k=10)
    _, i2 = sidx.search_qe(jnp.asarray(Q), k=10, qe_n=5)
    _, i3 = sidx.search_rerank(jnp.asarray(Q), jnp.asarray(qreg), k=5, depth=16)
    for i in (i1, i2, i3):
        assert np.asarray(i).max() < N - 64
        assert (np.asarray(i) >= 0).all()


def test_to_sharded_forwards_regional(data):
    """ADVICE r1: to_sharded() must carry the regional store (and its
    scales) so distributed re-ranking works on a built index."""
    X, reg, qreg, Q, ids = data
    from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
    from instsearch_tpu.index import Index
    cfg = PipelineConfig(index=IndexConfig(dtype="int8", row_tile=8,
                                           num_shards=8),
                         search=SearchConfig(k=5, use_pallas=False,
                                             rerank_enabled=True))
    idx = Index.from_descriptors(X, [str(i) for i in range(N)], cfg)
    # attach an int8 regional store the way Index.build does
    n_pad = idx.descriptors.shape[0]
    reg_pad = np.zeros((n_pad, R, D), np.float32)
    reg_pad[:N] = reg
    flat = quantize_rows(jnp.asarray(reg_pad.reshape(-1, D)))
    idx.regional = flat.values.reshape(reg_pad.shape)
    idx.regional_scales = flat.scales.reshape(n_pad, R)
    sidx = idx.to_sharded()
    assert sidx.regional is not None and sidx.regional_int8
    s, i = sidx.search_rerank(jnp.asarray(Q), jnp.asarray(qreg), k=5, depth=16)
    assert (np.asarray(i)[:, 0] == np.arange(NQ)).all()


def test_capacity_presizes_padding(data):
    """ADVICE r1: IndexConfig.capacity pre-sizes the padded row count."""
    X, reg, qreg, Q, ids = data
    from instsearch_tpu import IndexConfig, PipelineConfig
    from instsearch_tpu.index import Index
    cfg = PipelineConfig(index=IndexConfig(row_tile=8, num_shards=8,
                                           capacity=2048))
    idx = Index.from_descriptors(X, [str(i) for i in range(N)], cfg)
    assert idx.descriptors.shape[0] >= 2048
    assert idx.num_valid == N
