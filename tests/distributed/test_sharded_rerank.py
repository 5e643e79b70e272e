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


def _quantize_regional(reg):
    """Per-(row, region) int8 quantization, same as Index.build's store."""
    from instsearch_tpu.ops.quantize import quantize_rows
    N, R, D = reg.shape
    qr = quantize_rows(jnp.asarray(reg.reshape(N * R, D)))
    return (jnp.asarray(qr.values).reshape(N, R, D),
            jnp.asarray(qr.scales).reshape(N, R))


def test_f32_descriptors_int8_regional(data):
    """Mixed storage: f32 descriptors + int8 regional store — the regional
    scales operand must bind to the regional slot, not the (absent) row
    scales (review r2). Result must match a locally-dequantized store."""
    X, reg, qreg, q, ids = data
    reg_i8, reg_sc = _quantize_regional(reg)
    mesh = make_mesh(8)
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids), mesh=mesh,
                        regional=reg_i8, regional_scales=reg_sc)
    s_d, i_d = sidx.search_rerank(jnp.asarray(q), jnp.asarray(qreg),
                                  k=5, depth=16)
    # oracle: single-device re-rank over the dequantized store
    deq = np.asarray(reg_i8, np.float32) * np.asarray(reg_sc)[..., None]
    gscores = q @ X.T
    s_l, i_l = regional_rerank_scores(
        jnp.asarray(deq), jnp.asarray(ids),
        jnp.asarray(gscores.astype(np.float32)), jnp.asarray(qreg),
        depth=16, k=5)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_l),
                               rtol=1e-4, atol=1e-5)


def test_rerank_k_greater_than_depth(data):
    """k > depth must still return [Q, k]: the first ``depth`` columns are
    the re-ranked candidates, the tail carries (-inf, -1) — not a silently
    depth-clamped shape (review r2)."""
    X, reg, qreg, q, ids = data
    mesh = make_mesh(4)
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids), mesh=mesh,
                        regional=jnp.asarray(reg))
    k, depth = 10, 4
    s_d, i_d = sidx.search_rerank(jnp.asarray(q), jnp.asarray(qreg),
                                  k=k, depth=depth)
    assert np.asarray(s_d).shape == (q.shape[0], k)
    assert np.asarray(i_d).shape == (q.shape[0], k)
    s_np, i_np = np.asarray(s_d), np.asarray(i_d)
    assert np.isfinite(s_np[:, :depth]).all()
    assert (s_np[:, depth:] == -np.inf).all()
    assert (i_np[:, depth:] == -1).all()
    # head matches the depth-wide re-rank exactly
    s_ref, i_ref = sidx.search_rerank(jnp.asarray(q), jnp.asarray(qreg),
                                      k=depth, depth=depth)
    np.testing.assert_array_equal(i_np[:, :depth], np.asarray(i_ref))
