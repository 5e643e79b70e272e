"""Distributed diffusion re-ranking must equal the single-device stage
(the merged global top-depth set is identical, and the graph/solve runs
replicated on the shared diffuse_from_candidates)."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.parallel import ShardedIndex, make_mesh
from instsearch_tpu.search.diffusion import diffusion_rerank_scores


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(53)
    N, D, Q = 256, 32, 3
    X = rng.standard_normal((N, D)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    q = X[:Q] + 0.05 * rng.standard_normal((Q, D)).astype(np.float32)
    ids = np.arange(N, dtype=np.int32)
    return X, q.astype(np.float32), ids


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_sharded_diffusion_equals_local(data, n_shards):
    X, q, ids = data
    k, depth = 5, 32
    mesh = make_mesh(n_shards)
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids), mesh=mesh)
    s_d, i_d = sidx.search_diffusion(jnp.asarray(q), k=k, depth=depth)
    gscores = (q @ X.T).astype(np.float32)
    s_l, i_l = diffusion_rerank_scores(
        jnp.asarray(X), jnp.asarray(ids), jnp.asarray(gscores),
        depth=depth, k=k)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_l),
                               rtol=1e-4, atol=1e-5)


def test_sharded_diffusion_int8(data):
    X, q, ids = data
    from instsearch_tpu.ops.quantize import quantize_rows
    qr = quantize_rows(jnp.asarray(X))
    mesh = make_mesh(8)
    sidx = ShardedIndex(qr.values, jnp.asarray(ids), mesh=mesh,
                        scales=qr.scales)
    s_d, i_d = sidx.search_diffusion(jnp.asarray(q), k=5, depth=32)
    deq = np.asarray(qr.values, np.float32) * np.asarray(qr.scales)[0][:, None]
    gscores = (q @ deq.T).astype(np.float32)
    s_l, i_l = diffusion_rerank_scores(
        jnp.asarray(qr.values), jnp.asarray(ids), jnp.asarray(gscores),
        depth=32, k=5, scales=qr.scales)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_l),
                               rtol=1e-3, atol=1e-4)


def test_sharded_diffusion_padding(data):
    """Padding rows (id -1) on the last shard never surface."""
    X, q, ids = data
    ids2 = ids.copy()
    ids2[-32:] = -1
    mesh = make_mesh(8)
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids2), mesh=mesh)
    _, i_d = sidx.search_diffusion(jnp.asarray(q), k=5, depth=64)
    assert np.asarray(i_d).max() < 224
    assert (np.asarray(i_d) != -1).all()          # k <= valid rows here
    # exactness against the masked single-device stage
    gscores = (q @ X.T).astype(np.float32)
    gscores[:, -32:] = -np.inf
    _, i_l = diffusion_rerank_scores(
        jnp.asarray(X), jnp.asarray(ids2), jnp.asarray(gscores),
        depth=64, k=5)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))


def test_sharded_diffusion_k_greater_than_depth(data):
    X, q, ids = data
    mesh = make_mesh(4)
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids), mesh=mesh)
    k, depth = 12, 8
    s_d, i_d = sidx.search_diffusion(jnp.asarray(q), k=k, depth=depth)
    s_np, i_np = np.asarray(s_d), np.asarray(i_d)
    assert s_np.shape == i_np.shape == (q.shape[0], k)
    assert np.isfinite(s_np[:, :depth]).all()
    assert (s_np[:, depth:] == -np.inf).all()
    assert (i_np[:, depth:] == -1).all()
