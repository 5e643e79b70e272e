"""αQE and regional re-ranking numerics (SURVEY.md C12/C13)."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.search import alpha_query_expansion, regional_rerank_scores


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_qe_matches_numpy_oracle(rng):
    X = _unit(rng.standard_normal((200, 32)).astype(np.float32))
    ids = np.arange(200, dtype=np.int32)
    q = _unit(rng.standard_normal((3, 32)).astype(np.float32))
    n, alpha = 5, 3.0
    out = np.asarray(alpha_query_expansion(
        jnp.asarray(X), jnp.asarray(ids), jnp.asarray(q), n=n, alpha=alpha))
    # numpy oracle
    scores = q @ X.T
    for qi in range(3):
        top = np.argsort(-scores[qi])[:n]
        w = np.clip(scores[qi][top], 0, None) ** alpha
        want = q[qi] + (w[:, None] * X[top]).sum(0)
        want /= np.linalg.norm(want)
        np.testing.assert_allclose(out[qi], want, rtol=1e-4, atol=1e-5)


def test_qe_ignores_padding(rng):
    X = _unit(rng.standard_normal((64, 16)).astype(np.float32))
    X[50:] = 10.0  # poison padding
    ids = np.arange(64, dtype=np.int32)
    ids[50:] = -1
    q = _unit(rng.standard_normal((1, 16)).astype(np.float32))
    out = np.asarray(alpha_query_expansion(
        jnp.asarray(X), jnp.asarray(ids), jnp.asarray(q), n=5))
    scores = q @ X[:50].T
    top = np.argsort(-scores[0])[:5]
    w = np.clip(scores[0][top], 0, None) ** 3.0
    want = _unit((q[0] + (w[:, None] * X[top]).sum(0))[None])[0]
    np.testing.assert_allclose(out[0], want, rtol=1e-4, atol=1e-5)


def test_qe_improves_recall_on_clusters(rng):
    # two clusters; query near cluster A: QE should pull the query deeper
    # into A and raise the worst same-cluster score
    center_a = _unit(rng.standard_normal(64).astype(np.float32))
    center_b = _unit(rng.standard_normal(64).astype(np.float32))
    A = _unit(center_a + 0.3 * rng.standard_normal((20, 64)).astype(np.float32))
    B = _unit(center_b + 0.3 * rng.standard_normal((20, 64)).astype(np.float32))
    X = np.concatenate([A, B]).astype(np.float32)
    ids = np.arange(40, dtype=np.int32)
    q = _unit((center_a + 0.5 * rng.standard_normal(64)).astype(np.float32))[None]
    qe = np.asarray(alpha_query_expansion(
        jnp.asarray(X), jnp.asarray(ids), jnp.asarray(q), n=5))
    before = (q @ A.T).min()
    after = (qe @ A.T).min()
    assert after > before


def test_rerank_promotes_region_match(rng):
    # candidate 1 has a region exactly matching a query region; candidate 0
    # wins globally but loses after regional re-ranking
    D, R = 16, 4
    store = _unit(rng.standard_normal((8, R, D)).astype(np.float32))
    ids = np.arange(8, dtype=np.int32)
    qreg = _unit(rng.standard_normal((1, R, D)).astype(np.float32))
    store[1] = qreg[0]  # perfect regional match
    gscores = np.full((1, 8), -0.5, np.float32)
    gscores[0, 0] = 0.9   # global winner
    gscores[0, 1] = 0.8
    s, i = regional_rerank_scores(
        jnp.asarray(store), jnp.asarray(ids), jnp.asarray(gscores),
        jnp.asarray(qreg), depth=8, k=3)
    assert np.asarray(i)[0, 0] == 1
    assert np.asarray(i)[0, 1] == 0


def test_rerank_respects_padding(rng):
    D, R = 8, 2
    store = _unit(rng.standard_normal((8, R, D)).astype(np.float32))
    ids = np.array([0, 1, 2, 3, -1, -1, -1, -1], np.int32)
    gscores = np.concatenate([
        rng.random((1, 4), dtype=np.float32),
        np.full((1, 4), -np.inf, np.float32)], axis=1)
    qreg = _unit(rng.standard_normal((1, R, D)).astype(np.float32))
    s, i = regional_rerank_scores(
        jnp.asarray(store), jnp.asarray(ids), jnp.asarray(gscores),
        jnp.asarray(qreg), depth=8, k=6)
    valid = np.asarray(i)[0][:4]
    assert set(valid.tolist()) == {0, 1, 2, 3}
    assert (np.asarray(s)[0][4:] == -np.inf).all()


def test_rerank_k_exceeds_depth_pads():
    """k > depth returns [Q, k] with a (-inf, -1) tail, same contract as
    the sharded stage — it used to crash in lax.top_k (review r2)."""
    rng = np.random.default_rng(8)
    N, R, D, Q = 32, 3, 16, 2
    store = rng.standard_normal((N, R, D)).astype(np.float32)
    store /= np.linalg.norm(store, axis=-1, keepdims=True)
    qreg = rng.standard_normal((Q, R, D)).astype(np.float32)
    gscores = rng.standard_normal((Q, N)).astype(np.float32)
    ids = np.arange(N, dtype=np.int32)
    s, i = regional_rerank_scores(jnp.asarray(store), jnp.asarray(ids),
                                  jnp.asarray(gscores), jnp.asarray(qreg),
                                  depth=5, k=9)
    assert s.shape == (Q, 9) and i.shape == (Q, 9)
    assert np.isfinite(np.asarray(s)[:, :5]).all()
    assert (np.asarray(s)[:, 5:] == -np.inf).all()
    assert (np.asarray(i)[:, 5:] == -1).all()
