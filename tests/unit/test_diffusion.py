"""Diffusion re-ranking (search/diffusion.py).

Covers the three layers separately: the batched CG solver against a
direct dense solve, the graph/seed/solve stage's ranking properties
(manifold promotion — the reason the stage exists), and the
candidate-level contracts (invalid slots, k-vs-depth padding) shared
with the composite in index.py.
"""
import jax.numpy as jnp
import numpy as np

from instsearch_tpu.search.diffusion import (_cg_solve,
                                             _mutual_knn_affinity,
                                             diffuse_from_candidates,
                                             diffusion_rerank_scores)


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_cg_matches_direct_solve(rng):
    """CG on (I - alpha W) f = y must converge to the dense solution."""
    Q, L = 3, 24
    v = jnp.asarray(_unit(rng.standard_normal((Q, L, 16))
                          .astype(np.float32)))
    valid = jnp.ones((Q, L), bool)
    w = _mutual_knn_affinity(v, valid, knn=6)
    y = jnp.asarray(np.abs(rng.standard_normal((Q, L))
                           .astype(np.float32)))
    alpha = 0.9
    f = np.asarray(_cg_solve(w, y, alpha, iters=60))
    wn = np.asarray(w)
    for qi in range(Q):
        a = np.eye(L, dtype=np.float32) - alpha * wn[qi]
        want = np.linalg.solve(a, np.asarray(y)[qi])
        np.testing.assert_allclose(f[qi], want, rtol=1e-3, atol=1e-4)


def test_affinity_is_symmetric_normalized(rng):
    v = jnp.asarray(_unit(rng.standard_normal((2, 20, 8))
                          .astype(np.float32)))
    valid = jnp.ones((2, 20), bool)
    w = np.asarray(_mutual_knn_affinity(v, valid, knn=5))
    np.testing.assert_allclose(w, np.swapaxes(w, 1, 2), atol=1e-6)
    assert (np.abs(np.diagonal(w, axis1=1, axis2=2)) < 1e-6).all()
    # spectral radius of D^-1/2 A D^-1/2 is <= 1 -> (I - aW) stays PD
    for qi in range(2):
        assert np.abs(np.linalg.eigvalsh(w[qi])).max() <= 1.0 + 1e-5


def test_diffusion_promotes_manifold_neighbor(rng):
    """The defining property (arXiv:1611.05113): a point connected to the
    query THROUGH the manifold outranks an isolated distractor with a
    higher direct cosine."""
    D = 32
    # a smooth 1-D manifold: small rotations of a base vector
    base = _unit(rng.standard_normal(D).astype(np.float32))
    step = _unit(rng.standard_normal(D).astype(np.float32))
    step = _unit(step - (step @ base) * base)
    chain = np.stack([_unit(np.cos(t) * base + np.sin(t) * step)
                      for t in np.linspace(0.0, 1.1, 12)])
    # isolated distractor: closer to the query than the chain's far end
    # by direct cosine, but orthogonal to everything else
    iso_dir = _unit(rng.standard_normal(D).astype(np.float32))
    for c in [base, step]:
        iso_dir = iso_dir - (iso_dir @ c) * c
    iso = _unit(np.cos(0.7) * base + np.sin(0.7) * _unit(iso_dir))
    cand = np.concatenate([chain, iso[None]]).astype(np.float32)  # [13, D]
    q = base
    g = (cand @ q).astype(np.float32)
    far_chain, iso_i = 11, 12
    assert g[iso_i] > g[far_chain], "setup: distractor wins on raw cosine"
    f = np.asarray(diffuse_from_candidates(
        jnp.asarray(cand[None]), jnp.asarray(g[None]),
        knn=3, alpha=0.95, iters=30, seeds=3))[0]
    assert f[far_chain] > f[iso_i], \
        "diffusion must promote the manifold-connected candidate"


def test_invalid_slots_never_promoted(rng):
    Q, L, D = 2, 16, 8
    cand = rng.standard_normal((Q, L, D)).astype(np.float32)
    g = rng.random((Q, L)).astype(np.float32)
    g[:, 10:] = -np.inf                       # padding / beyond num_valid
    f = np.asarray(diffuse_from_candidates(jnp.asarray(cand),
                                           jnp.asarray(g)))
    assert (f[:, 10:] == -np.inf).all()
    assert np.isfinite(f[:, :10]).all()


def test_rerank_scores_contract(rng):
    """diffusion_rerank_scores: ids respect padding; k > depth pads with
    (-inf, -1); all returned ids come from the top-depth candidates."""
    N, D, Q = 64, 16, 3
    X = _unit(rng.standard_normal((N, D)).astype(np.float32))
    ids = np.arange(N, dtype=np.int32)
    ids[-8:] = -1
    q = _unit(rng.standard_normal((Q, D)).astype(np.float32))
    scores = (q @ X.T).astype(np.float32)
    scores[:, -8:] = -np.inf
    depth, k = 12, 20
    s, i = diffusion_rerank_scores(jnp.asarray(X), jnp.asarray(ids),
                                   jnp.asarray(scores), depth=depth, k=k)
    s, i = np.asarray(s), np.asarray(i)
    assert s.shape == i.shape == (Q, k)
    assert (s[:, depth:] == -np.inf).all() and (i[:, depth:] == -1).all()
    assert np.isfinite(s[:, :depth]).all()
    # every returned id is one of that query's top-depth global candidates
    top = np.argsort(-scores, axis=1)[:, :depth]
    for qi in range(Q):
        assert set(i[qi, :depth]) <= set(ids[top[qi]])
