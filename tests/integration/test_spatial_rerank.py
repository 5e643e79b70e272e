"""Spatial verification fused into regional re-ranking
(search/spatial.py; SearchConfig.spatial_weight).

The separating construction: a TRUE candidate carries the query's
regional descriptors in the SAME grid arrangement; a DECOY carries the
identical multiset of regions randomly permuted. The region-match stage
is arrangement-invariant — both score identically — while the Hough-vote
spatial score concentrates the true candidate's matches in one
transform bin and scatters the decoy's. Also asserted: weight 0 changes
nothing, validation guards fire, geometry round-trips save/load and
matches the extractor's store width, and the sharded path agrees."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.config import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index
from instsearch_tpu.ops.pooling import rmac_region_geometry
from instsearch_tpu.search.spatial import (build_vote_matrix,
                                           spatial_consistency_scores)


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _scrambled_pair(rng, d=24):
    """(query_regional [1,R,d], regional store [n,R,d], geom) where row 0
    is the true (same-arrangement) candidate, row 1 the scrambled decoy,
    rows 2+ random distractors."""
    geom = rmac_region_geometry(8, 8, levels=2)
    r = len(geom)
    qreg = _unit(rng.standard_normal((r, d)).astype(np.float32))
    # a permutation that moves regions far (reverse = maximal scatter)
    perm = np.arange(r)[::-1]
    n = 8
    store = _unit(rng.standard_normal((n, r, d)).astype(np.float32))
    store[0] = qreg                       # true: identical arrangement
    store[1] = qreg[perm]                 # decoy: same multiset, scrambled
    return qreg[None], store, geom


def _make(store, geom, rng, d=24, **scfg_kw):
    n = store.shape[0]
    # globals engineered so every candidate lands in the top-depth set
    # with near-identical coarse scores (the re-rank decides the order);
    # fixed seed so repeated _make calls build the IDENTICAL index
    g = np.random.default_rng(123)
    base = _unit(g.standard_normal((1, d)).astype(np.float32))
    X = _unit(np.repeat(base, n, 0)
              + 0.01 * g.standard_normal((n, d)).astype(np.float32))
    cfg = PipelineConfig(
        index=IndexConfig(dtype="float32", row_tile=8),
        search=SearchConfig(k=4, rerank_depth=n, rerank_enabled=True,
                            use_pallas=False, **scfg_kw))
    idx = Index.from_descriptors(X, [f"i{i}" for i in range(n)], cfg)
    from instsearch_tpu.index import attach_regional_store
    attach_regional_store(idx, store)
    idx.regional_geom = geom
    return idx, jnp.asarray(X[:1])


def test_spatial_separates_scrambled_arrangement(rng):
    qreg, store, geom = _scrambled_pair(rng)
    idx, q = _make(store, geom, rng, spatial_weight=1.0)
    s, ids = idx.search(q, query_regional=jnp.asarray(qreg))
    assert ids[0, 0] == 0, "true arrangement must beat the scrambled decoy"

    # without spatial verification the two are inseparable by the region
    # match (same multiset); the coarse-score jitter decides — assert the
    # MARGIN exists only with spatial on
    idx0, _ = _make(store, geom, rng, spatial_weight=0.0)
    s0, _ = idx0.search(q, query_regional=jnp.asarray(qreg))
    pos = {int(i): float(v) for v, i in zip(np.asarray(s)[0],
                                            np.asarray(ids)[0])}
    assert pos[0] - pos.get(1, -np.inf) > 0.3   # wide spatial margin


def test_weight_zero_is_identity(rng):
    qreg, store, geom = _scrambled_pair(rng)
    idx, q = _make(store, geom, rng, spatial_weight=0.0)
    idx_n, _ = _make(store, None, rng, spatial_weight=0.0)
    s_a, i_a = idx.search(q, query_regional=jnp.asarray(qreg))
    s_b, i_b = idx_n.search(q, query_regional=jnp.asarray(qreg))
    np.testing.assert_array_equal(i_a, i_b)
    np.testing.assert_allclose(s_a, s_b, rtol=0, atol=0)


def test_vote_matrix_properties():
    geom = rmac_region_geometry(8, 8, levels=2)
    v = build_vote_matrix(geom, geom)
    r = len(geom)
    assert v.shape[0] == r * r and (v.sum(axis=1) == 1.0).all()
    # identity pairs (i, i) all share the zero-transform bin
    ident = v[np.arange(r) * r + np.arange(r)]
    assert (ident.argmax(axis=1) == ident[0].argmax()).all()
    # a far pair lands in a different bin than identity
    far = v[0 * r + (r - 1)]
    assert far.argmax() != ident[0].argmax()


def test_spatial_scores_prefer_consistent(rng):
    geom = rmac_region_geometry(8, 8, levels=2)
    r = len(geom)
    v = jnp.asarray(build_vote_matrix(geom, geom))
    eye = jnp.eye(r)[None, None]                      # consistent matches
    perm = jnp.asarray(np.eye(r)[::-1][None, None])   # scattered matches
    sim = jnp.concatenate([eye, perm], axis=1)        # [1, 2, R, R]
    sc = np.asarray(spatial_consistency_scores(sim, v))
    assert sc[0, 0] == pytest.approx(1.0)
    assert sc[0, 1] < 0.5


def test_validation_guards(rng):
    qreg, store, geom = _scrambled_pair(rng)
    idx, q = _make(store, geom, rng, spatial_weight=1.0)
    with pytest.raises(ValueError, match="rerank_enabled"):
        idx.search(q, idx.cfg.search.replace(rerank_enabled=False),
                   query_regional=jnp.asarray(qreg))
    idx.regional_geom = None
    with pytest.raises(ValueError, match="grid geometry"):
        idx.search(q, query_regional=jnp.asarray(qreg))


def test_geometry_persists(tmp_path, rng):
    qreg, store, geom = _scrambled_pair(rng)
    idx, q = _make(store, geom, rng, spatial_weight=1.0)
    want_s, want_i = idx.search(q, query_regional=jnp.asarray(qreg))
    idx.save(os.fspath(tmp_path / "idx"))
    idx2 = Index.load(os.fspath(tmp_path / "idx"))
    np.testing.assert_allclose(idx2.regional_geom, geom)
    got_s, got_i = idx2.search(q, query_regional=jnp.asarray(qreg))
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6)


def test_sharded_spatial_matches_single(rng):
    from instsearch_tpu.parallel import make_mesh
    qreg, store, geom = _scrambled_pair(rng)
    idx, q = _make(store, geom, rng, spatial_weight=1.0)
    want_s, want_i = idx.search(q, query_regional=jnp.asarray(qreg))
    sidx = idx.to_sharded(mesh=make_mesh(4))
    got_s, got_i = sidx.search_rerank(
        q, jnp.asarray(qreg), k=4, depth=idx.cfg.search.rerank_depth,
        spatial_weight=1.0)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_s), want_s,
                               rtol=2e-5, atol=2e-6)


def test_extractor_geometry_matches_store(rng):
    from instsearch_tpu.config import ExtractConfig
    from instsearch_tpu.extractor import Extractor
    cfg = ExtractConfig(backbone="resnet18", pooling="rmac", image_size=64,
                        dtype="float32", rmac_levels=2)
    ex = Extractor(cfg, seed=0)
    geom = ex.regional_geometry()
    img = (rng.random((1, 64, 64, 3)) * 255).astype(np.uint8)
    reg = ex.extract_regional(jnp.asarray(img))
    assert geom.shape == (reg.shape[1], 3)
