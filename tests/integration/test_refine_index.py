"""Exact-refine tier (IndexConfig.refine_dtype + SearchConfig.refine_enabled):
int4 coarse scan re-scored against the int8 row copy — the FAISS
IndexRefine analog, implemented as the rerank machinery with the row as
its single region and fuse_weight=0."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.config import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _make(X, k=10, depth=32, capacity=0, refine=True):
    cfg = PipelineConfig(
        index=IndexConfig(dtype="int4", row_tile=16, capacity=capacity,
                          refine_dtype="int8" if refine else ""),
        search=SearchConfig(k=k, refine_enabled=refine, rerank_depth=depth,
                            use_pallas=False))
    return Index.from_descriptors(X, [f"i{i}" for i in range(len(X))], cfg)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(23)
    X = _unit(rng.standard_normal((256, 64)).astype(np.float32))
    q = _unit(X[:5] + 0.02 * rng.standard_normal((5, 64))
              .astype(np.float32))
    return X, q


def _int8_scores(idx, q):
    """Oracle: exact scores against the dequantized refine store."""
    store = (np.asarray(idx.regional, np.float32)[:, 0, :]
             * np.asarray(idx.regional_scales)[:, 0][:, None])
    return q @ store.T


def test_refine_store_built(data):
    X, _ = data
    idx = _make(X)
    assert idx.regional is not None
    assert idx.regional.shape == (idx.descriptors.shape[0], 1, 64)
    assert idx.regional.dtype == jnp.int8
    # the store holds the ORIGINAL rows at int8 precision (tighter than
    # the int4 matrix): dequantized error bound is an int8 step
    store = _int8_scores(idx, np.eye(64, dtype=np.float32))
    step = np.abs(X).max(axis=1) / 127.0
    assert (np.abs(store.T[:256] - X) <= step[:, None] + 1e-6).all()


def test_refine_matches_oracle(data):
    """Refined ranking == int8 re-scoring of the int4 scan's top-depth."""
    X, q = data
    idx = _make(X, k=10, depth=32)
    s, i = idx.search(q)
    # oracle: int4 top-depth candidates (the coarse scan), re-ordered by
    # the exact int8 scores, zero fusion with the coarse score
    from instsearch_tpu.ops.quantize import (QuantizedRowsInt4,
                                             dequantize_rows_int4)
    deq4 = np.asarray(dequantize_rows_int4(
        QuantizedRowsInt4(idx.descriptors, idx.scales)))
    coarse = np.argsort(-(q @ deq4[:256].T), axis=1)[:, :32]
    exact = _int8_scores(idx, q)
    for qi in range(len(q)):
        cand = coarse[qi]
        order = cand[np.argsort(-exact[qi][cand], kind="stable")][:10]
        np.testing.assert_array_equal(np.asarray(i)[qi], order)
        np.testing.assert_allclose(np.asarray(s)[qi],
                                   np.sort(exact[qi][cand])[::-1][:10],
                                   rtol=1e-5, atol=1e-6)


def test_refine_improves_over_raw_int4(data):
    """With enough depth, the refined top-10 equals the int8-exact
    top-10 even where raw int4 disagrees with it."""
    rng = np.random.default_rng(31)
    X = _unit(rng.standard_normal((1024, 128)).astype(np.float32))
    q = _unit(X[:8] + 0.015 * rng.standard_normal((8, 128))
              .astype(np.float32))
    idx = _make(X, k=10, depth=100)
    _, i_refined = idx.search(q)
    raw = _make(X, refine=False)
    _, i_raw = raw.search(q, SearchConfig(k=10, use_pallas=False))
    exact8 = np.argsort(-_int8_scores(idx, q), axis=1)[:, :10]
    ov_ref = np.mean([len(set(np.asarray(i_refined)[r]) & set(exact8[r]))
                      for r in range(8)])
    ov_raw = np.mean([len(set(np.asarray(i_raw)[r]) & set(exact8[r]))
                      for r in range(8)])
    assert ov_ref > ov_raw
    assert ov_ref >= 9.5, (ov_raw, ov_ref)


def test_refine_composes_with_qe(data):
    """QE + refine: the EXPANDED query drives both the coarse scan and
    the exact re-score (the composite synthesizes the refine region from
    the post-QE query)."""
    X, q = data
    idx = _make(X, k=10, depth=48)
    scfg = idx.cfg.search.replace(qe_enabled=True, qe_n=4)
    s, i = idx.search(q, scfg)
    from instsearch_tpu.search.qe import alpha_query_expansion
    q_exp = np.asarray(alpha_query_expansion(
        idx.descriptors, idx.ids, jnp.asarray(q), n=4,
        alpha=scfg.qe_alpha, scales=idx.scales, int4=True))
    from instsearch_tpu.ops.quantize import (QuantizedRowsInt4,
                                             dequantize_rows_int4)
    deq4 = np.asarray(dequantize_rows_int4(
        QuantizedRowsInt4(idx.descriptors, idx.scales)))
    coarse = np.argsort(-(q_exp @ deq4[:256].T), axis=1)[:, :48]
    exact = _int8_scores(idx, q_exp)
    for qi in range(len(q)):
        order = coarse[qi][np.argsort(-exact[qi][coarse[qi]],
                                      kind="stable")][:10]
        np.testing.assert_array_equal(np.asarray(i)[qi], order)


def test_refine_add_remove_persist(data, tmp_path):
    X, q = data
    idx = _make(X[:200], capacity=320, depth=32)
    extra = _unit(np.random.default_rng(7).standard_normal((20, 64))
                  .astype(np.float32))
    # descriptor adds extend the refine store without image paths
    assert idx.add(descriptors=extra,
                   names=[f"x{i}" for i in range(20)]) == 20
    _, i = idx.search(extra[:2])
    assert (np.asarray(i)[:, 0] == np.arange(200, 202)).all()
    idx.remove(["x0"])
    want_s, want_i = idx.search(q)
    p = str(tmp_path / "refine_idx")
    idx.save(p)
    idx2 = Index.load(p)
    assert idx2.regional is not None and idx2.regional.shape[1] == 1
    s2, i2 = idx2.search(q)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(want_i))


def test_refine_after_dba(data):
    """augment_database re-derives the refine store from the augmented
    f32 rows — refined scores reflect the augmentation."""
    X, q = data
    idx = _make(X, depth=32)
    idx.augment_database(n=5, chunk=32)
    s, i = idx.search(q)
    # the refine store now matches a fresh int8 quantization of the
    # augmented matrix: oracle re-score agrees
    exact = _int8_scores(idx, q)
    for qi in range(len(q)):
        top = np.asarray(i)[qi][0]
        # the returned best candidate's score equals its exact store score
        np.testing.assert_allclose(np.asarray(s)[qi][0], exact[qi][top],
                                   rtol=1e-5, atol=1e-6)


def test_refine_sharded_matches_single(data):
    X, q = data
    from instsearch_tpu.parallel import make_mesh
    idx = _make(X, depth=32)
    want_s, want_i = idx.search(q)
    sidx = idx.to_sharded(mesh=make_mesh(8), use_pallas=False)
    q32 = jnp.asarray(q, jnp.float32)
    s_d, i_d = sidx.search_rerank(q32, q32[:, None, :], k=10, depth=32,
                                  fuse_weight=0.0)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(want_s),
                               rtol=1e-4, atol=1e-5)


def test_refine_guards(data):
    X, q = data
    idx = _make(X)
    with pytest.raises(ValueError, match="mutually exclusive"):
        idx.search(q, idx.cfg.search.replace(diffusion_enabled=True))
    with pytest.raises(ValueError, match="refine"):
        idx.search(q, idx.cfg.search.replace(refine_enabled=False,
                                             rerank_enabled=True))
    # refine without the store
    plain = _make(X, refine=False)
    with pytest.raises(ValueError, match="refine"):
        plain.search(q, SearchConfig(k=5, refine_enabled=True,
                                     use_pallas=False))
    # config validation at build time
    with pytest.raises(ValueError, match="int4"):
        Index.from_descriptors(X, ["a"] * len(X), PipelineConfig(
            index=IndexConfig(dtype="int8", refine_dtype="int8")))

def test_r1_rmac_store_is_not_a_refine_store(data):
    """A LEGITIMATE 1-region R-MAC re-rank store (rmac_levels=1 on a
    square feature map yields R=1) must not be misclassified as the
    refine copy: the config, not the shape, is the discriminator
    (review r3)."""
    X, q = data
    rng = np.random.default_rng(41)
    cfg = PipelineConfig(
        index=IndexConfig(dtype="int4", row_tile=16),   # NO refine_dtype
        search=SearchConfig(k=5, rerank_enabled=True, rerank_depth=16,
                            use_pallas=False))
    from instsearch_tpu.index import attach_regional_store
    idx = Index.from_descriptors(X, [f"i{i}" for i in range(len(X))], cfg)
    reg = _unit(rng.standard_normal((len(X), 1, 64)).astype(np.float32))
    attach_regional_store(idx, reg)
    assert not idx.has_refine_store
    qreg = _unit(rng.standard_normal((len(q), 1, 64)).astype(np.float32))
    # rerank works over the R=1 R-MAC store (was a regression: raised)
    s, i = idx.search(q, query_regional=qreg)
    assert np.asarray(i).shape == (len(q), 5)
    # refine against it is rejected with a pointer to rerank
    with pytest.raises(ValueError, match="R-MAC"):
        idx.search(q, cfg.search.replace(rerank_enabled=False,
                                         refine_enabled=True))
    # descriptor-only add() must NOT silently write globals into it
    with pytest.raises(ValueError, match="paths"):
        idx.add(descriptors=X[:2], names=["za", "zb"])
    # and augment_database must leave the RAW store untouched
    before = np.asarray(idx.regional).copy()
    idx.augment_database(n=4, chunk=32)
    np.testing.assert_array_equal(np.asarray(idx.regional), before)
