"""QE + regional re-rank end-to-end on the mini fixture (BASELINE configs
3 and 5)."""
import numpy as np
import pytest

from instsearch_tpu import ExtractConfig, PipelineConfig, SearchConfig
from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.eval.evaluate import evaluate_index
from instsearch_tpu.index import Index


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    return make_mini_dataset(str(tmp_path_factory.mktemp("mini_q")), seed=2)


@pytest.fixture(scope="module")
def built(mini):
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="rmac", image_size=64,
                              batch_size=8, dtype="float32"),
        search=SearchConfig(k=5, rerank_enabled=True, rerank_depth=16,
                            use_pallas=False))
    return Index.build(mini.db_paths, cfg, seed=0)


@pytest.mark.slow
def test_regional_store_built(built, mini):
    assert built.regional is not None
    n_pad = built.descriptors.shape[0]
    assert built.regional.shape[0] == n_pad
    assert built.regional.shape[2] == 512
    # valid rows are unit-norm per region
    reg = np.asarray(built.regional[:4], dtype=np.float32)
    np.testing.assert_allclose(
        np.linalg.norm(reg, axis=-1), 1.0, atol=2e-2)


@pytest.mark.slow
def test_rerank_build_is_single_pass(mini):
    """A rerank-enabled build decodes + runs the backbone over the corpus
    ONCE — the combined program emits (global, regional) per batch, so the
    images_extracted counter advances by exactly N, not 2N (review r2)."""
    from instsearch_tpu.utils import COUNTERS
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="rmac", image_size=64,
                              batch_size=8, dtype="float32", whiten=True,
                              whiten_dim=32),
        search=SearchConfig(k=5, rerank_enabled=True, rerank_depth=16,
                            use_pallas=False))
    before = COUNTERS.dump().get("images_extracted", 0)
    idx = Index.build(mini.db_paths, cfg, seed=0)
    after = COUNTERS.dump()["images_extracted"]
    assert after - before == len(mini.db_paths)
    assert idx.regional is not None
    # whitening applied to the store too: regional dim == whiten_dim
    assert idx.regional.shape[2] == 32
    # and the self-match still survives the whitened re-rank
    from instsearch_tpu.data import frontend
    img = frontend.load_square(mini.db_paths[1], 64)
    _, ids = idx.query_images(img[None])
    assert ids[0, 0] == 1


@pytest.mark.slow
def test_query_images_with_rerank(built, mini):
    from instsearch_tpu.data import frontend
    img = frontend.load_square(mini.db_paths[2], 64)
    scores, ids = built.query_images(img[None])
    assert ids[0, 0] == 2   # self-match survives re-ranking


@pytest.mark.slow
def test_eval_with_qe_and_rerank(built, mini):
    base = evaluate_index(built, mini, "medium",
                          SearchConfig(use_pallas=False))
    qe = evaluate_index(built, mini, "medium",
                        SearchConfig(qe_enabled=True, qe_n=3, use_pallas=False))
    rr = evaluate_index(built, mini, "medium",
                        SearchConfig(rerank_enabled=True, rerank_depth=16,
                                     use_pallas=False))
    for r in (base, qe, rr):
        assert np.isfinite(r["mAP"]) and 0 <= r["mAP"] <= 100
    # on near-duplicate clusters all variants should stay strong
    assert base["mAP"] > 70
    assert qe["mAP"] > 70
    assert rr["mAP"] > 70


@pytest.mark.slow
def test_composite_matches_full_matrix_oracle(built, mini):
    """The production composite (fused top-depth candidate selection, no
    [Q, N] materialization) must reproduce the full-matrix oracle
    (alpha_query_expansion + regional_rerank_scores over masked scores)
    exactly (review r2: the sharded path always selected candidates this
    way; the single-device composite now mirrors it)."""
    import jax.numpy as jnp
    from instsearch_tpu.search.qe import alpha_query_expansion
    from instsearch_tpu.search.rerank import regional_rerank_scores
    rng = np.random.default_rng(13)
    q = np.asarray(built.descriptors[:6], np.float32)
    q += 0.01 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    from instsearch_tpu.data import frontend
    qreg = np.asarray(built.extractor.extract_regional(
        np.stack([frontend.load_square(mini.db_paths[i], 64)
                  for i in range(6)])))
    scfg = built.cfg.search.replace(qe_enabled=True, qe_n=3,
                                    rerank_enabled=True, rerank_depth=16)
    got_s, got_i = built.search(q, scfg, query_regional=qreg)

    q_exp = alpha_query_expansion(built.descriptors, built.ids,
                                  jnp.asarray(q), n=3,
                                  alpha=scfg.qe_alpha, scales=built.scales)
    want_s, want_i = regional_rerank_scores(
        built.regional, built.ids, built._masked_scores(q_exp),
        jnp.asarray(qreg), depth=16, k=scfg.k,
        regional_scales=built.regional_scales)
    np.testing.assert_array_equal(got_i, np.asarray(want_i))
    np.testing.assert_allclose(got_s, np.asarray(want_s), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.slow
def test_search_composite_chunking(built, mini):
    """search() chunks the WHOLE composite (QE + rerank included): the
    [Q, N] score matrices are bounded by query_chunk, and chunked results
    equal the single-pass ones exactly."""
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    n_q = 11
    q = np.asarray(built.descriptors[:n_q], np.float32)
    q += 0.01 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qreg = np.asarray(built.extractor.extract_regional(
        np.stack([__import__("instsearch_tpu.data.frontend",
                             fromlist=["load_square"]).load_square(
            mini.db_paths[i], 64) for i in range(n_q)])))
    for scfg in [
        built.cfg.search.replace(qe_enabled=True, query_chunk=4),
        built.cfg.search.replace(rerank_enabled=True, query_chunk=4),
        built.cfg.search.replace(qe_enabled=True, rerank_enabled=True,
                                 query_chunk=4),
    ]:
        one = built.search(q, scfg.replace(query_chunk=0),
                           query_regional=qreg)
        chk = built.search(q, scfg, query_regional=qreg)
        np.testing.assert_array_equal(chk[1], one[1])
        np.testing.assert_allclose(chk[0], one[0], rtol=1e-5)


@pytest.mark.slow
def test_eval_with_diffusion(built, mini):
    """Protocol evaluation honors diffusion_enabled: the top-depth head
    is re-ordered by the diffusion composite and spliced (same treatment
    as the regional re-rank head); sharded routing gives the same mAP."""
    diff_cfg = SearchConfig(diffusion_enabled=True, diffusion_depth=16,
                            diffusion_knn=4, use_pallas=False)
    r = evaluate_index(built, mini, "medium", diff_cfg)
    assert np.isfinite(r["mAP"]) and 0 <= r["mAP"] <= 100
    # the mini fixture's relevant sets are tight near-duplicate clusters,
    # not manifolds — diffusion neither shines nor collapses here (~65 vs
    # ~75 plain; the manifold case where it MUST win is asserted in
    # test_quality_lift.py). This test pins the protocol plumbing: the
    # spliced head stays sane and sharded == single-device exactly.
    assert r["mAP"] > 50
    sidx = built.to_sharded()
    r_sharded = evaluate_index(built, mini, "medium", diff_cfg,
                               sharded_index=sidx)
    assert abs(r_sharded["mAP"] - r["mAP"]) < 1e-6
