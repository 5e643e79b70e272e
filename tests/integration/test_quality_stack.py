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
