"""Index build/query/save/load round-trip on the mini fixture."""
import numpy as np
import pytest

from instsearch_tpu import PipelineConfig, ExtractConfig, SearchConfig
from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.index import Index


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    return make_mini_dataset(str(tmp_path_factory.mktemp("mini_idx")), seed=1)


@pytest.fixture(scope="module")
def built(mini):
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem", image_size=64,
                              batch_size=8, dtype="float32"),
        search=SearchConfig(k=5))
    return Index.build(mini.db_paths, cfg, seed=0)


@pytest.mark.slow
def test_build_and_query(built, mini):
    assert built.num_valid == len(mini.imlist)
    # query with the first db image itself -> self-match at rank 0
    from instsearch_tpu.data import frontend
    img = frontend.load_square(mini.db_paths[0], 64)
    scores, ids = built.query_images(img[None])
    assert ids[0, 0] == 0
    assert scores[0, 0] > 0.99


@pytest.mark.slow
def test_save_load_roundtrip(built, tmp_path):
    built.save(str(tmp_path / "idx"))
    loaded = Index.load(str(tmp_path / "idx"))
    assert loaded.num_valid == built.num_valid
    assert loaded.names == built.names
    np.testing.assert_allclose(
        np.asarray(loaded.descriptors, dtype=np.float32),
        np.asarray(built.descriptors, dtype=np.float32), atol=1e-2)
    q = np.asarray(built.descriptors[:2], dtype=np.float32)
    s1, i1 = built.search(q)
    s2, i2 = loaded.search(q)
    np.testing.assert_array_equal(i1, i2)


@pytest.mark.slow
def test_whitened_build(mini):
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="mac", image_size=64,
                              batch_size=8, dtype="float32", whiten=True,
                              whiten_dim=32))
    idx = Index.build(mini.db_paths, cfg, seed=0)
    assert idx.dim == 32
    assert idx.extractor.whitening is not None
    # queries must go through the same whitening: self-match still holds
    from instsearch_tpu.data import frontend
    img = frontend.load_square(mini.db_paths[3], 64)
    _, ids = idx.query_images(img[None])
    assert ids[0, 0] == 3


@pytest.mark.slow
def test_evaluate_sharded_flag_matches(built, mini):
    """Index.evaluate(sharded=True) must reproduce the single-device
    protocol metrics exactly (same math, row-sharded)."""
    res1 = built.evaluate(mini, "medium")
    res8 = built.evaluate(mini, "medium", sharded=True)
    assert res8["mAP"] == pytest.approx(res1["mAP"], abs=1e-9)
    for k in ("mP@1", "mP@5", "mP@10"):
        assert res8[k] == pytest.approx(res1[k], abs=1e-9)


def test_name_of_with_quarantine_gaps():
    """Ids returned by search are dataset positions, which skip quarantined
    images — name lookup must map by id, not by list position (review r2)."""
    rng = np.random.default_rng(4)
    X = rng.standard_normal((3, 16)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(search=SearchConfig(k=3, use_pallas=False))
    idx = Index.from_descriptors(X, ["img0", "img2", "img3"], cfg,
                                 original_ids=np.asarray([0, 2, 3]))
    assert idx.name_of(0) == "img0"
    assert idx.name_of(2) == "img2"   # names[2] would be "img3" — wrong
    assert idx.name_of(3) == "img3"
    assert idx.name_of(1) is None     # quarantined position
    assert idx.name_of(-1) is None    # padding
    _, ids = idx.search(X[1:2])
    assert idx.name_of(ids[0, 0]) == "img2"


def test_query_dispatch_validation():
    """query() rejects ambiguous inputs with a clear error instead of a
    shape-unpack crash deep inside the jitted extractor (review r2)."""
    rng = np.random.default_rng(6)
    X = rng.standard_normal((4, 16)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(search=SearchConfig(k=2, use_pallas=False))
    idx = Index.from_descriptors(X, [str(i) for i in range(4)], cfg)
    s, i = idx.query(X[:2])                      # [Q, D] descriptors OK
    assert i.shape == (2, 2)
    s, i = idx.query(X[0])                       # [D] descriptor OK
    assert i.shape == (1, 2)
    with pytest.raises(ValueError, match="query\\(\\) expects"):
        idx.query(np.zeros((5, 16), np.uint8))   # uint8 2-D: ambiguous
    with pytest.raises(ValueError, match="query\\(\\) expects"):
        idx.query(np.zeros((2, 3, 16), np.float32))  # 3-D non-image


def test_query_rejects_unscaled_float_images():
    """Float image batches must be pre-scaled to [0, 1]
    (frontend.normalize contract); [0, 255] floats would silently
    produce garbage descriptors (review r2)."""
    rng = np.random.default_rng(7)
    X = rng.standard_normal((4, 16)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(search=SearchConfig(k=2, use_pallas=False))
    idx = Index.from_descriptors(X, [str(i) for i in range(4)], cfg)
    with pytest.raises(ValueError, match="pre-scaled to \\[0, 1\\]"):
        idx.query(np.full((2, 8, 8, 3), 255.0, np.float32))
    with pytest.raises(ValueError, match="pre-scaled to \\[0, 1\\]"):
        idx.query(np.full((8, 8, 3), -0.5, np.float32))
