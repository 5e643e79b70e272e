"""End-to-end integration on the synthetic mini dataset (SURVEY.md §4.5):
build descriptors -> search -> junk-aware evaluation, with golden bounds."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu import ExtractConfig
from instsearch_tpu.eval import evaluate_scores, make_mini_dataset
from instsearch_tpu.extractor import Extractor
from instsearch_tpu.search import all_scores


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    return make_mini_dataset(str(tmp_path_factory.mktemp("mini")), seed=0)


def test_mini_dataset_layout(mini):
    assert len(mini.qimlist) == 8
    assert len(mini.imlist) == 8 * 6 + 8
    for e in mini.gnd:
        assert e["easy"] and e["hard"] and e["junk"]


@pytest.mark.slow
def test_end_to_end_map(mini):
    # Random-weight ResNet-50 at tiny resolution: same-instance views are
    # near-duplicates, so even random features must rank them on top.
    cfg = ExtractConfig(backbone="resnet50", pooling="avg", image_size=64,
                        batch_size=8, dtype="float32")
    ex = Extractor(cfg, seed=0)
    quarantine: list = []
    db, kept = ex.extract_paths(mini.db_paths, quarantine)
    q, _ = ex.extract_paths(mini.query_paths)
    assert not quarantine
    assert db.shape == (len(mini.imlist), 2048)
    assert list(kept) == list(range(len(mini.imlist)))
    np.testing.assert_allclose(np.linalg.norm(db, axis=1), 1.0, rtol=1e-4)

    scores = np.asarray(all_scores(jnp.asarray(db), jnp.asarray(q)))
    res_med = evaluate_scores(scores, mini.gnd, "medium")
    res_hard = evaluate_scores(scores, mini.gnd, "hard")
    assert res_med["num_queries"] == 8
    # near-duplicate views with random CNN features: mAP should be high
    assert res_med["mAP"] > 80.0, res_med
    assert res_med["mP@1"] == pytest.approx(100.0)
    # hard views are heavily corrupted; protocol must still produce a number
    assert 0.0 <= res_hard["mAP"] <= 100.0


def test_quarantine_corrupt_image(mini, tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg")
    cfg = ExtractConfig(backbone="vgg16", pooling="mac", image_size=32,
                        batch_size=2, dtype="float32")
    ex = Extractor(cfg, seed=0)
    quarantine: list = []
    descs, kept = ex.extract_paths(
        [mini.db_paths[0], str(bad), mini.db_paths[1]], quarantine)
    assert quarantine == [str(bad)]
    assert descs.shape[0] == 2
    assert list(kept) == [0, 2]
