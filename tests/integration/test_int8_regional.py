"""int8-quantized regional re-rank store: build, search, save/load."""
import numpy as np
import pytest

from instsearch_tpu import ExtractConfig, IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.index import Index


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    mini = make_mini_dataset(str(tmp_path_factory.mktemp("mini_i8r")),
                             n_instances=3, n_views=3, n_distractors=3, seed=29)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="rmac", image_size=64,
                              batch_size=8, dtype="float32"),
        index=IndexConfig(dtype="int8", row_tile=8),
        search=SearchConfig(k=5, rerank_enabled=True, rerank_depth=12,
                            use_pallas=False))
    return mini, Index.build(mini.db_paths, cfg, seed=0)


@pytest.mark.slow
def test_int8_regional_store(built):
    import jax.numpy as jnp
    mini, idx = built
    assert idx.regional.dtype == jnp.int8
    assert idx.regional_scales.shape == idx.regional.shape[:2]


@pytest.mark.slow
def test_int8_regional_rerank_selfmatch(built):
    mini, idx = built
    from instsearch_tpu.data import frontend
    img = frontend.load_square(mini.db_paths[4], 64)
    scores, ids = idx.query_images(img[None])
    assert ids[0, 0] == 4


@pytest.mark.slow
def test_int8_regional_save_load(built, tmp_path):
    import jax.numpy as jnp
    mini, idx = built
    idx.save(str(tmp_path / "i8r"))
    loaded = Index.load(str(tmp_path / "i8r"))
    assert loaded.regional.dtype == jnp.int8
    assert loaded.regional_scales is not None
    q = np.asarray(idx.descriptors[:2].astype(jnp.float32)) \
        * np.asarray(idx.scales)[0, :2, None]
    from instsearch_tpu.search.rerank import regional_rerank_scores
    s1, i1 = regional_rerank_scores(
        idx.regional, idx.ids, idx._masked_scores(jnp.asarray(q)),
        jnp.asarray(np.asarray(idx.regional[:2], np.float32)
                    * np.asarray(idx.regional_scales)[:2][..., None]),
        depth=12, k=5, regional_scales=idx.regional_scales)
    s2, i2 = regional_rerank_scores(
        loaded.regional, loaded.ids, loaded._masked_scores(jnp.asarray(q)),
        jnp.asarray(np.asarray(loaded.regional[:2], np.float32)
                    * np.asarray(loaded.regional_scales)[:2][..., None]),
        depth=12, k=5, regional_scales=loaded.regional_scales)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
