"""Index.to_sharded: same results through the distributed path."""
import numpy as np
import pytest

from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index


def test_to_sharded_matches_local(rng):
    X = rng.standard_normal((500, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(index=IndexConfig(num_shards=8, row_tile=8),
                         search=SearchConfig(k=7, use_pallas=False))
    idx = Index.from_descriptors(X, [str(i) for i in range(500)], cfg)
    assert idx.descriptors.shape[0] % 8 == 0

    sidx = idx.to_sharded()
    q = X[:3] + 0.001
    s_local, i_local = idx.search(q)
    s_shard, i_shard = sidx.search(q, k=7)
    np.testing.assert_array_equal(i_local, np.asarray(i_shard))
    np.testing.assert_allclose(s_local, np.asarray(s_shard), rtol=1e-5)


@pytest.mark.slow
def test_query_images_sharded_matches_local(tmp_path):
    """query_images(sharded_index=...) — the multi-chip serving composite —
    must match the single-device path for plain / QE / re-rank searches."""
    from instsearch_tpu import ExtractConfig
    from instsearch_tpu.data import frontend
    from instsearch_tpu.eval import make_mini_dataset

    mini = make_mini_dataset(str(tmp_path / "mini"), seed=3)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="rmac", image_size=64,
                              batch_size=8, dtype="float32"),
        index=IndexConfig(num_shards=8, row_tile=8),
        search=SearchConfig(k=5, rerank_enabled=True, rerank_depth=16,
                            use_pallas=False))
    idx = Index.build(mini.db_paths, cfg, seed=0)
    sidx = idx.to_sharded()
    imgs = np.stack([frontend.load_square(p, 64) for p in mini.db_paths[:4]])
    for scfg in [
        idx.cfg.search.replace(rerank_enabled=False),
        idx.cfg.search.replace(rerank_enabled=False, qe_enabled=True),
        idx.cfg.search,                                   # rerank
        idx.cfg.search.replace(qe_enabled=True),          # QE + rerank
    ]:
        s_l, i_l = idx.query_images(imgs, scfg)
        s_d, i_d = idx.query_images(imgs, scfg, sharded_index=sidx)
        np.testing.assert_array_equal(i_l, i_d)
        np.testing.assert_allclose(s_l, s_d, rtol=1e-4, atol=1e-5)
