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
