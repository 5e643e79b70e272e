"""Distributed local-whitening re-ranking (parallel/sharded_index.py::
sharded_lw_fn / ShardedIndex.search_lw) vs the single-device composite.

Row-sharded whitened store + assignments, replicated bank; candidate
membership + re-score + merge follow the sharded_rerank_fn pattern.
Asserted: sharded == single-device Index.search(lw_enabled) for f32 and
int8 storage on 1/2/4/8-shard meshes (the 1-device mesh is the same
code path), and to_sharded carries the view automatically."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.config import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index
from instsearch_tpu.parallel import make_mesh


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _make_index(rng, dtype="float32", n=192, d=32, depth=48, k=8):
    centers = np.eye(3, d, dtype=np.float32) * 5
    X = _unit(np.concatenate([
        centers[i] + rng.standard_normal((n // 3, d)).astype(np.float32)
        for i in range(3)]))
    cfg = PipelineConfig(
        index=IndexConfig(dtype=dtype, row_tile=8),
        search=SearchConfig(k=k, rerank_depth=depth, use_pallas=False,
                            lw_enabled=True))
    idx = Index.from_descriptors(X, [f"i{i}" for i in range(n)], cfg)
    idx.fit_local_whitening(n_clusters=4, tau=8.0, seed=0)
    q = jnp.asarray(_unit(X[:7] + 0.1 * rng.standard_normal(
        (7, d)).astype(np.float32)))
    return idx, q


@pytest.mark.parametrize("dtype", ["float32", "int8"])
@pytest.mark.parametrize("shards", [1, 2, 4, 8])
def test_sharded_lw_matches_single_device(rng, dtype, shards):
    idx, q = _make_index(rng, dtype=dtype)
    want_s, want_i = idx.search(q)

    sidx = idx.to_sharded(mesh=make_mesh(shards))
    got_s, got_i = sidx.search_lw(q, k=idx.cfg.search.k,
                                  depth=idx.cfg.search.rerank_depth)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_s), want_s,
                               rtol=2e-5, atol=2e-6)


def test_sharded_lw_requires_view(rng):
    idx, q = _make_index(rng)
    idx._drop_lw("test")
    sidx = idx.to_sharded(mesh=make_mesh(2))
    assert sidx.lw_store is None
    with pytest.raises(AssertionError, match="no local-whitening view"):
        sidx.search_lw(q)


def test_sharded_lw_partial_args_rejected(rng):
    idx, _ = _make_index(rng)
    from instsearch_tpu.parallel import ShardedIndex
    with pytest.raises(ValueError, match="together"):
        ShardedIndex(idx.descriptors, idx.ids, mesh=make_mesh(2),
                     lw_store=idx.lw.store)
