"""Sharded subset-filtered search must equal the single-device filtered
path exactly, across every distributed stage (search/subset.py on the
mesh: the mask shards row-aligned like the int8 scales; IVF-PQ
replicates it — positions in capacity-axis bucket slots are global)."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index, attach_regional_store


def _unit(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _build(rng, n=320, d=32, dtype="float32", **search_kw):
    X = _unit(rng, (n, d))
    cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype=dtype, row_tile=8),
        search=SearchConfig(k=9, use_pallas=False, **search_kw))
    idx = Index.from_descriptors(X, [f"im{i}" for i in range(n)], cfg)
    return idx, X, [f"im{i}" for i in range(0, n, 4)]


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_sharded_masked_search_equals_single(rng, dtype):
    idx, X, members = _build(rng, dtype=dtype)
    sub = idx.make_subset(names=members)
    Q = _unit(rng, (4, 32))
    want_s, want_i = idx.search(Q, subset=sub)
    sidx = idx.to_sharded()
    got_s, got_i = sidx.search(Q, k=9, mask=sidx.place_subset(sub))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-4, atol=1e-5)


def test_sharded_masked_qe_equals_single(rng):
    idx, X, members = _build(rng)
    sub = idx.make_subset(names=members)
    Q = _unit(rng, (3, 32))
    _, want = idx.search(Q, idx.cfg.search.replace(qe_enabled=True, qe_n=5),
                         subset=sub)
    sidx = idx.to_sharded()
    _, got = sidx.search_qe(Q, k=9, qe_n=5, alpha=3.0,
                            mask=sidx.place_subset(sub))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_masked_rerank_equals_single(rng):
    idx, X, members = _build(rng, rerank_enabled=True, rerank_depth=32)
    attach_regional_store(idx, _unit(rng, (idx.num_valid, 4, 32)))
    sub = idx.make_subset(names=members)
    Q, qreg = _unit(rng, (3, 32)), _unit(rng, (3, 4, 32))
    _, want = idx.search(Q, query_regional=qreg, subset=sub)
    sidx = idx.to_sharded()
    _, got = sidx.search_rerank(Q, qreg, k=9, depth=32,
                                mask=sidx.place_subset(sub))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_masked_diffusion_equals_single(rng):
    idx, X, members = _build(rng, diffusion_enabled=True,
                             diffusion_depth=32, diffusion_knn=4)
    sub = idx.make_subset(names=members)
    Q = _unit(rng, (3, 32))
    _, want = idx.search(Q, subset=sub)
    sidx = idx.to_sharded()
    _, got = sidx.search_diffusion(Q, k=9, depth=32, knn=4,
                                   mask=sidx.place_subset(sub))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_masked_lw_equals_single(rng):
    idx, X, members = _build(rng, lw_enabled=True, rerank_depth=32)
    idx.fit_local_whitening(n_clusters=4, tau=8.0, seed=0)
    sub = idx.make_subset(names=members)
    Q = _unit(rng, (3, 32))
    _, want = idx.search(Q, subset=sub)
    sidx = idx.to_sharded()
    _, got = sidx.search_lw(Q, k=9, depth=32, mask=sidx.place_subset(sub))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_masked_ivfpq_equals_single(rng):
    idx, X, members = _build(rng)
    idx.build_ivfpq(n_clusters=8, nprobe=8, m=8, depth=64)
    sub = idx.make_subset(names=members)
    Q = _unit(rng, (3, 32))
    _, want = idx.search(Q, subset=sub)
    sidx = idx.to_sharded()
    _, got = sidx.search_ivfpq(Q, k=9, mask=sidx.place_subset(sub))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_query_images_threads_subset_through_mesh(rng, tmp_path):
    """End-to-end: Index.query_images(subset=..., sharded_index=...)
    equals the single-device filtered result (extraction + routing)."""
    from instsearch_tpu.data import frontend
    from instsearch_tpu.eval.datasets import make_mini_dataset

    ds = make_mini_dataset(str(tmp_path / "mini"), n_instances=4,
                           n_views=2, n_distractors=4, size=32, seed=0)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="mac",
                              image_size=32, batch_size=4,
                              dtype="float32"),
        index=IndexConfig(dtype="float32", row_tile=8),
        search=SearchConfig(k=5, use_pallas=False))
    idx = Index.build(ds.db_paths, cfg, seed=0)
    sub = idx.make_subset(names=list(idx.names[::2]))
    img = frontend.load_square(ds.query_paths[0], 32)[None]
    want_s, want_i = idx.query_images(img, subset=sub)
    sidx = idx.to_sharded()
    got_s, got_i = idx.query_images(img, sharded_index=sidx, subset=sub)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-4, atol=1e-5)


def test_place_subset_rejects_wrong_store(rng):
    idx, X, members = _build(rng, n=320)
    other, _, _ = _build(rng, n=160)
    sidx = idx.to_sharded()
    with pytest.raises(ValueError, match="different store"):
        sidx.place_subset(other.make_subset(names=["im0"]))
