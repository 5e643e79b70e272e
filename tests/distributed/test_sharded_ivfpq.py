"""Distributed IVF-PQ cascade (parallel/sharded_index.py::
sharded_ivfpq_fn / ShardedIndex.search_ivfpq) vs the single-device
composite (search/ivfpq.py).

Capacity-axis sharding: every chip holds M/S slots of EVERY bucket (plus
a spill slice), the probe selection replicates, the exact re-score rides
a one-owner psum over the row-sharded main store. Asserted: sharded ==
single-device Index.search(ivfpq_nprobe) for f32/int8/int4 storage on
1/2/4/8-shard meshes (capacity NOT divisible by the shard count — the
attach-time padding path), the αQE composite, full probe+depth == brute
force through the mesh, and the to_sharded / query_images routing."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.config import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index
from instsearch_tpu.parallel import make_mesh


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _make_index(rng, dtype="float32", n=192, d=32, k=8, depth=48,
                n_clusters=6, nprobe=3, qe=False):
    centers = np.eye(6, d, dtype=np.float32) * 5
    X = _unit(np.concatenate([
        centers[i] + rng.standard_normal((n // 6, d)).astype(np.float32)
        for i in range(6)]))
    cfg = PipelineConfig(
        index=IndexConfig(dtype=dtype, row_tile=8),
        search=SearchConfig(k=k, use_pallas=False, qe_enabled=qe,
                            qe_n=5, qe_alpha=2.0))
    idx = Index.from_descriptors(X, [f"i{i}" for i in range(n)], cfg)
    idx.build_ivfpq(n_clusters=n_clusters, nprobe=nprobe, m=8,
                    depth=depth, sample=None)
    q = jnp.asarray(_unit(X[:7] + 0.1 * rng.standard_normal(
        (7, d)).astype(np.float32)))
    return idx, q


@pytest.mark.parametrize("dtype", ["float32", "int8", "int4"])
@pytest.mark.parametrize("shards", [1, 2, 4, 8])
def test_sharded_ivfpq_matches_single_device(rng, dtype, shards):
    idx, q = _make_index(rng, dtype=dtype)
    want_s, want_i = idx.search(q)

    sidx = idx.to_sharded(mesh=make_mesh(shards))
    assert sidx.ivfpq is not None  # to_sharded carries the view
    got_s, got_i = sidx.search_ivfpq(q, k=idx.cfg.search.k)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_s), want_s,
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("shards", [2, 8])
def test_sharded_ivfpq_qe_matches_single_device(rng, shards):
    idx, q = _make_index(rng, qe=True)
    scfg = idx.cfg.search
    want_s, want_i = idx.search(q, scfg)

    sidx = idx.to_sharded(mesh=make_mesh(shards))
    got_s, got_i = sidx.search_ivfpq(q, k=scfg.k, qe_n=scfg.qe_n,
                                     qe_alpha=scfg.qe_alpha)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_s), want_s,
                               rtol=2e-5, atol=2e-6)


def test_sharded_ivfpq_full_probe_is_brute_force(rng):
    idx, q = _make_index(rng)
    exact_s, exact_i = idx.search(
        q, idx.cfg.search.replace(ivfpq_nprobe=0))
    sidx = idx.to_sharded(mesh=make_mesh(4))
    got_s, got_i = sidx.search_ivfpq(
        q, k=idx.cfg.search.k, nprobe=idx.ivfpq.n_clusters,
        depth=idx.num_valid)
    np.testing.assert_array_equal(np.asarray(got_i), exact_i)
    np.testing.assert_allclose(np.asarray(got_s), exact_s,
                               rtol=2e-5, atol=2e-6)


def test_sharded_ivfpq_capacity_padding(rng):
    # bucket capacity 192/6*cap_factor is not divisible by 8 when the
    # cluster sizes are uneven — force an odd capacity via n=184
    idx, q = _make_index(rng, n=186, n_clusters=5)
    want_s, want_i = idx.search(q)
    cap = idx.ivfpq.bucket_capacity
    sidx = idx.to_sharded(mesh=make_mesh(8))
    padded = sidx.ivfpq.codes.shape[1]
    assert padded % 8 == 0 and padded >= cap
    got_s, got_i = sidx.search_ivfpq(q, k=idx.cfg.search.k)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_s), want_s,
                               rtol=2e-5, atol=2e-6)


def test_sharded_ivfpq_requires_view(rng):
    idx, q = _make_index(rng)
    idx._drop_pq("test")          # drops the ivfpq view too
    assert idx.ivfpq is None
    sidx = idx.to_sharded(mesh=make_mesh(2))
    assert sidx.ivfpq is None
    with pytest.raises(AssertionError, match="no IVF-PQ view"):
        sidx.search_ivfpq(q)


def test_query_images_sharded_routes_ivfpq(rng, tmp_path):
    """Serving parity: query_images(sharded_index=...) with an armed
    ivfpq_nprobe must produce the single-device composite ranking (the
    silent-fallthrough defect class from VERDICT r3) — plain and αQE."""
    import glob
    import os

    import cv2

    from instsearch_tpu.config import ExtractConfig
    from instsearch_tpu.eval import make_mini_dataset

    make_mini_dataset(str(tmp_path / "mini"), seed=0)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem",
                              image_size=64, batch_size=8,
                              dtype="float32"),
        index=IndexConfig(dtype="float32", row_tile=8),
        search=SearchConfig(k=5, use_pallas=False))
    paths = sorted(glob.glob(
        os.path.join(str(tmp_path / "mini"), "jpg", "*.jpg")))
    idx = Index.build(paths, cfg)
    idx.build_ivfpq(n_clusters=4, nprobe=2, m=8, depth=16, sample=None)

    img = cv2.imread(paths[0])[:, :, ::-1][None]
    sidx = idx.to_sharded(mesh=make_mesh(4))
    for scfg in (idx.cfg.search,
                 idx.cfg.search.replace(qe_enabled=True, qe_n=4,
                                        qe_alpha=2.0)):
        want_s, want_i = idx.query_images(img, search_cfg=scfg)
        got_s, got_i = idx.query_images(img, search_cfg=scfg,
                                        sharded_index=sidx)
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_allclose(got_s, want_s, rtol=2e-5, atol=2e-6)


def test_sharded_ivfpq_opq_matches_single_device(rng):
    # OPQ rotation rides as a replicated operand; the sharded cascade
    # must stay exactly equal to the single-device composite with it
    idx, q = _make_index(rng)
    idx.ivfpq = None
    idx.build_ivfpq(n_clusters=6, nprobe=3, m=8, depth=48, sample=None,
                    opq_iters=3, pq_iters=6)
    assert idx.ivfpq.rotation is not None
    want_s, want_i = idx.search(q)
    sidx = idx.to_sharded(mesh=make_mesh(8))
    got_s, got_i = sidx.search_ivfpq(q, k=idx.cfg.search.k)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_s), want_s,
                               rtol=2e-5, atol=2e-6)
