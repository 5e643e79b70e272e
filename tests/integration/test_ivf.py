"""IVF ANN tier (search/ivf.py): exactness at full probe, recall on
clustered corpora, int8 storage, spill overflow, persistence."""
import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index
from instsearch_tpu.search.ivf import IVFIndex


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _clustered(rng, n_per, centers, d, noise=0.08):
    anchors = _unit(rng, centers, d)
    x = np.repeat(anchors, n_per, axis=0)
    x = x + noise * rng.standard_normal(x.shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _index(x, dtype="float32", capacity=0):
    cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype=dtype, row_tile=8, capacity=capacity),
        search=SearchConfig(k=10, use_pallas=False))
    return Index.from_descriptors(x, [f"im{i}" for i in range(len(x))], cfg)


def test_full_probe_equals_bruteforce(rng):
    x = _unit(rng, 400, 32)
    q = _unit(rng, 9, 32)
    idx = _index(x)
    ivf = IVFIndex.from_index(idx, n_clusters=8, iters=5)
    s, ids = ivf.search(idx, q, k=10, nprobe=8)
    want = np.argsort(-(q @ x.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ids, want)
    np.testing.assert_allclose(
        s, np.sort(q @ x.T, axis=1)[:, ::-1][:, :10], rtol=1e-3, atol=1e-3)


def test_full_probe_exact_with_spill(rng):
    # cap_factor so small that most rows overflow into the spill block —
    # full-probe search must STILL be exact (spill is always scanned)
    x = _clustered(rng, n_per=50, centers=4, d=24)
    q = _unit(rng, 5, 24)
    idx = _index(x)
    ivf = IVFIndex.from_index(idx, n_clusters=4, iters=5, cap_factor=0.2)
    assert ivf.spill.shape[0] > 0
    s, ids = ivf.search(idx, q, k=10, nprobe=4)
    want = np.argsort(-(q @ x.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ids, want)


def test_recall_on_clustered_corpus(rng):
    x = _clustered(rng, n_per=64, centers=16, d=32)
    idx = _index(x)
    ivf = IVFIndex.from_index(idx, n_clusters=16, iters=8)
    # queries near corpus rows: the realistic retrieval regime
    q = x[rng.choice(len(x), 20, replace=False)]
    q = q + 0.03 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    r4 = ivf.measure_recall(idx, q, k=10, nprobe=4)
    r16 = ivf.measure_recall(idx, q, k=10, nprobe=16)
    assert r16 == pytest.approx(1.0)
    assert r4 > 0.85
    assert ivf.scan_fraction(4) < 0.5


def test_measure_recall_exact_reference_ignores_attached_view(rng):
    """Regression (r4): Index.build_ivf routes index.search through the
    IVF view (cfg.search.ivf_nprobe), and measure_recall's "exact"
    reference used to inherit that — comparing the ANN result to ITSELF
    and reporting a vacuous 1.0 at any nprobe. With the reset, recall at
    nprobe=1 on a corpus whose true top-k straddles clusters must drop
    below 1, and must agree with the unattached-view measurement."""
    x = _clustered(rng, n_per=64, centers=16, d=32, noise=0.5)
    idx = _index(x)
    ivf_attached = idx.build_ivf(n_clusters=16, nprobe=1, iters=8)
    # out-of-sample mixture queries (perturbed rows are same-cluster by
    # construction and can hide the bug at small noise)
    q = _unit(rng, 20, 32)
    r1 = ivf_attached.measure_recall(idx, q, k=10, nprobe=1)
    r_full = ivf_attached.measure_recall(idx, q, k=10, nprobe=16)
    assert r_full == pytest.approx(1.0)
    assert r1 < 0.9, "nprobe=1 recall should be visibly lossy here"

    # same measurement through an UNATTACHED view of identical build
    idx2 = _index(x)
    ivf_free = IVFIndex.from_index(idx2, n_clusters=16, iters=8)
    assert ivf_free.measure_recall(idx2, q, k=10, nprobe=1) == \
        pytest.approx(r1)


def test_int8_storage(rng):
    x = _clustered(rng, n_per=40, centers=8, d=32)
    idx = _index(x, dtype="int8")
    ivf = IVFIndex.from_index(idx, n_clusters=8, iters=5)
    assert ivf.buckets.dtype == np.int8
    assert ivf.bucket_scales is not None
    q = x[:6]
    r = ivf.measure_recall(idx, q, k=5, nprobe=8)
    # full probe over int8 buckets vs int8 brute force: same stored rows,
    # same scales -> identical ranking up to bf16-vs-int8 scoring ties
    assert r > 0.95


def test_positions_map_to_dataset_ids(rng):
    # quarantine-style id space: dataset ids differ from row positions
    x = _unit(rng, 64, 16)
    original_ids = np.arange(3, 67, dtype=np.int32)   # shifted ids
    cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype="float32", row_tile=8),
        search=SearchConfig(k=5, use_pallas=False))
    idx = Index.from_descriptors(x, [f"im{i}" for i in range(64)], cfg,
                                 original_ids=original_ids)
    ivf = IVFIndex.from_index(idx, n_clusters=4, iters=4)
    _, ids = ivf.search(idx, x[:3], k=1, nprobe=4)
    np.testing.assert_array_equal(ids[:, 0], original_ids[:3])


def test_save_load_roundtrip(tmp_path, rng):
    x = _clustered(rng, n_per=32, centers=4, d=16)
    idx = _index(x)
    ivf = IVFIndex.from_index(idx, n_clusters=4, iters=4, nprobe=2)
    q = _unit(rng, 4, 16)
    s1, i1 = ivf.search(idx, q, k=5)
    ivf.save(str(tmp_path / "ivf"))
    back = IVFIndex.load(str(tmp_path / "ivf"))
    assert back.nprobe == 2
    s2, i2 = back.search(idx, q, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_index_routing_and_full_probe_composite(rng):
    """build_ivf routes Index.search; at nprobe == n_clusters the IVF
    composite (QE included) must equal the exact composite exactly —
    full probe selects the same candidates."""
    x = _clustered(rng, n_per=48, centers=8, d=32)
    q = _unit(rng, 6, 32)
    idx = _index(x)
    scfg_exact = idx.cfg.search.replace(qe_enabled=True, qe_n=5,
                                        ivf_nprobe=0)
    s_exact, i_exact = idx.search(q, scfg_exact)
    idx.build_ivf(n_clusters=8, nprobe=8, iters=5)
    assert idx.cfg.search.ivf_nprobe == 8      # build_ivf arms routing
    s_ivf, i_ivf = idx.search(q, scfg_exact.replace(ivf_nprobe=8))
    np.testing.assert_array_equal(i_ivf, i_exact)
    np.testing.assert_allclose(s_ivf, s_exact, rtol=1e-5)
    # partial probe still returns well-formed results
    s_p, i_p = idx.search(q, scfg_exact.replace(ivf_nprobe=2))
    assert i_p.shape == i_exact.shape and (i_p >= -1).all()
    # ivf_nprobe=0 forces the exact path even with a view attached
    s0, i0 = idx.search(q, scfg_exact.replace(ivf_nprobe=0))
    np.testing.assert_array_equal(i0, i_exact)


def test_index_rerank_through_ivf(rng):
    """Regional re-ranking with IVF candidate selection: full probe must
    match the exact rerank composite."""
    from instsearch_tpu.index import attach_regional_store

    x = _clustered(rng, n_per=32, centers=4, d=16)
    q = _unit(rng, 3, 16)
    qreg = rng.standard_normal((3, 4, 16)).astype(np.float32)
    qreg /= np.linalg.norm(qreg, axis=-1, keepdims=True)
    regional = rng.standard_normal((len(x), 4, 16)).astype(np.float32)
    regional /= np.linalg.norm(regional, axis=-1, keepdims=True)

    cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype="float32", row_tile=8),
        search=SearchConfig(k=5, use_pallas=False, rerank_enabled=True,
                            rerank_depth=20))
    idx = Index.from_descriptors(x, [f"im{i}" for i in range(len(x))], cfg)
    attach_regional_store(idx, regional)
    s_exact, i_exact = idx.search(q, query_regional=qreg)
    idx.build_ivf(n_clusters=4, nprobe=4, iters=4)
    s_ivf, i_ivf = idx.search(q, query_regional=qreg)
    np.testing.assert_array_equal(i_ivf, i_exact)
    np.testing.assert_allclose(s_ivf, s_exact, rtol=1e-5)


def test_mutation_invalidates_ivf(rng):
    x = _unit(rng, 64, 16)
    idx = _index(x, capacity=128)
    idx.build_ivf(n_clusters=4, iters=3)
    assert idx.ivf is not None
    y = _unit(rng, 4, 16)
    idx.add(descriptors=y, names=[f"new{i}" for i in range(4)])
    # add() ABSORBS into the always-scanned spill block (the view
    # survives and sees the new rows; test_view_absorb_add.py pins the
    # exactness contract) ...
    assert idx.ivf is not None
    _, ids = idx.ivf.search(idx, y[:2], k=3, nprobe=4)
    assert (ids[:, 0] == np.array([64, 65])).all()
    # ... and remove() is ABSORBED too (positions remap/tombstone;
    # test_view_absorb_remove.py pins exactness)
    idx.remove(["new0"])
    assert idx.ivf is not None
    _, ids = idx.ivf.search(idx, y[1:2], k=3, nprobe=4)
    assert ids[0, 0] == 65


def test_index_save_load_with_ivf(tmp_path, rng):
    x = _clustered(rng, n_per=32, centers=4, d=16)
    idx = _index(x)
    idx.build_ivf(n_clusters=4, nprobe=2, iters=4)
    q = _unit(rng, 4, 16)
    s1, i1 = idx.search(q)
    idx.save(str(tmp_path / "idx"))
    back = Index.load(str(tmp_path / "idx"))
    assert back.ivf is not None
    assert back.cfg.search.ivf_nprobe == 2      # config round-trips
    s2, i2 = back.search(q)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_single_query_vector(rng):
    x = _unit(rng, 48, 16)
    idx = _index(x)
    ivf = IVFIndex.from_index(idx, n_clusters=4, iters=3)
    s, ids = ivf.search(idx, x[7], k=1, nprobe=4)   # 1-D query
    assert ids.shape == (1, 1) and ids[0, 0] == 7


def test_cli_ivf_flow(tmp_path):
    """build-index --ivf -> query --nprobe -> update-index rebuilds the
    IVF view over the mutated rows."""
    import glob as _glob

    from instsearch_tpu.cli import main
    from instsearch_tpu.eval import make_mini_dataset

    mini = make_mini_dataset(str(tmp_path / "mini"), seed=5)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem",
                              image_size=64, batch_size=8, dtype="float32"),
        search=SearchConfig(k=3, use_pallas=False))
    cfg_path = str(tmp_path / "cfg.json")
    cfg.save(cfg_path)
    idx_dir = str(tmp_path / "idx")
    img_dir = str(tmp_path / "mini" / "jpg")

    rc = main(["build-index", "--images", img_dir, "--out", idx_dir,
               "--config", cfg_path, "--ivf", "--ivf-clusters", "4",
               "--nprobe", "2"])
    assert rc == 0
    idx = Index.load(idx_dir)
    assert idx.ivf is not None and idx.ivf.n_clusters == 4
    assert idx.cfg.search.ivf_nprobe == 2

    # query through the CLI: IVF routing on (default) and off (--nprobe 0)
    some_img = sorted(_glob.glob(img_dir + "/*.jpg"))[0]
    rc = main(["query", "--index", idx_dir, "--image", some_img, "-k", "3"])
    assert rc == 0
    rc = main(["query", "--index", idx_dir, "--image", some_img,
               "--nprobe", "0"])
    assert rc == 0

    # update-index: mutation must leave a REBUILT view, not a stale/absent one
    first_name = idx.names[0]
    rc = main(["update-index", "--index", idx_dir, "--remove", first_name])
    assert rc == 0
    back = Index.load(idx_dir)
    assert back.ivf is not None
    assert first_name not in back.names
    # rebuilt view searches the surviving rows exactly at full probe
    q = np.asarray(back.descriptors[:2].astype(np.float32))
    if back.scales is not None:
        q = q * np.asarray(back.scales)[0][:2, None]
    _, ids = back.ivf.search(back, q, k=1, nprobe=back.ivf.n_clusters)
    np.testing.assert_array_equal(ids[:, 0], np.asarray(back.ids)[:2])
