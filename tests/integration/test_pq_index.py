"""PQ cascade view (search/pq_view.py): exactness at full depth,
candidate recall on clustered corpora, composite routing (QE / regional
re-rank), mutation invalidation, persistence, CLI flow."""
import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index
from instsearch_tpu.search.pq_view import PQView


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _clustered(rng, n_per, centers, d, noise=0.05):
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


def test_full_depth_equals_bruteforce(rng):
    # depth >= N: the ADC scan admits every row, the exact re-score
    # restores the brute-force ranking — the cascade's exactness anchor
    x = _unit(rng, 256, 32)
    q = _unit(rng, 7, 32)
    idx = _index(x)
    pq = PQView.from_index(idx, m=4, iters=6, depth=256)
    s, ids = pq.search(idx, q, k=10, depth=256)
    want = np.argsort(-(q @ x.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ids, want)
    np.testing.assert_allclose(
        s, np.sort(q @ x.T, axis=1)[:, ::-1][:, :10], rtol=1e-3, atol=1e-3)


def test_candidate_recall_on_clustered_corpus(rng):
    x = _clustered(rng, n_per=64, centers=16, d=64)
    idx = _index(x)
    pq = PQView.from_index(idx, m=8, iters=10, depth=100)
    q = x[rng.choice(len(x), 16, replace=False)]
    q = q + 0.02 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    r100 = pq.measure_recall(idx, q, k=10, depth=100)
    assert r100 > 0.85, f"recall@10 through depth-100 cascade = {r100}"
    # full depth is exact by construction
    assert pq.measure_recall(idx, q, k=10, depth=len(x)) == pytest.approx(1.0)


def test_int8_storage(rng):
    # PQ codes fit/encode from DEQUANTIZED rows of an int8 store; the
    # exact re-score tier scores the same int8 rows as plain search
    x = _clustered(rng, n_per=40, centers=8, d=32)
    idx = _index(x, dtype="int8")
    pq = PQView.from_index(idx, m=4, iters=6, depth=len(x))
    q = x[:6]
    s_pq, i_pq = pq.search(idx, q, k=5, depth=len(x))
    s_ex, i_ex = idx.search(q, idx.cfg.search.replace(k=5))
    np.testing.assert_array_equal(i_pq, i_ex)
    np.testing.assert_allclose(s_pq, s_ex, rtol=1e-4, atol=1e-5)


def test_positions_map_to_dataset_ids(rng):
    x = _unit(rng, 64, 16)
    original_ids = np.arange(5, 69, dtype=np.int32)
    cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype="float32", row_tile=8),
        search=SearchConfig(k=5, use_pallas=False))
    idx = Index.from_descriptors(x, [f"im{i}" for i in range(64)], cfg,
                                 original_ids=original_ids)
    pq = PQView.from_index(idx, m=2, iters=4, depth=64)
    _, ids = pq.search(idx, x[:3], k=1, depth=64)
    np.testing.assert_array_equal(ids[:, 0], original_ids[:3])


def test_index_routing_and_full_depth_composite(rng):
    """build_pq routes Index.search; at depth >= N the PQ composite (QE
    included) must equal the exact composite exactly."""
    x = _clustered(rng, n_per=48, centers=8, d=32)
    q = _unit(rng, 6, 32)
    idx = _index(x)
    scfg_exact = idx.cfg.search.replace(qe_enabled=True, qe_n=5, pq_depth=0)
    s_exact, i_exact = idx.search(q, scfg_exact)
    idx.build_pq(m=4, iters=6, depth=len(x))
    assert idx.cfg.search.pq_depth == len(x)    # build_pq arms routing
    s_pq, i_pq = idx.search(q, scfg_exact.replace(pq_depth=len(x)))
    np.testing.assert_array_equal(i_pq, i_exact)
    np.testing.assert_allclose(s_pq, s_exact, rtol=1e-4, atol=1e-5)
    # partial depth still returns well-formed results
    s_p, i_p = idx.search(q, scfg_exact.replace(pq_depth=20))
    assert i_p.shape == i_exact.shape and (i_p >= -1).all()
    # pq_depth=0 forces the exact path even with a view attached
    s0, i0 = idx.search(q, scfg_exact.replace(pq_depth=0))
    np.testing.assert_array_equal(i0, i_exact)


def test_index_rerank_through_pq(rng):
    """Regional re-ranking with PQ candidate selection: full depth must
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
    idx.build_pq(m=2, iters=5, depth=len(x))
    s_pq, i_pq = idx.search(q, query_regional=qreg)
    np.testing.assert_array_equal(i_pq, i_exact)
    np.testing.assert_allclose(s_pq, s_exact, rtol=1e-4, atol=1e-5)


def test_pq_and_ivf_both_armed_rejected(rng):
    x = _unit(rng, 64, 16)
    idx = _index(x)
    idx.build_ivf(n_clusters=4, nprobe=4, iters=3)
    idx.build_pq(m=2, iters=3, depth=32)
    with pytest.raises(ValueError, match="one candidate-selection tier"):
        idx.search(x[:2], idx.cfg.search.replace(ivf_nprobe=4, pq_depth=32))
    # disabling either tier resolves the ambiguity
    s, i = idx.search(x[:2], idx.cfg.search.replace(ivf_nprobe=0,
                                                    pq_depth=32))
    assert i.shape == (2, 10)


def test_mutation_invalidates_pq(rng):
    x = _unit(rng, 64, 16)
    idx = _index(x, capacity=128)
    idx.build_pq(m=2, iters=3, depth=32)
    assert idx.pq is not None
    y = _unit(rng, 4, 16)
    idx.add(descriptors=y, names=[f"new{i}" for i in range(4)])
    # add() ABSORBS: frozen-codebook codes written at the new positions
    # (test_view_absorb_add.py pins the contract) ...
    assert idx.pq is not None
    _, ids = idx.pq.search(idx, y[:2], k=3)
    assert (ids[:, 0] == np.array([64, 65])).all()
    # ... and remove() is ABSORBED too (codes replay the compaction
    # moves; test_view_absorb_remove.py pins exactness)
    idx.remove(["new0"])
    assert idx.pq is not None
    _, ids = idx.pq.search(idx, y[1:2], k=3)
    assert ids[0, 0] == 65


def test_index_save_load_with_pq(tmp_path, rng):
    x = _clustered(rng, n_per=32, centers=4, d=16)
    idx = _index(x)
    idx.build_pq(m=2, iters=4, depth=len(x))
    q = _unit(rng, 4, 16)
    s1, i1 = idx.search(q)
    idx.save(str(tmp_path / "idx"))
    back = Index.load(str(tmp_path / "idx"))
    assert back.pq is not None
    assert back.cfg.search.pq_depth == len(x)   # config round-trips
    s2, i2 = back.search(q)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_cli_pq_flow(tmp_path):
    """build-index --pq -> query --pq-depth -> update-index rebuilds the
    PQ view over the mutated rows."""
    import glob as _glob

    from instsearch_tpu.cli import main
    from instsearch_tpu.eval import make_mini_dataset

    mini = make_mini_dataset(str(tmp_path / "mini"), seed=7)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem",
                              image_size=64, batch_size=8, dtype="float32"),
        search=SearchConfig(k=3, use_pallas=False))
    cfg_path = str(tmp_path / "cfg.json")
    cfg.save(cfg_path)
    idx_dir = str(tmp_path / "idx")
    img_dir = str(tmp_path / "mini" / "jpg")

    rc = main(["build-index", "--images", img_dir, "--out", idx_dir,
               "--config", cfg_path, "--pq", "--pq-m", "4",
               "--pq-depth", "8"])
    assert rc == 0
    idx = Index.load(idx_dir)
    assert idx.pq is not None and idx.pq.m == 4
    assert idx.cfg.search.pq_depth == 8

    some_img = sorted(_glob.glob(img_dir + "/*.jpg"))[0]
    rc = main(["query", "--index", idx_dir, "--image", some_img, "-k", "3"])
    assert rc == 0
    rc = main(["query", "--index", idx_dir, "--image", some_img,
               "--pq-depth", "0"])
    assert rc == 0

    # --ivf and --pq together are rejected up front
    rc = main(["build-index", "--images", img_dir,
               "--out", str(tmp_path / "idx2"), "--config", cfg_path,
               "--pq", "--ivf"])
    assert rc == 2

    # update-index: mutation must leave a REBUILT view
    first_name = idx.names[0]
    rc = main(["update-index", "--index", idx_dir, "--remove", first_name])
    assert rc == 0
    back = Index.load(idx_dir)
    assert back.pq is not None and back.pq.m == 4
    assert first_name not in back.names


def _anisotropic(rng, n, d, decay=0.9):
    z = rng.standard_normal((n, d)).astype(np.float32)
    spec = (decay ** np.arange(d)).astype(np.float32)
    basis, _ = np.linalg.qr(rng.standard_normal((d, d)))
    x = (z * spec) @ basis.astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_opq_full_depth_equals_bruteforce(rng):
    # the cascade's exactness anchor must hold with a rotation attached:
    # ADC admits every row at full depth and the exact re-score (which
    # never sees the rotation) restores the brute-force ranking
    x = _anisotropic(rng, 256, 32)
    q = _unit(rng, 7, 32)
    idx = _index(x)
    pq = PQView.from_index(idx, m=4, iters=6, depth=256, opq_iters=3)
    assert pq.rotation is not None
    s, ids = pq.search(idx, q, k=10, depth=256)
    want = np.argsort(-(q @ x.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ids, want)


def test_opq_recall_beats_plain_on_anisotropic_corpus(rng):
    # the reason OPQ exists: on spectrum-decayed data seen through a
    # random basis (real descriptor spaces after PCA-whitening look like
    # this), the learned rotation recovers candidate recall plain PQ
    # loses to cross-subspace correlation (measured: 0.87 -> 0.94)
    x = _anisotropic(rng, 4096, 64)
    idx = _index(x)
    q = x[rng.choice(len(x), 16, replace=False)]
    q = q + 0.02 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    plain = PQView.from_index(idx, m=8, iters=10, depth=100)
    opq = PQView.from_index(idx, m=8, iters=10, depth=100, opq_iters=5)
    r_plain = plain.measure_recall(idx, q, k=10, depth=100)
    r_opq = opq.measure_recall(idx, q, k=10, depth=100)
    assert r_opq >= r_plain, (r_opq, r_plain)
    assert r_opq > 0.85, r_opq


def test_opq_save_load_roundtrip(tmp_path, rng):
    x = _anisotropic(rng, 128, 16)
    idx = _index(x)
    idx.build_pq(m=2, iters=4, depth=64, opq_iters=2)
    assert idx.pq.rotation is not None
    q = _unit(rng, 4, 16)
    s1, i1 = idx.search(q)
    idx.save(str(tmp_path / "idx"))
    back = Index.load(str(tmp_path / "idx"))
    assert back.pq is not None and back.pq.rotation is not None
    np.testing.assert_allclose(np.asarray(back.pq.rotation),
                               np.asarray(idx.pq.rotation), rtol=1e-6)
    s2, i2 = back.search(q)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)
