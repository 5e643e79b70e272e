"""Euclidean metric (IndexConfig.metric="l2", FAISS IndexFlatL2 analog):
rows stored with a ||x||^2/2 augmentation column, queries gain a -1
column, so the UNCHANGED IP kernels rank by -L2 exactly; returned
scores are -||x - q||^2. Exact tiers only — the cosine-space quality
stack rejects l2 indexes."""
import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index


def _build(X, dtype="float32", capacity=0, k=5):
    cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype=dtype, row_tile=8, metric="l2",
                          capacity=capacity),
        search=SearchConfig(k=k, use_pallas=False, query_chunk=32))
    return Index.from_descriptors(X, [f"im{i}" for i in range(len(X))], cfg)


def _rand(rng, n, d, scale=3.0):
    # NOT unit-normalized — the case where ip and l2 rankings differ
    return (scale * rng.standard_normal((n, d))).astype(np.float32)


def _l2sq(Q, X):
    return ((Q[:, None, :] - X[None, :, :]) ** 2).sum(-1)   # [Q, N]


def test_search_matches_l2_oracle(rng):
    X = _rand(rng, 200, 24)
    idx = _build(X)
    Q = _rand(rng, 6, 24)
    s, i = idx.search(Q)
    d2 = _l2sq(Q, X)
    ids_np = np.asarray(idx.ids)[:200]
    want = ids_np[np.argsort(d2, axis=1, kind="stable")[:, :5]]
    np.testing.assert_array_equal(i, want)
    np.testing.assert_allclose(
        s, -np.sort(d2, axis=1)[:, :5], rtol=1e-4, atol=1e-3)
    # sanity: the IP ranking over this data would differ (the trick is
    # doing real work, not riding unit norms)
    ip_want = ids_np[np.argsort(-(Q @ X.T), axis=1)[:, :5]]
    assert (want != ip_want).any()


def test_search_int8_close(rng):
    """int8 + l2 is REDUCED precision by design: the ||x||^2/2 column
    dominates the per-row scale, so absolute score error is ~the
    component quantization band — ranking with clear margins survives,
    near-ties may not (documented in IndexConfig.metric)."""
    X = _rand(rng, 128, 32)
    idx = _build(X, dtype="int8")
    Q = X[:4] + 0.05 * rng.standard_normal((4, 32)).astype(np.float32)
    s, i = idx.search(Q)
    d2 = _l2sq(Q, X)
    ids_np = np.asarray(idx.ids)[:128]
    # top-1 (distance ~0, margin ~hundreds) must survive quantization
    assert (i[:, 0] == ids_np[np.argmin(d2, axis=1)]).all()
    # scores stay -L2^2-shaped: best-first and within the quantization
    # band of the truth (row scale ~ aug/127 -> dot error O(10) here)
    np.testing.assert_allclose(-s[:, 0], d2.min(axis=1), atol=40.0)
    assert (np.diff(s, axis=1) <= 1e-3).all()


def test_search_range_radius_semantics(rng):
    X = _rand(rng, 150, 16, scale=1.0)
    idx = _build(X)
    Q = _rand(rng, 3, 16, scale=1.0)
    r = 4.5
    s, i, counts = idx.search_range(Q, r, max_results=128)
    d2 = _l2sq(Q, X)
    ids_np = np.asarray(idx.ids)[:150]
    for row in range(3):
        want = np.flatnonzero(d2[row] <= r * r)
        assert counts[row] == len(want)
        got = i[row][i[row] >= 0]
        assert set(got) == set(ids_np[want])
        # scores are -L2^2, all within the radius, best-first
        valid = s[row][s[row] > -np.inf]
        assert (valid >= -(r * r) - 1e-3).all()
        assert (np.diff(valid) <= 1e-6).all()


def test_knn_graph_and_duplicates_l2(rng):
    X = _rand(rng, 90, 16)
    X[11] = X[10] + 0.01          # near-duplicate at distance ~0.04
    idx = _build(X)
    s, i = idx.knn_graph(k=3)
    d2 = _l2sq(X, X)
    np.fill_diagonal(d2, np.inf)
    ids_np = np.asarray(idx.ids)[:90]
    want = ids_np[np.argsort(d2, axis=1, kind="stable")[:, :3]]
    np.testing.assert_array_equal(i, want)
    np.testing.assert_allclose(s, -np.sort(d2, axis=1)[:, :3],
                               rtol=1e-4, atol=1e-3)
    # duplicates: tau is a RADIUS
    pairs, sc = idx.find_duplicates(tau=0.1)
    assert len(pairs) == 1
    assert {int(pairs[0][0]), int(pairs[0][1])} == \
        {int(ids_np[10]), int(ids_np[11])}
    assert idx.find_duplicates(tau=0.1, group=True) == [["im10", "im11"]]


def test_reconstruct_strips_norm_column(rng):
    X = _rand(rng, 40, 12)
    idx = _build(X)
    got = idx.reconstruct(names=["im3", "im0"])
    assert got.shape == (2, 12)
    np.testing.assert_allclose(got, X[[3, 0]], rtol=1e-6)
    assert idx.reconstruct(names=[]).shape == (0, 12)
    assert idx.stats()["dim"] == 12 and idx.stats()["metric"] == "l2"


def test_add_augments_and_repad_does_not_double_augment(rng):
    X = _rand(rng, 20, 8)
    idx = _build(X, capacity=24)              # room for one small add
    Y = _rand(rng, 3, 8)
    assert idx.add(descriptors=Y, names=[f"new{j}" for j in range(3)]) == 3
    # overflow the capacity -> re-pad path (from_descriptors _augmented)
    Z = _rand(rng, 10, 8)
    assert idx.add(descriptors=Z, names=[f"ovf{j}" for j in range(10)]) == 10
    allX = np.concatenate([X, Y, Z])
    Q = _rand(rng, 4, 8)
    s, i = idx.search(Q)
    d2 = _l2sq(Q, allX)
    ids_np = np.asarray(idx.ids)[:33]
    want = ids_np[np.argsort(d2, axis=1, kind="stable")[:, :5]]
    np.testing.assert_array_equal(i, want)
    np.testing.assert_allclose(s, -np.sort(d2, axis=1)[:, :5],
                               rtol=1e-4, atol=1e-3)
    # internal store is exactly ONE column wider than user dim
    assert idx.descriptors.shape[1] == 9


def test_save_load_round_trip(rng, tmp_path):
    X = _rand(rng, 30, 16)
    idx = _build(X)
    idx.save(str(tmp_path / "idx"))
    back = Index.load(str(tmp_path / "idx"))
    assert back.is_l2
    Q = _rand(rng, 2, 16)
    np.testing.assert_allclose(back.search(Q)[0], idx.search(Q)[0],
                               rtol=1e-6)
    np.testing.assert_array_equal(back.search(Q)[1], idx.search(Q)[1])


def test_sharded_ranking_equals_single(rng):
    X = _rand(rng, 160, 16)
    idx = _build(X)
    Q = _rand(rng, 4, 16)
    _, want_i = idx.search(Q)
    sidx = idx.to_sharded()
    got_s, got_i = sidx.search(Q, k=5)       # user-width queries
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    # mesh-routed knn graph converts scores
    s1, i1 = idx.knn_graph(k=3)
    from instsearch_tpu.parallel import make_mesh
    sm, im = idx.knn_graph(k=3, mesh=make_mesh())
    np.testing.assert_array_equal(im, i1)
    np.testing.assert_allclose(sm, s1, rtol=1e-4, atol=1e-3)


def test_gates_reject_cosine_stages(rng):
    X = _rand(rng, 64, 16)
    idx = _build(X)
    for call in (idx.build_ivf, idx.build_pq, idx.build_ivfpq,
                 idx.fit_local_whitening, idx.augment_database):
        with pytest.raises(ValueError, match="l2"):
            call()
    with pytest.raises(ValueError, match="l2"):
        idx.search(X[:2], idx.cfg.search.replace(qe_enabled=True))
    with pytest.raises(ValueError, match="l2"):
        Index.build(["x.jpg"], PipelineConfig(
            extract=ExtractConfig(dtype="float32"),
            index=IndexConfig(metric="l2")))
    with pytest.raises(ValueError, match="int4"):
        _build(X, dtype="int4")
    with pytest.raises(ValueError, match="metric"):
        PipelineConfig(index=IndexConfig(metric="cosine")) \
            and Index.from_descriptors(
                X, [f"im{i}" for i in range(64)],
                PipelineConfig(index=IndexConfig(metric="cosine")))


def test_merge_metric_mismatch_and_l2_union(rng):
    X, Y = _rand(rng, 24, 8), _rand(rng, 16, 8)
    a = _build(X)
    b = _build(Y)
    b.names = [f"other{i}" for i in range(16)]    # disjoint names
    ip_cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype="float32", row_tile=8),
        search=SearchConfig(k=5, use_pallas=False))
    c = Index.from_descriptors(Y, [f"c{i}" for i in range(16)], ip_cfg)
    with pytest.raises(ValueError, match="metric"):
        a.merge_from(c)
    n = a.merge_from(b)                           # l2 + l2 merges
    assert n == 16
    allX = np.concatenate([X, Y])
    Q = _rand(rng, 3, 8)
    s, i = a.search(Q)
    d2 = _l2sq(Q, allX)
    ids_np = np.asarray(a.ids)[:40]
    want = ids_np[np.argsort(d2, axis=1, kind="stable")[:, :5]]
    np.testing.assert_array_equal(i, want)
