"""Offline corpus analytics: Index.knn_graph (all-pairs kNN, self
excluded), Index.find_duplicates (near-dup pairs + transitive groups),
Index.reconstruct (stored-row decode — FAISS reconstruct analog)."""
import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index


def _build(X, dtype="float32", chunk=32):
    cfg = PipelineConfig(extract=ExtractConfig(dtype="float32"),
                         index=IndexConfig(dtype=dtype, row_tile=8),
                         search=SearchConfig(k=5, use_pallas=False,
                                             query_chunk=chunk))
    return Index.from_descriptors(X, [f"im{i}" for i in range(len(X))], cfg)


def _unit(rng, n, d):
    X = rng.standard_normal((n, d)).astype(np.float32)
    return X / np.linalg.norm(X, axis=1, keepdims=True)


def test_knn_graph_matches_oracle(rng):
    X = _unit(rng, 100, 16)
    idx = _build(X)
    s, i = idx.knn_graph(k=5)
    scores = X @ X.T
    np.fill_diagonal(scores, -np.inf)        # self excluded
    ids_np = np.asarray(idx.ids)[:100]
    for r in range(100):
        want = ids_np[np.argsort(-scores[r], kind="stable")[:5]]
        np.testing.assert_array_equal(i[r], want)
        np.testing.assert_allclose(s[r], np.sort(scores[r])[::-1][:5],
                                   rtol=1e-5)


def test_knn_graph_chunk_boundary_and_slideback(rng):
    """num_valid not a multiple of chunk: the last chunk slides back and
    must still fill every row exactly once."""
    X = _unit(rng, 75, 16)                   # 75 rows, chunk 32
    idx = _build(X)
    s, i = idx.knn_graph(k=3)
    scores = X @ X.T
    np.fill_diagonal(scores, -np.inf)
    ids_np = np.asarray(idx.ids)[:75]
    want = ids_np[np.argsort(-scores, axis=1, kind="stable")[:, :3]]
    np.testing.assert_array_equal(i, want)


def test_knn_graph_subset_restricts_neighbors(rng):
    X = _unit(rng, 60, 16)
    idx = _build(X)
    sub = idx.make_subset(names=[f"im{j}" for j in range(0, 60, 2)])
    s, i = idx.knn_graph(k=4, subset=sub)
    assert ((i < 0) | (i % 2 == 0)).all()
    # even rows never see themselves
    ids_np = np.asarray(idx.ids)[:60]
    for r in range(60):
        assert ids_np[r] not in i[r]


def test_knn_graph_identical_rows_excluded_by_position(rng):
    """Byte-identical duplicates: id-based self exclusion would strike
    the twin too; position-based keeps it as the top-1 neighbor."""
    X = _unit(rng, 40, 16)
    X[7] = X[3]                              # exact duplicate pair
    idx = _build(X)
    s, i = idx.knn_graph(k=2)
    ids_np = np.asarray(idx.ids)[:40]
    assert i[3][0] == ids_np[7] and i[7][0] == ids_np[3]
    np.testing.assert_allclose(s[3][0], 1.0, atol=1e-5)


def test_find_duplicates_pairs_and_groups(rng):
    X = _unit(rng, 50, 32)
    # plant a chain: 10 ~ 11 ~ 12 (perturbed copies), and a far pair 20~21
    X[11] = X[10] + 0.02 * _unit(rng, 1, 32)[0]
    X[12] = X[11] + 0.02 * _unit(rng, 1, 32)[0]
    X[21] = X[20]
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    idx = _build(X)
    pairs, sc = idx.find_duplicates(tau=0.99)
    ids_np = np.asarray(idx.ids)[:50]
    got = {(int(a), int(b)) for a, b in pairs}
    assert (ids_np[20], ids_np[21]) in got or (ids_np[21], ids_np[20]) in got
    assert (min(ids_np[10], ids_np[11]), max(ids_np[10], ids_np[11])) in got
    # best-first and deduped symmetric
    assert (np.diff(sc) <= 1e-6).all()
    assert len(got) == len(pairs)
    # transitive grouping: the chain lands in ONE group even if 10.12 < tau
    groups = idx.find_duplicates(tau=0.99, group=True)
    g = next(g for g in groups if "im10" in g)
    assert {"im10", "im11", "im12"} <= set(g)
    assert ["im20", "im21"] in [sorted(x) for x in groups]
    # random unit vectors at d=32 never reach 0.99
    assert sum(len(g) for g in groups) == 5


def test_find_duplicates_empty(rng):
    X = _unit(rng, 30, 32)
    idx = _build(X)
    pairs, sc = idx.find_duplicates(tau=0.999)
    assert pairs.shape == (0, 2) and sc.shape == (0,)
    assert idx.find_duplicates(tau=0.999, group=True) == []


def test_reconstruct_f32_roundtrip(rng):
    X = _unit(rng, 40, 16)
    idx = _build(X)
    got = idx.reconstruct(names=["im5", "im0", "im39"])
    np.testing.assert_allclose(got, X[[5, 0, 39]], rtol=1e-6)
    ids_np = np.asarray(idx.ids)[:40]
    got2 = idx.reconstruct(ids=[int(ids_np[7]), int(ids_np[3])])
    np.testing.assert_allclose(got2, X[[7, 3]], rtol=1e-6)


@pytest.mark.parametrize("dtype", ["int8", "int4"])
def test_reconstruct_quantized_close(rng, dtype):
    X = _unit(rng, 32, 32)
    idx = _build(X, dtype=dtype)
    got = idx.reconstruct(names=[f"im{j}" for j in range(32)])
    # stored approximation: same dequantization as the scoring path
    cos = (got * X).sum(1) / np.maximum(np.linalg.norm(got, axis=1), 1e-9)
    assert (cos > (0.98 if dtype == "int8" else 0.9)).all()


def test_reconstruct_errors(rng):
    X = _unit(rng, 16, 16)
    idx = _build(X)
    with pytest.raises(KeyError):
        idx.reconstruct(names=["nope"])
    with pytest.raises(KeyError):
        idx.reconstruct(ids=[99999])
    with pytest.raises(ValueError):
        idx.reconstruct()
    with pytest.raises(ValueError):
        idx.reconstruct(names=["im0"], ids=[0])
    assert idx.reconstruct(names=[]).shape == (0, 16)


def test_cli_dedupe(rng, tmp_path, capsys):
    """cli dedupe runs off a saved index (no extractor needed) and
    reports the planted duplicate pair + group."""
    import json

    from instsearch_tpu.cli import main

    X = _unit(rng, 40, 32)
    X[9] = X[8]
    idx = _build(X)
    idx_dir = str(tmp_path / "idx")
    idx.save(idx_dir)
    rc = main(["dedupe", "--index", idx_dir, "--tau", "0.99"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_pairs"] == 1 and out["n_groups"] == 1
    assert {out["pairs"][0]["a"], out["pairs"][0]["b"]} == {"im8", "im9"}
    assert sorted(out["groups"][0]) == ["im8", "im9"]


def test_reconstruct_after_remove(rng):
    """Positions move under remove-compaction; reconstruct must follow
    the surviving rows' NEW positions."""
    X = _unit(rng, 24, 16)
    idx = _build(X)
    idx.remove(["im1", "im2", "im3"])
    got = idx.reconstruct(names=["im0", "im23", "im4"])
    np.testing.assert_allclose(got, X[[0, 23, 4]], rtol=1e-6)
    with pytest.raises(KeyError):
        idx.reconstruct(names=["im2"])
