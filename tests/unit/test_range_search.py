"""Range search (Index.search_range — FAISS range_search analog):
static-shape top-max_results above a score threshold + exact counts."""
import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index


def _build(rng, n=300, d=32, dtype="float32"):
    X = rng.standard_normal((n, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(extract=ExtractConfig(dtype="float32"),
                         index=IndexConfig(dtype=dtype, row_tile=8),
                         search=SearchConfig(k=5, use_pallas=False))
    idx = Index.from_descriptors(X, [f"im{i}" for i in range(n)], cfg)
    return idx, X


def test_matches_numpy_oracle(rng):
    idx, X = _build(rng)
    Q = X[:4] + 0.01 * rng.standard_normal((4, 32)).astype(np.float32)
    tau = 0.2
    s, i, counts = idx.search_range(Q, tau, max_results=64)
    scores = Q @ X.T
    ids_np = np.asarray(idx.ids)[:300]
    for r in range(4):
        want_pos = np.flatnonzero(scores[r] >= tau)
        assert counts[r] == len(want_pos)
        assert counts[r] <= 64                 # untruncated here
        got = i[r][i[r] >= 0]
        assert len(got) == counts[r]
        assert set(got) == set(ids_np[want_pos])
        # score-sorted, members above tau, tail padded
        assert (s[r][:len(got)] >= tau).all()
        assert (np.diff(s[r][:len(got)]) <= 1e-6).all()
        assert (s[r][len(got):] == -np.inf).all()
        assert (i[r][len(got):] == -1).all()


def test_truncation_flagged_by_count(rng):
    idx, X = _build(rng)
    Q = X[:2]
    s, i, counts = idx.search_range(Q, tau=-1.0, max_results=16)
    # every valid row scores >= -1 on unit vectors
    assert (counts == 300).all()
    assert ((i >= 0).sum(axis=1) == 16).all()   # truncated to max_results
    # the 16 returned are the TOP 16
    scores = Q @ X.T
    ids_np = np.asarray(idx.ids)[:300]
    want = ids_np[np.argsort(-scores, axis=1)[:, :16]]
    np.testing.assert_array_equal(i, want)


def test_empty_result_above_max_score(rng):
    idx, X = _build(rng)
    s, i, counts = idx.search_range(X[:3], tau=1.5, max_results=8)
    assert (counts == 0).all()
    assert (i == -1).all() and (s == -np.inf).all()


def test_composes_with_subset(rng):
    idx, X = _build(rng)
    members = [f"im{j}" for j in range(0, 300, 3)]
    sub = idx.make_subset(names=members)
    Q = X[:3]
    tau = 0.2
    s, i, counts = idx.search_range(Q, tau, max_results=64, subset=sub)
    allow = np.zeros(300, bool)
    allow[::3] = True
    scores = Q @ X.T
    ids_np = np.asarray(idx.ids)[:300]
    for r in range(3):
        want_pos = np.flatnonzero((scores[r] >= tau) & allow)
        assert counts[r] == len(want_pos)
        got = i[r][i[r] >= 0]
        assert set(got) == set(ids_np[want_pos])


def test_int8_counts_close(rng):
    """Quantized storage: counts within a small band of the f32 truth
    (near-tau ties may flip by one quantization step)."""
    idx, X = _build(rng, dtype="int8")
    Q = X[:4]
    tau = 0.15
    s, i, counts = idx.search_range(Q, tau, max_results=128)
    exact = (Q @ X.T >= tau).sum(axis=1)
    assert (np.abs(counts - exact) <= np.maximum(3, 0.05 * exact)).all()
    # returned members all clear tau at kernel precision
    assert all((row[row > -np.inf] >= tau).all() for row in s)
