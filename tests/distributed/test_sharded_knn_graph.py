"""Mesh-routed Index.knn_graph / find_duplicates must equal the
single-device path exactly (the αDBA distribution pattern: per-shard
fused top-(k+1) + ICI allgather merge, self struck host-side by id)."""
import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index
from instsearch_tpu.parallel import make_mesh


def _unit(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _build(rng, n=320, d=32, dtype="float32"):
    X = _unit(rng, (n, d))
    X[17] = X[3]                             # byte-identical twin pair
    X[40] = X[41] = X[42]                    # triple
    cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype=dtype, row_tile=8),
        search=SearchConfig(k=5, use_pallas=False, query_chunk=64))
    return Index.from_descriptors(X, [f"im{i}" for i in range(n)], cfg), X


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_mesh_knn_graph_equals_single(rng, dtype):
    idx, X = _build(rng, dtype=dtype)
    want_s, want_i = idx.knn_graph(k=5)
    got_s, got_i = idx.knn_graph(k=5, mesh=make_mesh())
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-4, atol=1e-5)


def test_mesh_knn_graph_subset_equals_single(rng):
    idx, X = _build(rng)
    sub = idx.make_subset(names=[f"im{j}" for j in range(0, 320, 2)])
    want_s, want_i = idx.knn_graph(k=4, subset=sub)
    got_s, got_i = idx.knn_graph(k=4, subset=sub, mesh=make_mesh())
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-4, atol=1e-5)


def test_mesh_find_duplicates_groups(rng):
    idx, X = _build(rng)
    pairs_1, sc_1 = idx.find_duplicates(tau=0.999)
    pairs_m, sc_m = idx.find_duplicates(tau=0.999, mesh=make_mesh())
    np.testing.assert_array_equal(pairs_m, pairs_1)
    groups = idx.find_duplicates(tau=0.999, group=True, mesh=make_mesh())
    assert sorted(map(sorted, groups), key=len) == [
        ["im17", "im3"], ["im40", "im41", "im42"]]
