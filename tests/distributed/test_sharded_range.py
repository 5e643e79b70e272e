"""Distributed range search must equal the single-device path exactly
(per-shard streamed threshold counts + one psum; top-m via the sharded
merge). -> tests/distributed/test_sharded_range.py"""
import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index
from instsearch_tpu.parallel import make_mesh


def _unit(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _build(rng, n=320, d=32, dtype="float32", metric="ip"):
    X = _unit(rng, (n, d))
    if metric == "l2":
        X = (2.0 * rng.standard_normal((n, d))).astype(np.float32)
    cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype=dtype, row_tile=8, metric=metric),
        search=SearchConfig(k=5, use_pallas=False, query_chunk=64))
    return Index.from_descriptors(X, [f"im{i}" for i in range(n)], cfg), X


@pytest.mark.parametrize("dtype", ["float32", "int8", "int4"])
def test_mesh_range_equals_single(rng, dtype):
    idx, X = _build(rng, dtype=dtype)
    Q = _unit(rng, (5, 32))
    tau = 0.2
    s1, i1, c1 = idx.search_range(Q, tau, max_results=64)
    sm, im, cm = idx.search_range(Q, tau, max_results=64,
                                  mesh=make_mesh())
    np.testing.assert_array_equal(cm, c1)
    np.testing.assert_array_equal(im, i1)
    np.testing.assert_allclose(sm, s1, rtol=1e-4, atol=1e-5)


def test_mesh_range_subset(rng):
    idx, X = _build(rng)
    sub = idx.make_subset(names=[f"im{j}" for j in range(0, 320, 3)])
    Q = _unit(rng, (3, 32))
    s1, i1, c1 = idx.search_range(Q, 0.15, max_results=64, subset=sub)
    sm, im, cm = idx.search_range(Q, 0.15, max_results=64, subset=sub,
                                  mesh=make_mesh())
    np.testing.assert_array_equal(cm, c1)
    np.testing.assert_array_equal(im, i1)


def test_mesh_range_l2_radius(rng):
    idx, X = _build(rng, metric="l2")
    Q = (2.0 * rng.standard_normal((3, 32))).astype(np.float32)
    r = 8.0
    s1, i1, c1 = idx.search_range(Q, r, max_results=128)
    sm, im, cm = idx.search_range(Q, r, max_results=128, mesh=make_mesh())
    np.testing.assert_array_equal(cm, c1)
    np.testing.assert_array_equal(im, i1)
    np.testing.assert_allclose(sm, s1, rtol=1e-4, atol=1e-3)
    d2 = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(cm, (d2 <= r * r).sum(1))
