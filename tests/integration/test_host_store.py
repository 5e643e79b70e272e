"""Capacity-scale host-store serving (search/ivfpq.py::HostRowStore +
IVFPQView.from_host_store/search_host): the chip holds only the 32 B/row
codes, exact rows live in a memory-mapped host file, a query reads only
its depth candidates. Asserted: full probe+depth == numpy brute force,
search_host == the device cascade's ranking on the same view, int8
dequantization, custom ids, the rows_f32 reader contract, and OPQ."""
import numpy as np
import pytest

from instsearch_tpu.search.ivfpq import HostRowStore, IVFPQView


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _clustered(rng, n_per, centers, d, noise=0.12):
    anchors = _unit(rng, centers, d)
    x = np.repeat(anchors, n_per, axis=0)
    x = x + noise * rng.standard_normal(x.shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_full_probe_full_depth_equals_bruteforce(tmp_path, rng, dtype):
    x = _unit(rng, 256, 32)
    q = _unit(rng, 7, 32)
    store = HostRowStore.create(str(tmp_path / "st"), x, dtype=dtype)
    v = IVFPQView.from_host_store(store, n_clusters=8, nprobe=8, m=4,
                                  depth=256, sample=None)
    s, ids = v.search_host(store, q, k=10, depth=256, nprobe=8)
    # int8 storage: the exact re-score sees the DEQUANTIZED rows, so the
    # reference ranking is over the same quantized store
    xs = store.rows_f32(0, 256)
    want = np.argsort(-(q @ xs.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ids, want)
    np.testing.assert_allclose(
        s, np.sort(q @ xs.T, axis=1)[:, ::-1][:, :10], rtol=1e-4,
        atol=1e-4)


def test_search_host_equals_device_cascade(tmp_path, rng):
    # same view, same candidates: the host re-score must reproduce the
    # device cascade's ranking exactly (it is the same math, relocated)
    from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
    from instsearch_tpu.index import Index

    x = _clustered(rng, n_per=32, centers=8, d=32)
    cfg = PipelineConfig(index=IndexConfig(dtype="float32", row_tile=8),
                         search=SearchConfig(k=10, use_pallas=False))
    idx = Index.from_descriptors(x, [f"i{i}" for i in range(len(x))], cfg)
    store = HostRowStore.create(str(tmp_path / "st"), x, dtype="float32")
    v = IVFPQView.from_host_store(store, n_clusters=8, nprobe=3, m=4,
                                  depth=40, sample=None, seed=0)
    q = _unit(rng, 5, 32)
    s_host, i_host = v.search_host(store, q, k=10)
    s_dev, i_dev = v.search(idx, q, k=10)
    np.testing.assert_array_equal(i_host, i_dev)
    np.testing.assert_allclose(s_host, s_dev, rtol=1e-4, atol=1e-4)


def test_custom_ids_and_reopen(tmp_path, rng):
    x = _unit(rng, 64, 16)
    ids = (np.arange(64, dtype=np.int32) * 7 + 3)
    HostRowStore.create(str(tmp_path / "st"), x, ids=ids, dtype="float32")
    store = HostRowStore(str(tmp_path / "st"))    # reopen from disk
    v = IVFPQView.from_host_store(store, n_clusters=4, nprobe=4, m=2,
                                  depth=64, sample=None)
    q = x[:3]
    s, got = v.search_host(store, q, k=1, depth=64, nprobe=4)
    np.testing.assert_array_equal(got[:, 0], ids[:3])   # self-match


def test_int8_rows_roundtrip_bound(tmp_path, rng):
    x = _unit(rng, 32, 16)
    store = HostRowStore.create(str(tmp_path / "st"), x, dtype="int8")
    back = store.rows_f32(0, 32)
    # symmetric per-row quantization: |err| <= scale/2 per component
    assert np.abs(back - x).max() <= (np.abs(x).max(1) / 127).max()
    # reader contract: zero padding past N
    tail = store.rows_f32(24, 16)
    assert tail.shape == (16, 16)
    np.testing.assert_array_equal(tail[8:], 0.0)


def test_pre_quantized_int8_requires_scales(tmp_path, rng):
    codes = rng.integers(-127, 127, (8, 16)).astype(np.int8)
    with pytest.raises(ValueError, match="scales"):
        HostRowStore.create(str(tmp_path / "st"), codes, dtype="int8")
    sc = np.full((8,), 0.01, np.float32)
    store = HostRowStore.create(str(tmp_path / "st2"), codes, scales=sc,
                                dtype="int8")
    np.testing.assert_allclose(store.rows_f32(0, 8),
                               codes.astype(np.float32) * 0.01)


def test_opq_through_host_store(tmp_path, rng):
    x = _clustered(rng, n_per=32, centers=4, d=16)
    store = HostRowStore.create(str(tmp_path / "st"), x, dtype="float32")
    v = IVFPQView.from_host_store(store, n_clusters=4, nprobe=4, m=2,
                                  depth=128, sample=None, opq_iters=2,
                                  pq_iters=6)
    assert v.rotation is not None
    q = _unit(rng, 5, 16)
    s, ids = v.search_host(store, q, k=10, depth=128, nprobe=4)
    want = np.argsort(-(q @ x.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ids, want)
