"""Incremental view maintenance: Index.add() absorbs new rows into every
attached candidate/re-scoring view instead of dropping it (VERDICT r3's
"dynamic corpus" row: views used to invalidate on ANY mutation).

Exactness contract per view:
  * IVF       — new rows append to the ALWAYS-SCANNED spill block in store
                dtype, so full-probe search stays exactly equal to the
                brute-force ranking (the strongest possible invariant).
  * IVF-PQ    — new rows are residual-encoded against the FROZEN coarse
                quantizer/codebook and appended to the spill codes; the
                cascade exact-re-score makes returned scores exact.
  * PQ        — new rows are encoded with the frozen codebook and written
                at their positions in the position-aligned codes array.
  * local-whitening — new rows are routed + whitened by the FROZEN bank
                and written into the position-aligned whitened store.
augment_database() still drops (values change); remove() is absorbed
too — tests/integration/test_view_absorb_remove.py pins that contract.
"""
import numpy as np
import pytest

from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _mk(rng, n=160, d=32, dtype="float32", capacity=512):
    x = _unit(rng, n, d)
    cfg = PipelineConfig(index=IndexConfig(dtype=dtype, row_tile=8,
                                           capacity=capacity),
                         search=SearchConfig(k=10, use_pallas=False))
    return Index.from_descriptors(x, [f"a{i}" for i in range(n)], cfg), x


def _exact_top(x_all, q, k=10):
    return np.argsort(-(q @ x_all.T), kind="stable", axis=1)[:, :k]


# ---------------------------------------------------------------- IVF --
@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_ivf_absorbs_add_full_probe_exact(rng, dtype):
    idx, x = _mk(rng, dtype=dtype)
    ivf = idx.build_ivf(n_clusters=8, iters=5)
    y = _unit(rng, 24, 32)
    idx.add(descriptors=y, names=[f"b{i}" for i in range(24)])
    assert idx.ivf is ivf, "view must survive add()"
    x_all = np.concatenate([x, y])
    q = np.concatenate([_unit(rng, 4, 32), y[:4]])
    _, ids = ivf.search(idx, q, k=10, nprobe=8)
    if dtype == "float32":
        np.testing.assert_array_equal(ids, _exact_top(x_all, q))
    else:       # int8: bf16-vs-int8 scoring ties -> recall, not equality
        assert ivf.measure_recall(idx, q, k=10, nprobe=8) >= 0.95
    # added rows are their own nearest neighbor
    assert (ids[4:, 0] == np.arange(160, 164)).all()


def test_ivf_spill_grows_geometrically(rng):
    idx, x = _mk(rng)
    ivf = idx.build_ivf(n_clusters=8, iters=5)
    cap0 = int(ivf.spill_pos.shape[0])
    total = 0
    for r in range(4):                   # repeated adds overflow padding
        y = _unit(rng, 30, 32)
        idx.add(descriptors=y, names=[f"g{r}_{i}" for i in range(30)])
        total += 30
    used = int((np.asarray(ivf.spill_pos) >= 0).sum())
    assert used >= total                 # every added row lives in spill
    assert ivf.spill_pos.shape[0] >= cap0 + total
    assert ivf.spill.shape[0] == ivf.spill_pos.shape[0]
    q = _unit(rng, 3, 32)
    _, ids = ivf.search(idx, q, k=10, nprobe=8)
    x_all = np.asarray(
        idx._rows_f32_chunk(0, idx.descriptors.shape[0]))[:idx.num_valid]
    np.testing.assert_array_equal(ids, _exact_top(x_all, q))


def test_ivf_absorb_survives_save_load(rng, tmp_path):
    idx, x = _mk(rng)
    idx.build_ivf(n_clusters=8, iters=5)
    y = _unit(rng, 12, 32)
    idx.add(descriptors=y, names=[f"b{i}" for i in range(12)])
    idx.save(str(tmp_path / "idx"))
    idx2 = Index.load(str(tmp_path / "idx"))
    assert idx2.ivf is not None
    _, ids = idx2.ivf.search(idx2, y[:3], k=5, nprobe=8)
    assert (ids[:, 0] == np.arange(160, 163)).all()


def test_remove_absorbed_too(rng):
    # the full remove-absorption contract lives in
    # test_view_absorb_remove.py; this pins only that the view survives
    idx, x = _mk(rng)
    ivf = idx.build_ivf(n_clusters=8, iters=5)
    idx.remove(["a0", "a1"])
    assert idx.ivf is ivf


# ------------------------------------------------------------- IVF-PQ --
@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_ivfpq_absorbs_add(rng, dtype):
    idx, x = _mk(rng, n=192, dtype=dtype)
    v = idx.build_ivfpq(n_clusters=8, nprobe=8, m=8, depth=32,
                        kmeans_iters=5, pq_iters=5, sample=None)
    y = _unit(rng, 16, 32)
    idx.add(descriptors=y, names=[f"b{i}" for i in range(16)])
    assert idx.ivfpq is v, "view must survive add()"
    used = int((np.asarray(v.spill_pos) >= 0).sum())
    assert used >= 16
    # an added row queries itself back: its spill codes are always
    # scanned and the cascade re-scores exactly
    _, ids = v.search(idx, y[:5], k=5)
    assert (ids[:, 0] == np.arange(192, 197)).all()
    # spill codes are REAL encodings: cluster ids are in range
    spc = np.asarray(v.spill_cluster)
    live = np.asarray(v.spill_pos) >= 0
    assert (spc[live] >= 0).all() and (spc[live] < v.n_clusters).all()


def test_ivfpq_absorb_roundtrip_and_growth(rng, tmp_path):
    idx, x = _mk(rng, n=192)
    v = idx.build_ivfpq(n_clusters=8, nprobe=8, m=8, depth=32,
                        kmeans_iters=5, pq_iters=5, sample=None)
    for r in range(3):
        y = _unit(rng, 40, 32)
        idx.add(descriptors=y, names=[f"g{r}_{i}" for i in range(40)])
    idx.save(str(tmp_path / "idx"))
    idx2 = Index.load(str(tmp_path / "idx"))
    last = np.asarray(
        idx2._rows_f32_chunk(0, idx2.descriptors.shape[0]))[272:292]
    _, ids = idx2.ivfpq.search(idx2, last[:4], k=5)
    assert (ids[:, 0] == np.arange(272, 276)).all()


# ----------------------------------------------------------------- PQ --
@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_pq_absorbs_add(rng, dtype):
    idx, x = _mk(rng, n=192, dtype=dtype)
    v = idx.build_pq(m=8, depth=32, iters=5, sample=None)
    y = _unit(rng, 16, 32)
    idx.add(descriptors=y, names=[f"b{i}" for i in range(16)])
    assert idx.pq is v, "view must survive add()"
    _, ids = v.search(idx, y[:5], k=5)
    assert (ids[:, 0] == np.arange(192, 197)).all()


def test_pq_absorbs_add_through_repad(rng):
    # capacity exceeded -> the store re-pads; the position-aligned codes
    # array must grow with it and the added rows must still round-trip
    idx, x = _mk(rng, n=160, capacity=168)
    v = idx.build_pq(m=8, depth=32, iters=5, sample=None)
    n_pad0 = int(v.codes.shape[0])
    y = _unit(rng, 32, 32)
    idx.add(descriptors=y, names=[f"b{i}" for i in range(32)])
    assert idx.pq is v
    assert v.codes.shape[0] == idx.descriptors.shape[0] > n_pad0
    _, ids = v.search(idx, y[:4], k=5)
    assert (ids[:, 0] == np.arange(160, 164)).all()
    # old rows survived the re-pad with their original codes
    _, ids_old = v.search(idx, x[:4], k=5)
    assert (ids_old[:, 0] == np.arange(4)).all()


# ----------------------------------------------------- local whitening --
def test_lw_absorbs_add(rng):
    idx, x = _mk(rng, n=192)
    lw = idx.fit_local_whitening(n_clusters=4, iters=5)
    y = _unit(rng, 16, 32)
    idx.add(descriptors=y, names=[f"b{i}" for i in range(16)])
    assert idx.lw is lw, "view must survive add()"
    # the store rows at the new positions ARE the frozen bank's transform
    from instsearch_tpu.ops.local_whiten import (apply_local_whitening,
                                                 route)
    import jax.numpy as jnp
    want = np.asarray(apply_local_whitening(jnp.asarray(y), lw.params))
    got = np.asarray(lw.store)[192:208].astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)  # bf16 store
    np.testing.assert_array_equal(
        np.asarray(lw.assign)[192:208],
        np.asarray(route(jnp.asarray(y), lw.params)))
    # lw-enabled search still routes and the added row is retrievable
    s, ids = idx.search(y[:3], idx.cfg.search.replace(
        lw_enabled=True, rerank_depth=16, k=5))
    assert (ids[:, 0] == np.arange(192, 195)).all()


def test_lw_absorbs_add_through_repad(rng):
    idx, x = _mk(rng, n=160, capacity=168)
    lw = idx.fit_local_whitening(n_clusters=4, iters=5)
    y = _unit(rng, 32, 32)
    idx.add(descriptors=y, names=[f"b{i}" for i in range(32)])
    assert idx.lw is lw
    assert lw.store.shape[0] == idx.descriptors.shape[0]
    s, ids = idx.search(y[:3], idx.cfg.search.replace(
        lw_enabled=True, rerank_depth=16, k=5))
    assert (ids[:, 0] == np.arange(160, 163)).all()
