"""Serve-time mutation compile hygiene (ADVICE r4): every jitted program
compiles per distinct shape, and a compile costs ~90-110 s through the
real chip's tunnel — so live adds of varying batch sizes must reuse
compiled shapes, and the spill arrays (part of every search program's
trace shape) must be reservable up front.

Contracts pinned here:
  * absorb-side encode/assign programs run at power-of-two-PADDED batch
    shapes: adds of size 3/5/7 share ONE compiled assign program;
  * ``reserve_spill`` pre-grows IVF/IVF-PQ spill so absorbed adds do not
    change the search program's trace shapes;
  * ``merge_from`` warns when absorbed donors blow up the always-scanned
    spill (the API path has no refit, unlike ``cli merge-index``);
  * ``build_pq`` warns below the capacity regime where the flat ADC scan
    is measured slower than every exact scan.
"""
import logging

import numpy as np
import pytest

from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _mk(rng, n=192, d=32, capacity=512):
    x = _unit(rng, n, d)
    cfg = PipelineConfig(index=IndexConfig(dtype="float32", row_tile=8,
                                           capacity=capacity),
                         search=SearchConfig(k=10, use_pallas=False))
    return Index.from_descriptors(x, [f"a{i}" for i in range(n)], cfg), x


def test_absorb_add_reuses_padded_shapes(rng):
    from instsearch_tpu.search import ivfpq as ivfpq_mod
    idx, x = _mk(rng)
    v = idx.build_ivfpq(n_clusters=8, nprobe=8, m=8, depth=64,
                        kmeans_iters=4, pq_iters=4, sample=None)
    # warm one add in the 8-wide size class, then vary sizes 3/5/7: all
    # pad to 8, so the assign program must not recompile
    idx.add(descriptors=_unit(rng, 6, 32), names=[f"w{i}" for i in range(6)])
    before = ivfpq_mod._assign_residual_jit._cache_size()
    for r, nn in enumerate((3, 5, 7)):
        idx.add(descriptors=_unit(rng, nn, 32),
                names=[f"s{r}_{i}" for i in range(nn)])
    assert ivfpq_mod._assign_residual_jit._cache_size() == before, \
        "adds of size 3/5/7 must share the padded-8 assign program"
    # and the absorbed rows are still found exactly (padding must not
    # leak pad rows into the spill)
    rows = np.asarray(
        idx._rows_f32_chunk(0, idx.descriptors.shape[0]))[:idx.num_valid]
    ids_all = np.asarray(idx.ids)[:idx.num_valid]
    q = rows[-8:]
    _, got = v.search(idx, q, k=5, depth=512, nprobe=8)
    want = ids_all[np.argsort(-(q @ rows.T), kind="stable", axis=1)[:, :5]]
    np.testing.assert_array_equal(got, want)


def test_reserve_spill_keeps_trace_shapes(rng):
    idx, x = _mk(rng)
    ivf = idx.build_ivf(n_clusters=8, iters=4)
    ivf.reserve_spill(64, idx)
    shapes = (ivf.spill.shape, ivf.spill_pos.shape)
    assert ivf.spill_pos.shape[0] == 64
    assert int((np.asarray(ivf.spill_pos) >= 0).sum()) == 0  # no entries
    idx.add(descriptors=_unit(rng, 10, 32),
            names=[f"b{i}" for i in range(10)])
    assert (ivf.spill.shape, ivf.spill_pos.shape) == shapes, \
        "a reserved spill must absorb the add without a shape change"
    # correctness through the reservation: full probe == brute force
    rows = np.asarray(
        idx._rows_f32_chunk(0, idx.descriptors.shape[0]))[:idx.num_valid]
    q = rows[-4:]
    _, got = ivf.search(idx, q, k=5, nprobe=8)
    ids_all = np.asarray(idx.ids)[:idx.num_valid]
    want = ids_all[np.argsort(-(q @ rows.T), kind="stable", axis=1)[:, :5]]
    np.testing.assert_array_equal(got, want)


def test_reserve_spill_ivfpq(rng):
    idx, x = _mk(rng)
    v = idx.build_ivfpq(n_clusters=8, nprobe=8, m=8, depth=64,
                        kmeans_iters=4, pq_iters=4, sample=None)
    v.reserve_spill(64)
    shapes = (v.spill_codes.shape, v.spill_pos.shape,
              v.spill_cluster.shape)
    idx.add(descriptors=_unit(rng, 10, 32),
            names=[f"b{i}" for i in range(10)])
    assert (v.spill_codes.shape, v.spill_pos.shape,
            v.spill_cluster.shape) == shapes


def test_serve_core_reserves_spill(rng, tmp_path):
    from instsearch_tpu.serve import ServeCore
    idx, x = _mk(rng)
    idx.build_ivf(n_clusters=8, iters=4)
    # ServeCore needs no extractor for this check — __init__ touches
    # only the views (no warmup call here)
    ServeCore(idx, spill_reserve=256)
    assert int(idx.ivf.spill_pos.shape[0]) >= 256
    assert int((np.asarray(idx.ivf.spill_pos) >= 0).sum()) == 0


def test_merge_from_warns_on_spill_blowup(rng, caplog):
    idx, x = _mk(rng, n=128)
    idx.build_ivf(n_clusters=8, iters=4)
    y = _unit(rng, 128, 32)
    cfg = idx.cfg
    donor = Index.from_descriptors(y, [f"d{i}" for i in range(128)], cfg)
    with caplog.at_level(logging.WARNING, logger="instsearch.index"):
        idx.merge_from(donor)
    assert any("always-scanned spill" in r.message for r in caplog.records)


def test_build_pq_warns_below_capacity_regime(rng, caplog):
    idx, x = _mk(rng)
    with caplog.at_level(logging.WARNING, logger="instsearch.index"):
        idx.build_pq(m=8, depth=64, iters=4, sample=None)
    assert any("capacity regime" in r.message for r in caplog.records)
