"""Anisotropic (score-aware) codes through the view layer:
``build_pq/build_ivfpq(anisotropic_t=)`` wiring, the ADC-only serving
path ``IVFPQView.search_adc`` (validated against a numpy decode oracle),
OPQ exclusivity, and persistence of the fit record."""
import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index
from instsearch_tpu.search.ivfpq import IVFPQView
from instsearch_tpu.search.pq_view import PQView


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _index(x):
    cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype="float32", row_tile=8),
        search=SearchConfig(k=10, use_pallas=False))
    return Index.from_descriptors(x, [f"im{i}" for i in range(len(x))], cfg)


def test_build_pq_anisotropic_routes_and_rescored_search_stays_exact(rng):
    x = _unit(rng, 256, 32)
    q = _unit(rng, 5, 32)
    idx = _index(x)
    view = idx.build_pq(m=4, depth=256, anisotropic_t=0.2)
    assert view.anisotropic_t == 0.2 and view.rotation is None
    # full-depth cascade re-scores exactly regardless of the code fit
    s, ids = view.search(idx, q, k=10, depth=256)
    want = np.argsort(-(q @ x.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ids, want)


def test_ivfpq_anisotropic_full_probe_depth_exact(rng):
    x = _unit(rng, 256, 32)
    q = _unit(rng, 5, 32)
    idx = _index(x)
    v = idx.build_ivfpq(n_clusters=8, nprobe=8, m=4, depth=256,
                        anisotropic_t=0.2)
    assert v.anisotropic_t == 0.2
    s, ids = v.search(idx, q, k=10, depth=256, nprobe=8)
    want = np.argsort(-(q @ x.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ids, want)


def test_opq_exclusive_with_anisotropic(rng):
    x = _unit(rng, 128, 32)
    idx = _index(x)
    with pytest.raises(ValueError, match="mutually exclusive"):
        idx.build_pq(m=4, opq_iters=2, anisotropic_t=0.2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        idx.build_ivfpq(n_clusters=4, m=4, opq_iters=2, anisotropic_t=0.2)


def test_search_adc_matches_decode_oracle(rng):
    """search_adc's ranking == numpy oracle over the DECODED store:
    score(q, row) = q·c_coarse + q·decode(residual codes)."""
    from instsearch_tpu.ops.pq import decode_pq
    x = _unit(rng, 256, 32)
    q = _unit(rng, 4, 32)
    idx = _index(x)
    v = idx.build_ivfpq(n_clusters=8, nprobe=8, m=4, depth=256,
                        anisotropic_t=0.2)
    s, pos = v.search_adc(q, k=10, depth=256, nprobe=8)

    cent = np.asarray(v.centroids)
    # rebuild the decoded approximation per PADDED row position
    n_pad = idx.descriptors.shape[0]
    approx = np.full((n_pad, x.shape[1]), np.nan, np.float32)
    bp = np.asarray(v.bucket_pos)                     # [C, cap]
    codes = np.asarray(v.codes)                       # [C, cap, m/2]
    for c in range(bp.shape[0]):
        live = bp[c] >= 0
        if live.any():
            res = np.asarray(decode_pq(codes[c][live], v.codebook))
            approx[bp[c][live]] = cent[c] + res
    sp = np.asarray(v.spill_pos)
    spc = np.asarray(v.spill_cluster)
    live = sp >= 0
    if live.any():
        res = np.asarray(decode_pq(np.asarray(v.spill_codes)[live],
                                   v.codebook))
        approx[sp[live]] = cent[spc[live]] + res
    got_rows = np.isfinite(approx[:, 0])
    assert got_rows.sum() == len(x)
    oracle = q @ np.where(np.isfinite(approx), approx, 0.0).T
    oracle[:, ~got_rows] = -np.inf
    want_pos = np.argsort(-oracle, axis=1, kind="stable")[:, :10]
    want_s = np.take_along_axis(oracle, want_pos, axis=1)
    # scores must match tightly; positions may swap only under ties
    np.testing.assert_allclose(s, want_s, rtol=2e-3, atol=2e-3)
    same = pos == want_pos
    tied = np.isclose(s, want_s, rtol=2e-3, atol=2e-3)
    assert (same | tied).all()

    # ids mapping path
    _, ids = v.search_adc(q, k=10, depth=256, nprobe=8,
                          ids=np.asarray(idx.ids))
    valid = pos >= 0
    np.testing.assert_array_equal(ids[valid],
                                  np.asarray(idx.ids)[pos[valid]])


def test_anisotropic_t_persists(rng, tmp_path):
    x = _unit(rng, 128, 32)
    idx = _index(x)
    v = idx.build_ivfpq(n_clusters=4, nprobe=4, m=4, depth=64,
                        anisotropic_t=0.15)
    v.save(str(tmp_path / "v"))
    v2 = IVFPQView.load(str(tmp_path / "v"))
    assert v2.anisotropic_t == 0.15

    pqv = PQView.from_index(idx, m=4, depth=64, anisotropic_t=0.15)
    pqv.save(str(tmp_path / "p"))
    p2 = PQView.load(str(tmp_path / "p"))
    assert p2.anisotropic_t == 0.15
    # plain views stay None through the round-trip
    plain = PQView.from_index(idx, m=4, depth=64)
    plain.save(str(tmp_path / "q"))
    assert PQView.load(str(tmp_path / "q")).anisotropic_t is None
