"""Index.merge_from + cli merge-index: union of independently-built
indexes — ranking equality vs the union-built index, storage-dtype
round-trips, regional stores (re-rank and exact-refine kinds), guard
rails (dim / pipeline / fingerprint / duplicate names / store kinds),
and capacity-overflow growth."""
import json

import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index, attach_regional_store


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _cfg(dtype="float32", rerank=False, refine=None, capacity=0):
    return PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype=dtype, row_tile=8, capacity=capacity,
                          refine_dtype=refine or ""),
        search=SearchConfig(k=10, use_pallas=False,
                            rerank_enabled=rerank))


def _mk(x, names, cfg):
    return Index.from_descriptors(x, names, cfg)


def test_merge_matches_union_build(rng):
    d = 32
    xa, xb = _unit(rng, 96, d), _unit(rng, 56, d)
    a = _mk(xa, [f"a{i}" for i in range(96)], _cfg())
    b = _mk(xb, [f"b{i}" for i in range(56)], _cfg())
    n = a.merge_from(b)
    assert n == 56 and a.num_valid == 152

    union = np.concatenate([xa, xb])
    q = _unit(rng, 5, d)
    s, ids = a.search(q)
    want = np.argsort(-(q @ union.T), axis=1)[:, :10]
    got_names = [[a.name_of(i) for i in row] for i in [0] for row in ids]
    # id spaces differ (donor rows get fresh ids) — compare by NAME
    union_names = [f"a{i}" for i in range(96)] + [f"b{i}" for i in range(56)]
    for row, wrow in zip(ids, want):
        assert [a.name_of(int(i)) for i in row] == \
            [union_names[w] for w in wrow]
    np.testing.assert_allclose(
        s, np.sort(q @ union.T, axis=1)[:, ::-1][:, :10], rtol=2e-3,
        atol=2e-3)
    # donor untouched
    assert b.num_valid == 56


@pytest.mark.parametrize("dtype", ["int8", "int4"])
def test_merge_quantized_stores(rng, dtype):
    d = 32
    xa, xb = _unit(rng, 64, d), _unit(rng, 40, d)
    a = _mk(xa, [f"a{i}" for i in range(64)], _cfg(dtype))
    b = _mk(xb, [f"b{i}" for i in range(40)], _cfg(dtype))
    a.merge_from(b)
    q = _unit(rng, 4, d)
    s, ids = a.search(q)
    union = np.concatenate([xa, xb])
    exact = np.sort(q @ union.T, axis=1)[:, ::-1][:, :10]
    # one quantization round-trip of tolerance
    tol = 0.05 if dtype == "int4" else 0.02
    np.testing.assert_allclose(s, exact, atol=tol)


def test_merge_capacity_overflow_grows(rng):
    d = 32
    xa, xb = _unit(rng, 16, d), _unit(rng, 48, d)
    a = _mk(xa, [f"a{i}" for i in range(16)], _cfg(capacity=16))
    b = _mk(xb, [f"b{i}" for i in range(48)], _cfg())
    assert a.descriptors.shape[0] < 64
    a.merge_from(b)
    assert a.num_valid == 64
    s, ids = a.search(_unit(rng, 2, d))
    assert (np.asarray(ids) >= 0).all()


def test_merge_regional_rerank_store(rng):
    d, r = 32, 4
    xa, xb = _unit(rng, 32, d), _unit(rng, 24, d)
    a = _mk(xa, [f"a{i}" for i in range(32)], _cfg(rerank=True))
    b = _mk(xb, [f"b{i}" for i in range(24)], _cfg(rerank=True))
    ra = rng.standard_normal((32, r, d)).astype(np.float32)
    rb = rng.standard_normal((24, r, d)).astype(np.float32)
    ra /= np.linalg.norm(ra, axis=2, keepdims=True)
    rb /= np.linalg.norm(rb, axis=2, keepdims=True)
    attach_regional_store(a, ra)
    attach_regional_store(b, rb)
    a.merge_from(b)
    # union-built reference: same rows, same regional store
    u = _mk(np.concatenate([xa, xb]),
            [f"a{i}" for i in range(32)] + [f"b{i}" for i in range(24)],
            _cfg(rerank=True))
    attach_regional_store(u, np.concatenate([ra, rb]))
    q = _unit(rng, 3, d)
    qr = rng.standard_normal((3, r, d)).astype(np.float32)
    qr /= np.linalg.norm(qr, axis=2, keepdims=True)
    sm, im = a.search(q, query_regional=qr)
    su, iu = u.search(q, query_regional=qr)
    names_m = [[a.name_of(int(i)) for i in row] for row in im]
    names_u = [[u.name_of(int(i)) for i in row] for row in iu]
    assert names_m == names_u
    np.testing.assert_allclose(sm, su, rtol=2e-3, atol=2e-3)


def test_merge_refine_store_extends(rng):
    d = 32
    xa, xb = _unit(rng, 32, d), _unit(rng, 24, d)
    cfg = _cfg("int4", refine="int8")
    cfg = cfg.replace(search=cfg.search.replace(refine_enabled=True))
    a = _mk(xa, [f"a{i}" for i in range(32)], cfg)
    b = _mk(xb, [f"b{i}" for i in range(24)], cfg)
    assert a.has_refine_store and b.has_refine_store
    a.merge_from(b)
    assert a.regional.shape[0] == a.descriptors.shape[0]
    s, ids = a.search(_unit(rng, 3, d))
    assert (np.asarray(ids)[:, 0] >= 0).all()


def test_merge_guard_rails(rng):
    d = 32
    x = _unit(rng, 24, d)
    a = _mk(x, [f"a{i}" for i in range(24)], _cfg())
    with pytest.raises(ValueError, match="itself"):
        a.merge_from(a)
    # duplicate names
    b = _mk(_unit(rng, 8, d), ["a0"] + [f"c{i}" for i in range(7)], _cfg())
    with pytest.raises(ValueError, match="duplicate"):
        a.merge_from(b)
    # dim mismatch
    c = _mk(_unit(rng, 8, 16), [f"d{i}" for i in range(8)], _cfg())
    with pytest.raises(ValueError, match="dim mismatch"):
        a.merge_from(c)
    # extract-config mismatch
    cfg2 = PipelineConfig(
        extract=ExtractConfig(dtype="float32", pooling="mac"),
        index=IndexConfig(dtype="float32", row_tile=8),
        search=SearchConfig(k=10, use_pallas=False))
    e = _mk(_unit(rng, 8, d), [f"e{i}" for i in range(8)], cfg2)
    with pytest.raises(ValueError, match="extraction configs differ"):
        a.merge_from(e)
    # regional-store kind mismatch
    f = _mk(_unit(rng, 8, d), [f"f{i}" for i in range(8)],
            _cfg(rerank=True))
    attach_regional_store(
        f, rng.standard_normal((8, 2, d)).astype(np.float32))
    with pytest.raises(ValueError, match="kinds differ"):
        a.merge_from(f)


def test_merge_fingerprint_guard(rng, tmp_path):
    """Indexes carrying DIFFERENT extractor weights must refuse to merge
    even when the configs agree."""
    from instsearch_tpu.extractor import Extractor
    ecfg = ExtractConfig(backbone="vgg16", pooling="gem", image_size=32,
                         batch_size=4, dtype="float32", whiten=False)
    cfg = PipelineConfig(extract=ecfg,
                         index=IndexConfig(dtype="float32", row_tile=8),
                         search=SearchConfig(k=5, use_pallas=False))
    ex0 = Extractor(ecfg, seed=0)
    ex1 = Extractor(ecfg, seed=1)
    d = 512
    a = Index.from_descriptors(_unit(rng, 16, d),
                               [f"a{i}" for i in range(16)], cfg,
                               extractor=ex0)
    b = Index.from_descriptors(_unit(rng, 16, d),
                               [f"b{i}" for i in range(16)], cfg,
                               extractor=ex1)
    with pytest.raises(ValueError, match="fingerprints differ"):
        a.merge_from(b)
    # same weights pass
    c = Index.from_descriptors(_unit(rng, 16, d),
                               [f"c{i}" for i in range(16)], cfg,
                               extractor=ex0)
    assert a.merge_from(c) == 16


def test_cli_merge_index_refits_views(rng, tmp_path):
    """merge-index refits the FIRST index's attached views over the
    union (same policy as update-index)."""
    d = 32
    xa, xb = _unit(rng, 64, d), _unit(rng, 32, d)
    a = _mk(xa, [f"a{i}" for i in range(64)], _cfg())
    a.build_ivf(n_clusters=4, nprobe=4)
    b = _mk(xb, [f"b{i}" for i in range(32)], _cfg())
    a.save(str(tmp_path / "a"))
    b.save(str(tmp_path / "b"))
    from instsearch_tpu.cli import main
    rc = main(["merge-index", str(tmp_path / "a"), str(tmp_path / "b"),
               "--out", str(tmp_path / "m")])
    assert rc == 0
    m = Index.load(str(tmp_path / "m"))
    assert m.num_valid == 96
    assert m.ivf is not None and m.ivf.n_clusters == 4
    # merged rows are reachable through the refit IVF view
    q = xb[5] + 0.01 * rng.standard_normal(d).astype(np.float32)
    s, ids = m.search(q.astype(np.float32))
    assert m.name_of(int(np.asarray(ids)[0, 0])) == "b5"


def test_cli_merge_index(rng, tmp_path):
    d = 32
    xa, xb = _unit(rng, 24, d), _unit(rng, 16, d)
    a = _mk(xa, [f"a{i}" for i in range(24)], _cfg())
    b = _mk(xb, [f"b{i}" for i in range(16)], _cfg())
    a.save(str(tmp_path / "a"))
    b.save(str(tmp_path / "b"))
    from instsearch_tpu.cli import main
    rc = main(["merge-index", str(tmp_path / "a"), str(tmp_path / "b"),
               "--out", str(tmp_path / "m")])
    assert rc == 0
    m = Index.load(str(tmp_path / "m"))
    assert m.num_valid == 40
    q = _unit(rng, 2, d)
    s, ids = m.search(q)
    union = np.concatenate([xa, xb])
    np.testing.assert_allclose(
        s, np.sort(q @ union.T, axis=1)[:, ::-1][:, :10], rtol=2e-3,
        atol=2e-3)
