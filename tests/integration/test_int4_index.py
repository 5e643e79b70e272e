"""int4 packed storage through the full Index API (descriptor-level).

Mirrors test_int8_index.py: every search path must agree with the
unpacked-matrix oracle, and the capacity/maintenance machinery must
treat the packed [N, D//2] matrix like any other storage format.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.config import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index
from instsearch_tpu.ops.quantize import (QuantizedRowsInt4,
                                         dequantize_rows_int4)


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _make(X, scfg=None, capacity=0):
    cfg = PipelineConfig(
        index=IndexConfig(dtype="int4", row_tile=16, capacity=capacity),
        search=scfg or SearchConfig(k=5, use_pallas=False))
    names = [f"im{i}" for i in range(len(X))]
    return Index.from_descriptors(X, names, cfg)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    X = _unit(rng.standard_normal((120, 32)).astype(np.float32))
    q = _unit(X[:4] + 0.02 * rng.standard_normal((4, 32))
              .astype(np.float32))
    return X, q


def _deq(idx):
    """Host copy of the dequantized store."""
    return np.asarray(dequantize_rows_int4(
        QuantizedRowsInt4(idx.descriptors, idx.scales)))


def test_int4_storage_shape_and_dim(data):
    X, _ = data
    idx = _make(X)
    assert idx.descriptors.shape[1] == 16          # packed: D//2 bytes
    assert idx.descriptors.dtype == jnp.int8
    assert idx.dim == 32                           # logical D
    assert idx.is_int4


def test_int4_search_matches_oracle(data):
    X, q = data
    idx = _make(X)
    s, i = idx.search(q)
    deq = _deq(idx)
    want = np.argsort(-(q @ deq[:120].T), axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i), want)
    assert (np.asarray(i)[:, 0] == np.arange(4)).all()


def test_int4_composite_qe(data):
    """QE through int4: the expanded query must come from UNPACKED
    neighbor rows — matches a hand-rolled oracle on the dequantized
    matrix."""
    X, q = data
    scfg = SearchConfig(k=5, qe_enabled=True, qe_n=4, use_pallas=False)
    idx = _make(X, scfg)
    s, i = idx.search(q)
    deq = _deq(idx)[:120]
    g = q @ deq.T
    top = np.argsort(-g, axis=1)[:, :4]
    w = np.clip(np.take_along_axis(g, top, 1), 0, None) ** scfg.qe_alpha
    qexp = q + np.einsum("qn,qnd->qd", w, deq[top])
    qexp /= np.linalg.norm(qexp, axis=1, keepdims=True)
    want = np.argsort(-(qexp @ deq.T), axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i), want)


def test_int4_diffusion(data):
    """Diffusion over int4 storage: candidates unpack+dequantize before
    the graph build; equals the oracle over the dequantized matrix."""
    from instsearch_tpu.search.diffusion import diffusion_rerank_scores
    X, q = data
    scfg = SearchConfig(k=5, diffusion_enabled=True, diffusion_depth=24,
                        diffusion_knn=6, use_pallas=False)
    idx = _make(X, scfg)
    s, i = idx.search(q)
    deq = _deq(idx)
    full = np.full((q.shape[0], idx.descriptors.shape[0]), -np.inf,
                   np.float32)
    full[:, :120] = q @ deq[:120].T
    s_o, i_o = diffusion_rerank_scores(
        jnp.asarray(deq), idx.ids, jnp.asarray(full),
        depth=24, k=5, knn=6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_o))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_o),
                               rtol=1e-4, atol=1e-5)


def test_int4_dba(data):
    """αDBA on int4: aggregation runs on dequantized rows, the result is
    requantized ONCE; scores must stay within one int4 step of the
    dequantized-matrix oracle."""
    from instsearch_tpu.search import dba_augment
    X, q = data
    idx = _make(X)
    deq_before = _deq(idx)
    want = np.asarray(dba_augment(jnp.asarray(deq_before), idx.ids, n=5))
    idx.augment_database(n=5, chunk=16)
    got = _deq(idx)
    step = np.abs(want[:120]).max(axis=1, keepdims=True) / 7.0
    assert (np.abs(got[:120] - want[:120]) <= step / 2 + 1e-6).all()


def test_int4_full_ranking_and_eval_path(data):
    X, q = data
    idx = _make(X)
    ranked = idx.full_ranking(q)
    assert ranked.shape == (4, 120)
    deq = _deq(idx)[:120]
    want = np.argsort(-(q @ deq.T), kind="stable", axis=1)
    # ranking induced by identical scores; ties may permute — compare the
    # score sequences instead of raw ids
    got_scores = np.take_along_axis(q @ deq.T, ranked, 1)
    want_scores = np.take_along_axis(q @ deq.T, want, 1)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5,
                               atol=1e-6)


def test_int4_add_and_remove(data):
    X, q = data
    idx = _make(X[:100], capacity=160)
    extra = _unit(np.random.default_rng(5).standard_normal((20, 32))
                  .astype(np.float32))
    assert idx.add(descriptors=extra,
                   names=[f"x{i}" for i in range(20)]) == 20
    assert idx.num_valid == 120
    s, i = idx.search(extra[:3])
    assert (np.asarray(i)[:, 0] == np.arange(100, 103)).all()
    # removal compacts packed rows + scales verbatim
    idx.remove(["x0", "x1"])
    assert idx.num_valid == 118
    s2, i2 = idx.search(extra[2:3])
    assert np.asarray(i2)[0, 0] == 102


def test_int4_save_load_roundtrip(data, tmp_path):
    X, q = data
    idx = _make(X)
    want_s, want_i = idx.search(q)
    p = str(tmp_path / "idx4")
    idx.save(p)
    idx2 = Index.load(p)
    assert idx2.is_int4 and idx2.dim == 32
    s, i = idx2.search(q)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=1e-6, atol=1e-7)


def test_int4_odd_dim(data):
    """Odd descriptor dims (a rank-clamped whitening can produce them)
    zero-pad to a nibble pair; queries in the ORIGINAL dim still work
    through search, full_ranking and add()."""
    rng = np.random.default_rng(3)
    X = _unit(rng.standard_normal((64, 55)).astype(np.float32))
    idx = _make(X, capacity=96)
    assert idx.descriptors.shape[1] == 28      # (55+1)//2 packed bytes
    assert idx.dim == 56
    q = _unit(X[:3] + 0.02 * rng.standard_normal((3, 55))
              .astype(np.float32))
    s, i = idx.search(q)                       # 55-dim queries pad inside
    assert (np.asarray(i)[:, 0] == np.arange(3)).all()
    ranked = idx.full_ranking(q)
    assert ranked.shape == (3, 64)
    extra = _unit(rng.standard_normal((4, 55)).astype(np.float32))
    idx.add(descriptors=extra, names=[f"o{i}" for i in range(4)])
    _, i2 = idx.search(extra[:1])
    assert np.asarray(i2)[0, 0] == 64
    # sharded path pads too
    from instsearch_tpu.parallel import make_mesh
    sidx = idx.to_sharded(mesh=make_mesh(4), use_pallas=False)
    _, i3 = sidx.search(q, k=5)
    assert (np.asarray(i3)[:, 0] == np.arange(3)).all()


def test_int4_rejects_ivf(data):
    X, _ = data
    idx = _make(X)
    with pytest.raises(ValueError, match="int4"):
        idx.build_ivf(n_clusters=4)


def test_int4_ranking_quality(data):
    """int4 keeps most of the exact top-10 (the capacity trade is
    quantified, not silent)."""
    rng = np.random.default_rng(29)
    X = _unit(rng.standard_normal((1024, 128)).astype(np.float32))
    q = _unit(X[:8] + 0.01 * rng.standard_normal((8, 128))
              .astype(np.float32))
    idx = _make(X)
    _, i = idx.search(q, SearchConfig(k=10, use_pallas=False))
    exact = np.argsort(-(q @ X.T), axis=1)[:, :10]
    i = np.asarray(i)
    assert (i[:, 0] == np.arange(8)).all()
    overlap = np.mean([len(set(i[r]) & set(exact[r])) for r in range(8)])
    assert overlap >= 6.5, overlap


def test_int4_mesh_load(data, tmp_path):
    """Streaming load with a mesh places the PACKED rows (and their
    scales) row-sharded; sharded search over the loaded store equals the
    pre-save single-device search."""
    from instsearch_tpu.parallel import make_mesh
    X, q = data
    idx = _make(X)
    want_s, want_i = idx.search(q)
    p = str(tmp_path / "idx4_mesh")
    idx.save(p, streaming=True)
    mesh = make_mesh(8)
    idx2 = Index.load(p, mesh=mesh)
    assert idx2.is_int4
    sidx = idx2.to_sharded(mesh=mesh, use_pallas=False)
    s, i = sidx.search(jnp.asarray(q), k=idx.cfg.search.k)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=1e-4, atol=1e-5)
