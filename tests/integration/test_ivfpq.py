"""IVF-PQ pruned cascade (search/ivfpq.py): exactness at full
probe+depth, residual-coding recall A/B vs the flat PQ tier, composite
routing (QE / regional re-rank), tier exclusivity, mutation
invalidation, persistence, CLI flow."""
import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index
from instsearch_tpu.search.ivfpq import IVFPQView


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _clustered(rng, n_per, centers, d, noise=0.12):
    anchors = _unit(rng, centers, d)
    x = np.repeat(anchors, n_per, axis=0)
    x = x + noise * rng.standard_normal(x.shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _index(x, dtype="float32", capacity=0):
    cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype=dtype, row_tile=8, capacity=capacity),
        search=SearchConfig(k=10, use_pallas=False))
    return Index.from_descriptors(x, [f"im{i}" for i in range(len(x))], cfg)


def test_full_probe_full_depth_equals_bruteforce(rng):
    # nprobe = C covers every bucket (+ spill always scanned), depth >= N
    # admits every row, and the exact re-score restores the brute-force
    # ranking — the cascade's exactness anchor
    x = _unit(rng, 256, 32)
    q = _unit(rng, 7, 32)
    idx = _index(x)
    v = IVFPQView.from_index(idx, n_clusters=8, nprobe=8, m=4,
                             depth=256, cap_factor=0.75)
    assert v.spill_codes.shape[0] > 0   # sub-mean cap forces spill coverage
    s, ids = v.search(idx, q, k=10, depth=256, nprobe=8)
    want = np.argsort(-(q @ x.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ids, want)
    np.testing.assert_allclose(
        s, np.sort(q @ x.T, axis=1)[:, ::-1][:, :10], rtol=1e-3, atol=1e-3)


def test_residual_coding_beats_flat_pq(rng):
    # the reason codes quantize residuals: within-cluster structure is
    # much smaller than unit-norm rows, so 4 bits go further — candidate
    # recall at the same depth must not fall below the flat PQ tier's
    from instsearch_tpu.search.pq_view import PQView
    x = _clustered(rng, n_per=64, centers=16, d=64)
    idx = _index(x)
    q = x[rng.choice(len(x), 16, replace=False)]
    q = q + 0.02 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    flat = PQView.from_index(idx, m=8, iters=10, depth=64)
    v = IVFPQView.from_index(idx, n_clusters=16, nprobe=16, m=8,
                             pq_iters=10, depth=64)
    r_flat = flat.measure_recall(idx, q, k=10, depth=64)
    r_res = v.measure_recall(idx, q, k=10, depth=64, nprobe=16)
    assert r_res >= r_flat - 1e-9, (r_res, r_flat)
    assert r_res > 0.9, r_res


def test_pruning_recall_tradeoff(rng):
    # recall grows with nprobe; full probe + deep depth reaches 1.0 on
    # this corpus (exact re-score: end recall == candidate recall)
    x = _clustered(rng, n_per=64, centers=16, d=32, noise=0.4)
    idx = _index(x)
    v = IVFPQView.from_index(idx, n_clusters=16, nprobe=4, m=4,
                             depth=256)
    la, lb = rng.integers(0, 16, 20), rng.integers(0, 16, 20)
    anchors = x[::64]
    q = 0.5 * anchors[la] + 0.5 * anchors[lb] \
        + 0.05 * rng.standard_normal((20, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    r1 = v.measure_recall(idx, q, k=10, nprobe=1, depth=256)
    r_full = v.measure_recall(idx, q, k=10, nprobe=16, depth=1024)
    assert r_full == pytest.approx(1.0)
    assert r1 < r_full
    assert v.scan_fraction(1) < v.scan_fraction(16)


def test_index_routing_and_composites(rng):
    # build_ivfpq arms ivfpq_nprobe; Index.search routes through the view
    # and the full-probe/full-depth composite (incl. QE) equals the exact
    # composite exactly
    x = _clustered(rng, n_per=32, centers=8, d=32)
    idx = _index(x)
    q = _unit(rng, 5, 32)
    exact_s, exact_i = idx.search(q)
    v = idx.build_ivfpq(n_clusters=8, nprobe=8, m=4, depth=len(x))
    assert idx.cfg.search.ivfpq_nprobe == 8
    s, i = idx.search(q)
    np.testing.assert_array_equal(i, exact_i)
    np.testing.assert_allclose(s, exact_s, rtol=1e-4, atol=1e-4)

    qe_cfg = idx.cfg.search.replace(qe_enabled=True, qe_n=3)
    s_pq, i_pq = idx.search(q, qe_cfg)
    s_ex, i_ex = idx.search(q, qe_cfg.replace(ivfpq_nprobe=0))
    np.testing.assert_array_equal(i_pq, i_ex)
    np.testing.assert_allclose(s_pq, s_ex, rtol=1e-4, atol=1e-4)

    # partial probe still returns well-formed results
    s2, i2 = idx.search(q, idx.cfg.search.replace(ivfpq_nprobe=2))
    assert s2.shape == (5, 10) and (i2[:, 0] >= 0).all()


def test_rerank_through_ivfpq(rng):
    # regional re-rank composes by position: full-probe IVF-PQ rerank ==
    # exact rerank verbatim
    from instsearch_tpu.search.rerank import regional_rerank_scores
    import jax.numpy as jnp
    x = _clustered(rng, n_per=32, centers=8, d=32)
    idx = _index(x)
    r = 4
    regional = rng.standard_normal((len(x), r, 32)).astype(np.float32)
    regional /= np.linalg.norm(regional, axis=2, keepdims=True)
    idx.regional = jnp.asarray(regional)
    q = _unit(rng, 3, 32)
    qreg = rng.standard_normal((3, r, 32)).astype(np.float32)

    idx.build_ivfpq(n_clusters=8, nprobe=8, m=4, depth=len(x))
    cfg = idx.cfg.search.replace(rerank_enabled=True, rerank_depth=40)
    s_v, i_v = idx.search(q, cfg, query_regional=qreg)

    scores = q @ x.T
    s_o, i_o = regional_rerank_scores(
        jnp.asarray(regional), idx.ids, jnp.asarray(scores),
        jnp.asarray(qreg), depth=40, k=10)
    np.testing.assert_array_equal(i_v, np.asarray(i_o))
    np.testing.assert_allclose(s_v, np.asarray(s_o), rtol=1e-4, atol=1e-4)


def test_tier_exclusivity(rng):
    x = _unit(rng, 128, 16)
    idx = _index(x)
    idx.build_ivf(n_clusters=4, nprobe=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        idx.build_ivfpq(n_clusters=4, m=2)
    idx2 = _index(x)
    idx2.build_pq(m=2, depth=32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        idx2.build_ivfpq(n_clusters=4, m=2)
    idx3 = _index(x)
    idx3.build_ivfpq(n_clusters=4, m=2, depth=32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        idx3.build_ivf(n_clusters=4)


def test_mutation_invalidates_view(rng):
    x = _unit(rng, 128, 16)
    idx = _index(x, capacity=256)
    idx.build_ivfpq(n_clusters=4, m=2, depth=32)
    assert idx.ivfpq is not None
    y = _unit(rng, 8, 16)
    idx.add(descriptors=y, names=[f"new{i}" for i in range(8)])
    # add() ABSORBS: residual spill codes under the frozen quantizer
    # (test_view_absorb_add.py pins the contract) ...
    assert idx.ivfpq is not None
    _, ids = idx.ivfpq.search(idx, y[:2], k=3)
    assert (ids[:, 0] == np.array([128, 129])).all()
    # ... and remove() is ABSORBED too (positions remap/tombstone;
    # test_view_absorb_remove.py pins exactness)
    idx.remove(["new0"])
    assert idx.ivfpq is not None
    _, ids = idx.ivfpq.search(idx, y[1:2], k=3)
    assert ids[0, 0] == 129


def test_save_load_roundtrip(tmp_path, rng):
    x = _clustered(rng, n_per=32, centers=4, d=16)
    idx = _index(x)
    idx.build_ivfpq(n_clusters=4, nprobe=2, m=2, depth=48)
    q = _unit(rng, 4, 16)
    s1, i1 = idx.search(q)
    idx.save(str(tmp_path / "idx"))
    back = Index.load(str(tmp_path / "idx"))
    assert back.ivfpq is not None
    assert back.cfg.search.ivfpq_nprobe == 2
    assert back.ivfpq.depth == 48
    s2, i2 = back.search(q)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_measure_recall_ignores_attached_view(rng):
    # the r4 IVF lesson, pinned for this tier too: the exact reference
    # must reset EVERY candidate-tier routing field, or the view defines
    # its own truth and recall reads a vacuous 1.0
    x = _clustered(rng, n_per=64, centers=16, d=32, noise=0.5)
    idx = _index(x)
    v = idx.build_ivfpq(n_clusters=16, nprobe=1, m=4, depth=64)
    la, lb = rng.integers(0, 16, 20), rng.integers(0, 16, 20)
    anchors = x[::64]
    q = 0.5 * anchors[la] + 0.5 * anchors[lb] \
        + 0.05 * rng.standard_normal((20, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    r1 = v.measure_recall(idx, q, k=10, nprobe=1)
    assert r1 < 0.95, "nprobe=1 on boundary queries must be lossy"

    idx2 = _index(x)
    free = IVFPQView.from_index(idx2, n_clusters=16, nprobe=1, m=4,
                                depth=64)
    assert free.measure_recall(idx2, q, k=10, nprobe=1) == \
        pytest.approx(r1)


def test_int8_store(rng):
    x = _clustered(rng, n_per=40, centers=8, d=32)
    idx = _index(x, dtype="int8")
    v = idx.build_ivfpq(n_clusters=8, nprobe=8, m=4, depth=len(x))
    q = _unit(rng, 4, 32)
    s, i = idx.search(q)
    s_ex, i_ex = idx.search(q, idx.cfg.search.replace(ivfpq_nprobe=0))
    np.testing.assert_array_equal(i, i_ex)
    np.testing.assert_allclose(s, s_ex, rtol=1e-4, atol=1e-4)


def test_cli_ivfpq_flow(tmp_path):
    """build-index --ivfpq -> query (view + exact override) -> ivfpq
    survives update-index rebuild."""
    import glob as _glob

    from instsearch_tpu.cli import main
    from instsearch_tpu.eval import make_mini_dataset

    mini = make_mini_dataset(str(tmp_path / "mini"), seed=7)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem",
                              image_size=64, batch_size=8, dtype="float32"),
        search=SearchConfig(k=3, use_pallas=False))
    cfg_path = str(tmp_path / "cfg.json")
    cfg.save(cfg_path)
    idx_dir = str(tmp_path / "idx")
    img_dir = str(tmp_path / "mini" / "jpg")

    rc = main(["build-index", "--images", img_dir, "--out", idx_dir,
               "--config", cfg_path, "--ivfpq", "--ivf-clusters", "4",
               "--nprobe", "2", "--pq-m", "4", "--pq-depth", "16"])
    assert rc == 0
    idx = Index.load(idx_dir)
    assert idx.ivfpq is not None and idx.ivfpq.m == 4
    assert idx.cfg.search.ivfpq_nprobe == 2

    some_img = sorted(_glob.glob(img_dir + "/*.jpg"))[0]
    rc = main(["query", "--index", idx_dir, "--image", some_img, "-k", "3"])
    assert rc == 0
    rc = main(["query", "--index", idx_dir, "--image", some_img,
               "--ivfpq-nprobe", "0"])
    assert rc == 0

    # --ivfpq with --pq is rejected up front
    rc = main(["build-index", "--images", img_dir,
               "--out", str(tmp_path / "idx2"), "--config", cfg_path,
               "--ivfpq", "--pq"])
    assert rc == 2


# ---------------------------------------------------------------------------
# OPQ rotation in residual space (build_ivfpq(opq_iters=), ops/pq.fit_opq)

def _clustered_aniso(rng, n_per, centers, d, decay=0.9, noise=0.3):
    """Clusters whose WITHIN-cluster spread is spectrum-decayed through a
    shared random basis — the residual-space analog of the flat tier's
    `_anisotropic` corpus (real descriptor residuals after PCA-whitening
    look like this): plain residual PQ wastes code entropy on the
    correlated axes, the learned rotation recovers it."""
    anchors = _unit(rng, centers, d)
    spec = (decay ** np.arange(d)).astype(np.float32)
    basis, _ = np.linalg.qr(rng.standard_normal((d, d)))
    z = rng.standard_normal((centers * n_per, d)).astype(np.float32)
    x = np.repeat(anchors, n_per, axis=0) \
        + noise * (z * spec) @ basis.astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_opq_full_probe_equals_bruteforce(rng):
    # the exactness anchor must hold with a rotation attached: the ADC
    # admits every row at full probe+depth and the exact re-score (which
    # never sees the rotation) restores the brute-force ranking
    x = _clustered_aniso(rng, n_per=32, centers=8, d=32)
    q = _unit(rng, 7, 32)
    idx = _index(x)
    v = IVFPQView.from_index(idx, n_clusters=8, nprobe=8, m=4,
                             depth=256, opq_iters=3, pq_iters=6)
    assert v.rotation is not None
    s, ids = v.search(idx, q, k=10, depth=256, nprobe=8)
    want = np.argsort(-(q @ x.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ids, want)


def test_opq_residual_recall_beats_plain(rng):
    x = _clustered_aniso(rng, n_per=128, centers=16, d=64)
    idx = _index(x)
    q = x[rng.choice(len(x), 16, replace=False)]
    q = q + 0.02 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    plain = IVFPQView.from_index(idx, n_clusters=16, nprobe=16, m=8,
                                 pq_iters=10, depth=32)
    opq = IVFPQView.from_index(idx, n_clusters=16, nprobe=16, m=8,
                               pq_iters=10, depth=32, opq_iters=5)
    r_plain = plain.measure_recall(idx, q, k=10, depth=32, nprobe=16)
    r_opq = opq.measure_recall(idx, q, k=10, depth=32, nprobe=16)
    assert r_opq >= r_plain, (r_opq, r_plain)
    assert r_opq > 0.8, r_opq


def test_opq_persistence(tmp_path, rng):
    x = _clustered_aniso(rng, n_per=32, centers=4, d=16)
    idx = _index(x)
    idx.build_ivfpq(n_clusters=4, nprobe=2, m=2, depth=48, opq_iters=2,
                    pq_iters=6)
    assert idx.ivfpq.rotation is not None
    q = _unit(rng, 4, 16)
    s1, i1 = idx.search(q)
    idx.save(str(tmp_path / "idx"))
    back = Index.load(str(tmp_path / "idx"))
    assert back.ivfpq.rotation is not None
    np.testing.assert_allclose(np.asarray(back.ivfpq.rotation),
                               np.asarray(idx.ivfpq.rotation))
    s2, i2 = back.search(q)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)
