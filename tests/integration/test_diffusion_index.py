"""Diffusion re-ranking through Index.search (descriptor-level; the
extraction stack is covered by the quality-stack suite — diffusion only
consumes descriptors, so these build via from_descriptors)."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.config import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index
from instsearch_tpu.search.diffusion import diffusion_rerank_scores


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _diff_cfg(**kw):
    base = dict(k=5, diffusion_enabled=True, diffusion_depth=24,
                diffusion_knn=6, diffusion_iters=25, use_pallas=False)
    base.update(kw)
    return SearchConfig(**base)


def _make(X, scfg, dtype="float32"):
    cfg = PipelineConfig(index=IndexConfig(dtype=dtype, row_tile=16),
                         search=scfg)
    names = [f"im{i}" for i in range(len(X))]
    return Index.from_descriptors(X, names, cfg)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    X = _unit(rng.standard_normal((120, 32)).astype(np.float32))
    q = _unit(X[:4] + 0.05 * rng.standard_normal((4, 32))
              .astype(np.float32))
    return X, q


def test_search_diffusion_matches_oracle(data):
    X, q = data
    scfg = _diff_cfg()
    idx = _make(X, scfg)
    s, i = idx.search(q)
    # full-matrix oracle over the SAME padded store
    full = np.full((q.shape[0], idx.descriptors.shape[0]), -np.inf,
                   np.float32)
    full[:, :len(X)] = q @ X.T
    s_o, i_o = diffusion_rerank_scores(
        idx.descriptors, idx.ids, jnp.asarray(full),
        depth=scfg.diffusion_depth, k=scfg.k, knn=scfg.diffusion_knn,
        alpha=scfg.diffusion_alpha, iters=scfg.diffusion_iters,
        seeds=scfg.diffusion_seeds)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_o))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_o),
                               rtol=1e-4, atol=1e-5)
    # the self row stays in the returned top-k (diffusion may re-rank
    # within the neighborhood but never drops the strongest seed)
    for qi in range(4):
        assert qi in np.asarray(i)[qi]


def test_search_diffusion_int8(data):
    """int8 storage: composite dequantizes candidate rows before building
    the graph; result equals the oracle over the dequantized matrix."""
    X, q = data
    scfg = _diff_cfg()
    idx = _make(X, scfg, dtype="int8")
    s, i = idx.search(q)
    full = np.full((q.shape[0], idx.descriptors.shape[0]), -np.inf,
                   np.float32)
    deq = (np.asarray(idx.descriptors, np.float32)
           * np.asarray(idx.scales)[0][:, None])
    full[:, :len(X)] = q @ deq[:len(X)].T
    s_o, i_o = diffusion_rerank_scores(
        idx.descriptors, idx.ids, jnp.asarray(full),
        depth=scfg.diffusion_depth, k=scfg.k, knn=scfg.diffusion_knn,
        alpha=scfg.diffusion_alpha, iters=scfg.diffusion_iters,
        seeds=scfg.diffusion_seeds, scales=idx.scales)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_o))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_o),
                               rtol=1e-3, atol=1e-4)


def test_diffusion_composes_with_qe(data):
    """qe_enabled + diffusion_enabled: the expanded query drives the
    candidate scan, then diffusion re-ranks — same as handing the oracle
    the expanded query's scores."""
    X, q = data
    scfg = _diff_cfg(qe_enabled=True, qe_n=5)
    idx = _make(X, scfg)
    s, i = idx.search(q)
    # oracle: expand first (shared definition), then diffuse
    from instsearch_tpu.search.qe import alpha_query_expansion
    q_exp = alpha_query_expansion(idx.descriptors, idx.ids,
                                  jnp.asarray(q), n=5, alpha=scfg.qe_alpha)
    full1 = np.full((q.shape[0], idx.descriptors.shape[0]), -np.inf,
                    np.float32)
    full1[:, :len(X)] = np.asarray(q_exp) @ X.T
    s_o, i_o = diffusion_rerank_scores(
        idx.descriptors, idx.ids, jnp.asarray(full1),
        depth=scfg.diffusion_depth, k=scfg.k, knn=scfg.diffusion_knn,
        alpha=scfg.diffusion_alpha, iters=scfg.diffusion_iters,
        seeds=scfg.diffusion_seeds)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_o))


def test_diffusion_rerank_mutually_exclusive(data):
    X, q = data
    scfg = _diff_cfg(rerank_enabled=True)
    idx = _make(X, scfg)
    with pytest.raises(ValueError, match="mutually"):
        idx.search(q)


def test_diffusion_forces_exact_scan_over_ivf(data):
    """With an IVF view attached, diffusion still takes the exact fused
    scan (the top-depth neighborhood IS the graph) — results equal the
    no-IVF index."""
    X, q = data
    idx = _make(X, _diff_cfg())
    want_s, want_i = idx.search(q)
    idx2 = _make(X, _diff_cfg())
    idx2.build_ivf(n_clusters=4, nprobe=1)
    idx2.cfg = idx2.cfg.replace(search=idx2.cfg.search.replace(
        ivf_nprobe=1))
    s, i = idx2.search(q)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-6)
