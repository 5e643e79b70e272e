"""αDBA database-side augmentation (search/dba.py, Index.augment_database)."""
import jax.numpy as jnp
import numpy as np

from instsearch_tpu.config import IndexConfig, PipelineConfig
from instsearch_tpu.index import Index
from instsearch_tpu.search import dba_augment


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _np_dba(X, n, alpha):
    """Independent numpy oracle over valid rows only."""
    scores = X @ X.T
    out = np.zeros_like(X)
    for i in range(len(X)):
        top = np.argsort(-scores[i], kind="stable")[:n]
        w = np.clip(scores[i][top], 0, None) ** alpha
        v = (w[:, None] * X[top]).sum(0)
        out[i] = v / max(np.linalg.norm(v), 1e-6)
    return out


def test_dba_oracle_matches_numpy(rng):
    X = _unit(rng.standard_normal((60, 24)).astype(np.float32))
    n_pad = 64
    Xp = np.zeros((n_pad, 24), np.float32)
    Xp[:60] = X
    ids = np.full(n_pad, -1, np.int32)
    ids[:60] = np.arange(60)
    out = np.asarray(dba_augment(jnp.asarray(Xp), jnp.asarray(ids),
                                 n=5, alpha=3.0))
    want = _np_dba(X, 5, 3.0)
    np.testing.assert_allclose(out[:60], want, rtol=1e-4, atol=1e-5)
    assert (out[60:] == 0).all(), "padding rows must stay zero"


def test_dba_self_is_top1_neighbor(rng):
    # a far-isolated row has only weak neighbors: its augmentation is
    # dominated by the self term (weight 1) and barely moves
    X = _unit(rng.standard_normal((32, 16)).astype(np.float32))
    X[0] = _unit(np.ones(16, np.float32) * np.linspace(1, 2, 16))[None]
    X[1:] = _unit(X[1:] - (X[1:] @ X[0]) [:, None] * X[0])  # orthogonalize
    ids = np.arange(32, dtype=np.int32)
    out = np.asarray(dba_augment(jnp.asarray(X), jnp.asarray(ids), n=5))
    assert float(out[0] @ X[0]) > 0.999


def _make_index(X, dtype="float32", dba_n=0, capacity=0):
    cfg = PipelineConfig(index=IndexConfig(dtype=dtype, row_tile=8,
                                           dba_n=dba_n, capacity=capacity))
    names = [f"im{i}" for i in range(len(X))]
    return Index.from_descriptors(X, names, cfg)


def test_augment_database_matches_oracle(rng):
    X = _unit(rng.standard_normal((100, 24)).astype(np.float32))
    idx = _make_index(X)
    want = np.asarray(dba_augment(idx.descriptors, idx.ids, n=7, alpha=2.0))
    idx.augment_database(n=7, alpha=2.0, chunk=16)   # chunked production path
    got = np.asarray(idx.descriptors.astype(jnp.float32))
    np.testing.assert_allclose(got[:100], want[:100], rtol=1e-4, atol=1e-5)
    # padding rows stay inert: id -1 and zero descriptor
    assert (np.asarray(idx.ids)[100:] == -1).all()
    assert (got[100:] == 0).all()


def test_augment_database_int8(rng):
    X = _unit(rng.standard_normal((80, 32)).astype(np.float32))
    idx = _make_index(X, dtype="int8")
    # oracle on the QUANTIZED matrix (DBA sees int8 scores), requantized
    want_f32 = np.asarray(dba_augment(idx.descriptors, idx.ids, n=5,
                                      scales=idx.scales))
    idx.augment_database(n=5, chunk=32)
    got = (np.asarray(idx.descriptors, np.float32)
           * np.asarray(idx.scales)[0][:, None])
    # got is quantize(want): one quantization step of slack per component
    step = np.abs(want_f32[:80]).max(axis=1, keepdims=True) / 127.0
    assert (np.abs(got[:80] - want_f32[:80]) <= step + 1e-6).all()


def test_dba_improves_cluster_cohesion(rng):
    # two clusters: after DBA every row moves toward its cluster's center,
    # so the WORST within-cluster similarity rises
    ca = _unit(rng.standard_normal(48).astype(np.float32))
    cb = -ca
    A = _unit(ca + 0.45 * rng.standard_normal((25, 48)).astype(np.float32))
    B = _unit(cb + 0.45 * rng.standard_normal((25, 48)).astype(np.float32))
    X = np.concatenate([A, B]).astype(np.float32)
    idx = _make_index(X)
    before = min((A @ A.T).min(), (B @ B.T).min())
    idx.augment_database(n=8)
    Xa = np.asarray(idx.descriptors.astype(jnp.float32))[:50]
    after = min((Xa[:25] @ Xa[:25].T).min(), (Xa[25:] @ Xa[25:].T).min())
    assert after > before


def test_build_config_applies_dba(rng, tmp_path):
    # from_descriptors + explicit augment == what a dba_n config produces
    # through Index.build's post-step; verified via search agreement
    X = _unit(rng.standard_normal((40, 16)).astype(np.float32))
    idx_cfg = _make_index(X, dba_n=6)
    idx_cfg.augment_database()         # what build() runs when dba_n is set
    idx_manual = _make_index(X)
    idx_manual.augment_database(n=6, alpha=3.0)
    np.testing.assert_allclose(
        np.asarray(idx_cfg.descriptors.astype(jnp.float32)),
        np.asarray(idx_manual.descriptors.astype(jnp.float32)),
        rtol=1e-5, atol=1e-6)
    # search still functions and self-retrieval holds on the augmented
    # matrix (queries are the ORIGINAL rows)
    s, ids_out = idx_cfg.search(X[:5])
    assert ids_out.shape == (5, idx_cfg.cfg.search.k)
    assert (ids_out[:, 0] == np.arange(5)).all()


def test_dba_drops_ivf_view(rng):
    X = _unit(rng.standard_normal((96, 16)).astype(np.float32))
    idx = _make_index(X)
    idx.build_ivf(n_clusters=4, nprobe=4)
    assert idx.ivf is not None
    idx.augment_database(n=4)
    assert idx.ivf is None, "stale centroids must not survive augmentation"
