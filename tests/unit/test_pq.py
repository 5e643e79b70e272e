"""PQ codebook fit / encode / decode / LUT vs numpy oracles."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.ops.pq import (PQCodebook, decode_pq, encode_pq, fit_pq,
                                   pq_lut, unpack_pq)


def _rows(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_pack_unpack_roundtrip(rng):
    # direct nibble layout check: encode with a known codebook, unpack,
    # and verify against a numpy re-encode
    x = _rows(rng, 64, 32)
    cb = fit_pq(jnp.asarray(x), m=4, iters=4)
    packed = encode_pq(jnp.asarray(x), cb)
    assert packed.shape == (64, 2) and packed.dtype == jnp.int8
    codes = np.asarray(unpack_pq(packed))
    assert codes.min() >= 0 and codes.max() < 16
    # numpy oracle assignment
    cent = np.asarray(cb.centroids)                      # [M, 16, ds]
    xs = x.reshape(64, 4, 8)
    d2 = ((xs[:, :, None, :] - cent[None]) ** 2).sum(-1)  # [N, M, 16]
    np.testing.assert_array_equal(codes, d2.argmin(-1))


def test_decode_matches_numpy_gather(rng):
    x = _rows(rng, 48, 32)
    cb = fit_pq(jnp.asarray(x), m=4, iters=4)
    packed = encode_pq(jnp.asarray(x), cb)
    codes = np.asarray(unpack_pq(packed))
    cent = np.asarray(cb.centroids)
    want = np.stack([cent[m, codes[:, m]] for m in range(4)], axis=1)
    np.testing.assert_allclose(np.asarray(decode_pq(packed, cb)),
                               want.reshape(48, 32), rtol=1e-6)


def test_lut_scoring_equals_decoded_dot(rng):
    # ADC identity: sum_m lut[m, c_m] == q . decode(codes), exactly the
    # quantity the scan kernel computes
    x = _rows(rng, 128, 64)
    q = _rows(rng, 5, 64)
    cb = fit_pq(jnp.asarray(x), m=8, iters=6)
    packed = encode_pq(jnp.asarray(x), cb)
    codes = np.asarray(unpack_pq(packed))                # [N, M]
    lut = np.asarray(pq_lut(jnp.asarray(q), cb))         # [B, M, 16]
    # explicit loop oracle (clearer than fancy indexing)
    want = np.asarray(decode_pq(packed, cb)) @ q.T       # [N, B]
    got = np.zeros((5, 128), np.float32)
    for b in range(5):
        for m in range(8):
            got[b] += lut[b, m, codes[:, m]]
    np.testing.assert_allclose(got, want.T, rtol=1e-4, atol=1e-5)


def _clustered_rows(rng, n, d, n_clusters=16, noise=0.05):
    """Instance-retrieval-like synthetic data: rows concentrate around a
    few directions (i.i.d. gaussian rows are the rate-distortion WORST
    case — 4 bits/8 dims can provably keep only half the energy there,
    and top-k among them is noise; neither resembles image descriptors)."""
    centers = _rows(rng, n_clusters, d)
    idx = rng.integers(0, n_clusters, size=n)
    x = centers[idx] + noise * rng.standard_normal((n, d)).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def test_fit_reduces_distortion(rng):
    x = _clustered_rows(rng, 512, 64)
    cb1 = fit_pq(jnp.asarray(x), m=8, iters=1, seed=3)
    cb9 = fit_pq(jnp.asarray(x), m=8, iters=12, seed=3)

    def distortion(cb):
        xh = np.asarray(decode_pq(encode_pq(jnp.asarray(x), cb), cb))
        return ((x - xh) ** 2).sum(1).mean()

    assert distortion(cb9) <= distortion(cb1) + 1e-6
    # 12 Lloyd iters on clustered data must reconstruct unit-norm rows
    # with most of their energy intact (one subspace alone cannot name
    # all clusters — the PRODUCT across subspaces is what ranks; ranking
    # quality is test_recall_against_exact)
    assert distortion(cb9) < 0.25


def test_padding_rows_ignored_in_fit(rng):
    x = _rows(rng, 256, 32)
    xpad = np.concatenate([x, np.full((256, 32), 7.0, np.float32)])
    cb = fit_pq(jnp.asarray(x), m=4, iters=5, seed=1)
    cbp = fit_pq(jnp.asarray(xpad), m=4, num_valid=256, iters=5, seed=1)
    np.testing.assert_allclose(np.asarray(cb.centroids),
                               np.asarray(cbp.centroids), atol=2e-2)


def test_dim_validation(rng):
    x = jnp.asarray(_rows(rng, 32, 30))
    with pytest.raises(ValueError, match="not divisible"):
        fit_pq(x, m=4)
    with pytest.raises(ValueError, match="must be even"):
        fit_pq(jnp.asarray(_rows(rng, 32, 33)), m=3)
    with pytest.raises(ValueError, match="k must be 16"):
        fit_pq(jnp.asarray(_rows(rng, 32, 32)), m=4, k=256)


def test_recall_against_exact(rng):
    # What lossy PQ must preserve as the COARSE tier of a coarse→exact
    # cascade: (a) cluster identity — ADC's top results come from the
    # query's own instance cluster; (b) candidate recall — exact top-10
    # survive in the ADC top-100 pool the refine tier re-scores. It need
    # NOT preserve fine ordering among near-duplicates (ADC error ~0.4
    # energy exceeds the 0.05-noise separations; refine restores order).
    n = 2048
    centers = _rows(rng, 16, 64)
    labels = rng.integers(0, 16, size=n)
    x = centers[labels] + 0.05 * rng.standard_normal((n, 64)).astype(
        np.float32)
    x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
    qi = rng.integers(0, n, size=8)
    q = x[qi]
    cb = fit_pq(jnp.asarray(x), m=8, iters=10)
    xh = np.asarray(decode_pq(encode_pq(jnp.asarray(x), cb), cb))
    adc_rank = np.argsort(-(xh @ q.T), axis=0)           # [N, B]
    same_cluster = np.mean(labels[adc_rank[:10]] == labels[qi][None])
    assert same_cluster > 0.95, f"cluster recall@10 = {same_cluster}"
    exact = np.argsort(-(x @ q.T), axis=0)[:10]
    pool = adc_rank[:100]
    rec = np.mean([len(set(exact[:, b]) & set(pool[:, b])) / 10.0
                   for b in range(8)])
    assert rec > 0.6, f"exact-top-10 recall in ADC top-100 = {rec}"


def _anisotropic(rng, n, d, decay=0.9):
    """OPQ's win case: a decaying spectrum viewed through a random
    orthogonal basis — every contiguous D/M slice mixes strong and weak
    directions, so plain PQ wastes code entropy that a learned rotation
    recovers (Ge et al. CVPR 2013 §1)."""
    z = rng.standard_normal((n, d)).astype(np.float32)
    spec = (decay ** np.arange(d)).astype(np.float32)
    basis, _ = np.linalg.qr(rng.standard_normal((d, d)))
    x = (z * spec) @ basis.astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_opq_rotation_is_orthogonal(rng):
    from instsearch_tpu.ops.pq import fit_opq
    x = _anisotropic(rng, 512, 32)
    r, cb = fit_opq(jnp.asarray(x), m=4, opq_iters=3, pq_iters=6,
                    refine_iters=2, seed=0)
    assert r.shape == (32, 32)
    np.testing.assert_allclose(np.asarray(r).T @ np.asarray(r),
                               np.eye(32), atol=1e-5)
    assert cb.m == 4


def test_opq_reduces_reconstruction_error(rng):
    # measured on this construction: plain mse ~0.41, OPQ ~0.16 — the
    # margin asserts the alternation actually learned a useful rotation,
    # not just a permutation of the identity
    from instsearch_tpu.ops.pq import fit_opq, pq_reconstruction_mse
    x = jnp.asarray(_anisotropic(rng, 4096, 64))
    cb_p = fit_pq(x, m=8, iters=12, seed=0)
    r, cb_o = fit_opq(x, m=8, opq_iters=6, pq_iters=12, refine_iters=4,
                      seed=0)
    mse_p = pq_reconstruction_mse(x, cb_p)
    mse_o = pq_reconstruction_mse(x, cb_o, rotation=r)
    assert mse_o < 0.7 * mse_p, (mse_o, mse_p)


def test_opq_adc_identity_with_rotation(rng):
    # the scoring identity the view relies on: ADC with the ROTATED query
    # over codes of X.R equals (q.R) . decode(codes) exactly — i.e. the
    # rotation changes only which codes exist, never the ADC math
    from instsearch_tpu.ops.pq import fit_opq
    x = _anisotropic(rng, 256, 32)
    q = _rows(rng, 3, 32)
    r, cb = fit_opq(jnp.asarray(x), m=4, opq_iters=2, pq_iters=6,
                    refine_iters=2, seed=1)
    xr = jnp.asarray(x) @ r
    packed = encode_pq(xr, cb)
    qr = q @ np.asarray(r)
    lut = np.asarray(pq_lut(jnp.asarray(qr), cb))
    codes = np.asarray(unpack_pq(packed))
    want = np.asarray(decode_pq(packed, cb)) @ qr.T      # [N, B]
    got = np.zeros((3, 256), np.float32)
    for b in range(3):
        for m in range(4):
            got[b] += lut[b, m, codes[:, m]]
    np.testing.assert_allclose(got, want.T, rtol=1e-4, atol=1e-5)


def test_default_m_even_and_divides():
    from instsearch_tpu.ops.pq import default_m
    for d in (16, 56, 64, 96, 512, 2048):
        m = default_m(d)
        assert m % 2 == 0 and d % m == 0 and m >= 2
        assert m <= max(2, d // 8)
    assert default_m(56) == 4          # the scaled-preset dim that broke
    assert default_m(512) == 64
    with pytest.raises(ValueError, match="no even"):
        default_m(15)
