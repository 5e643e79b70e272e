"""Anisotropic (score-aware) PQ — ops/pq.py fit_apq/encode_apq.

Validates the ScaNN loss implementation (Guo et al., ICML 2020,
arXiv:1908.10396) three ways: the t=0 degenerate case is exactly plain
MSE assignment; the alternation never increases its own loss; and on
the MIPS regime it was built for (queries pointing along database rows)
the score-aware codebook strictly reduces the parallel-direction
quantization error that vanilla PQ ignores.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.ops.pq import (PQCodebook, _apq_assign_sweep, _apq_loss,
                                   _apq_prep, _apq_update_sweep, decode_pq,
                                   encode_apq, encode_pq, eta_from_threshold,
                                   fit_apq, fit_pq, pq_lut, unpack_pq)


def _unit_rows(rng, n, d, centers=12, sigma=0.15):
    """Clustered unit-norm rows — the descriptor-like fixture."""
    c = rng.standard_normal((centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    x = (c[rng.integers(0, centers, n)]
         + sigma * rng.standard_normal((n, d)).astype(np.float32))
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_eta_from_threshold():
    assert eta_from_threshold(0.0, 512) == 1.0
    e1, e2 = eta_from_threshold(0.1, 512), eta_from_threshold(0.3, 512)
    assert 1.0 < e1 < e2
    with pytest.raises(ValueError):
        eta_from_threshold(1.0, 512)
    with pytest.raises(ValueError):
        eta_from_threshold(-0.1, 512)


def _nearest_codes_f32(x, cent):
    """Plain per-subspace nearest-centroid assignment, f32 numpy oracle
    (encode_pq itself assigns through bf16 matmuls, so it can differ on
    near-ties — the oracle matches the f32 CD sweep's precision)."""
    n, d = x.shape
    m, k, ds = cent.shape
    xs = x.reshape(n, m, ds)
    out = np.empty((n, m), np.int32)
    for mi in range(m):
        d2 = (np.sum((xs[:, mi, None, :] - cent[mi][None]) ** 2, axis=-1))
        out[:, mi] = np.argmin(d2, axis=1)
    return out


def test_t0_encode_matches_plain_pq():
    """η = 1 ⇒ the CD assignment is the plain nearest-centroid argmin."""
    rng = np.random.default_rng(0)
    x = _unit_rows(rng, 512, 32)
    cb = fit_pq(jnp.asarray(x), m=4, iters=4)
    a = np.asarray(unpack_pq(encode_apq(jnp.asarray(x), cb, t=0.0)))
    b = _nearest_codes_f32(x, np.asarray(cb.centroids))
    assert (a == b).all()


def test_loss_non_increasing_over_sweeps():
    rng = np.random.default_rng(1)
    x = _unit_rows(rng, 1024, 32)
    m, k = 4, 16
    cb = fit_pq(jnp.asarray(x), m=m, iters=3)
    eta = eta_from_threshold(0.2, x.shape[1])
    ym, dm, gam = _apq_prep(jnp.asarray(x), jnp.asarray(x), m, eta)
    cent = cb.centroids
    codes, t = _apq_assign_sweep(ym, dm, jnp.zeros_like(gam), cent,
                                 jnp.zeros((m, 1024), jnp.int32),
                                 jnp.zeros((m, 1024), jnp.float32), k=k)
    prev = float(_apq_loss(ym, dm, gam, cent, codes))
    for _ in range(4):
        codes, t = _apq_assign_sweep(ym, dm, gam, cent, codes, t, k=k)
        after_assign = float(_apq_loss(ym, dm, gam, cent, codes))
        assert after_assign <= prev + 1e-4 * abs(prev)
        cent, t = _apq_update_sweep(ym, dm, gam, cent, codes, t, k=k)
        after_update = float(_apq_loss(ym, dm, gam, cent, codes))
        assert after_update <= after_assign + 1e-4 * abs(after_assign)
        prev = after_update
    # the carried t stays consistent with (codes, cent)
    t_ref = np.stack([
        np.sum((np.asarray(ym[i]) - np.asarray(cent[i])[np.asarray(codes[i])])
               * np.asarray(dm[i]), axis=-1)
        for i in range(m)])
    np.testing.assert_allclose(np.asarray(t), t_ref, rtol=1e-4, atol=1e-5)


def test_apq_reduces_parallel_and_top_item_score_error():
    """The headline property, measured in the regime it was built for:
    E[⟨r, x⟩²] (the score error for queries pointing along x — what MIPS
    ranking of the TRUE match feels) drops several-fold vs vanilla PQ,
    and the raw-ADC score error AT the exact nearest neighbor of
    near-duplicate queries (this framework's query model) drops with it.

    What it does NOT claim (measured flat, see ops/pq.py docs): cascade
    candidate recall at depth ≫ k — competitor items y with q ∦ y feel
    the ENLARGED orthogonal error, which cancels the win when an exact
    re-score follows anyway. APQ is the quality lever for ADC-only
    serving, not for the re-scored cascade."""
    rng = np.random.default_rng(2)
    d, m = 64, 8
    x = _unit_rows(rng, 8192, d)
    xj = jnp.asarray(x)
    cb_pq = fit_pq(xj, m=m, iters=8)
    codes_pq = encode_pq(xj, cb_pq)
    cb_apq = fit_apq(xj, m=m, t=0.2, init_iters=8, sweeps=6)
    codes_apq = encode_apq(xj, cb_apq, t=0.2)

    def par_err(cb, codes):
        r = x - np.asarray(decode_pq(codes, cb))
        return float(np.mean(np.sum(r * x, axis=1) ** 2))

    e_pq, e_apq = par_err(cb_pq, codes_pq), par_err(cb_apq, codes_apq)
    assert e_apq < 0.5 * e_pq, (e_apq, e_pq)

    # near-duplicate queries; score error at the true nearest neighbor
    tgt = rng.integers(0, len(x), 64)
    q = x[tgt] + 0.10 * rng.standard_normal((64, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    exact = q @ x.T
    nn = np.argmax(exact, axis=1)

    def adc(cb, codes):
        lut = np.asarray(pq_lut(jnp.asarray(q), cb))         # [B, M, K]
        c = np.asarray(unpack_pq(codes))                     # [N, M]
        mi = np.arange(m)[None, :]
        return np.stack([l[mi, c].sum(-1) for l in lut])     # [B, N]

    rows = np.arange(64)
    s_pq, s_apq = adc(cb_pq, codes_pq), adc(cb_apq, codes_apq)
    be_pq = np.mean(np.abs(s_pq[rows, nn] - exact[rows, nn]))
    be_apq = np.mean(np.abs(s_apq[rows, nn] - exact[rows, nn]))
    assert be_apq < 0.75 * be_pq, (be_apq, be_pq)
    # raw-ADC top-1 must not degrade
    t1_pq = np.mean(np.argmax(s_pq, 1) == nn)
    t1_apq = np.mean(np.argmax(s_apq, 1) == nn)
    assert t1_apq >= t1_pq - 0.02, (t1_apq, t1_pq)


def test_residual_space_directions():
    """IVF-PQ usage: quantize residuals y with directions = original x.
    Shapes flow, loss is finite, and the t=0 path reduces to plain
    residual PQ encoding."""
    rng = np.random.default_rng(3)
    d, m = 32, 4
    x = _unit_rows(rng, 1024, d)
    coarse = x[rng.integers(0, 16, 1024)] * 0.9           # fake centroids
    res = jnp.asarray(x - coarse)
    cb = fit_apq(res, m=m, directions=jnp.asarray(x), t=0.2, sweeps=3,
                 init_iters=3)
    assert cb.centroids.shape == (m, 16, d // m)
    assert bool(jnp.isfinite(cb.centroids).all())
    packed = encode_apq(res, cb, directions=jnp.asarray(x), t=0.2)
    assert packed.shape == (1024, m // 2)
    a0 = np.asarray(unpack_pq(encode_apq(res, cb, directions=jnp.asarray(x),
                                         t=0.0)))
    b0 = _nearest_codes_f32(np.asarray(res), np.asarray(cb.centroids))
    assert (a0 == b0).all()
    with pytest.raises(ValueError):
        fit_apq(res, m=m, directions=jnp.asarray(x[:100]))


def test_fit_apq_num_valid_and_chunked_encode():
    rng = np.random.default_rng(4)
    x = _unit_rows(rng, 600, 32)
    xp = np.concatenate([x, np.zeros((24, 32), np.float32)])
    cb = fit_apq(jnp.asarray(xp), m=4, num_valid=600, sweeps=2,
                 init_iters=3)
    assert bool(jnp.isfinite(cb.centroids).all())
    # chunked encode == one-shot encode
    one = np.asarray(encode_apq(jnp.asarray(x), cb, chunk=600))
    many = np.asarray(encode_apq(jnp.asarray(x), cb, chunk=100))
    assert (one == many).all()
