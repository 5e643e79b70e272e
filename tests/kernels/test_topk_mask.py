"""Subset-mask operand of the fused top-k kernels (search/subset.py).

The mask is a [1, N] int8 allow-list that ANDs into the kernels'
position-validity predicate — filtered selection must EXACTLY equal the
oracle restricted to the allowed rows, across all four kernels
(bf16/f32, int8, int4, PQ-ADC). Interpret mode on the CPU rig; the same
programs compile via Mosaic on the real chip (verify drives / bench).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.kernels import (topk_matmul, topk_matmul_int4,
                                    topk_matmul_int8)
from instsearch_tpu.kernels.pq_scan import pq_topk
from instsearch_tpu.ops.pq import decode_pq, encode_pq, fit_pq
from instsearch_tpu.ops.quantize import quantize_rows, quantize_rows_int4

INTERP = dict(interpret=True)


def _unit(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _mask(rng, n, frac=0.5):
    m = (rng.random(n) < frac)
    m[:2] = [True, False]                 # both states always present
    return m


def _oracle_masked(scores, allow, k):
    s = np.where(allow[None, :], scores, -np.inf)
    si = jax.lax.top_k(jnp.asarray(s), k)
    return np.asarray(si[0]), np.asarray(si[1])


@pytest.mark.parametrize("n,d,b,k,tile", [
    (256, 64, 1, 10, 64),
    (512, 128, 4, 16, 128),
    (264, 128, 2, 5, 8),                  # N multiple of 8 only
])
def test_bf16_kernel_mask(rng, n, d, b, k, tile):
    X = _unit(rng, (n, d))
    Q = _unit(rng, (b, d))
    allow = _mask(rng, n)
    mask = jnp.asarray(allow[None, :].astype(np.int8))
    s, i = topk_matmul(jnp.asarray(X), jnp.asarray(Q), k=k, tile_n=tile,
                       mask=mask, **INTERP)
    ws, wi = _oracle_masked(Q @ X.T, allow, k)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-4, atol=1e-4)
    assert allow[np.asarray(i)].all()     # every returned row is allowed


def test_mask_with_num_valid(rng):
    """Mask and padding compose: the predicate is (pos < nv) AND mask."""
    X = _unit(rng, (256, 64))
    X[200:] = 100.0                       # poisoned padding region
    Q = _unit(rng, (2, 64))
    allow = _mask(rng, 256)
    allow[190:] = True                    # mask alone would admit padding
    mask = jnp.asarray(allow[None, :].astype(np.int8))
    s, i = topk_matmul(jnp.asarray(X), jnp.asarray(Q), k=10, num_valid=200,
                       tile_n=64, mask=mask, **INTERP)
    i = np.asarray(i)
    assert i.max() < 200
    ws, wi = _oracle_masked(Q @ X[:200].T, allow[:200], 10)
    np.testing.assert_array_equal(i, wi)


def test_mask_smaller_than_k(rng):
    X = _unit(rng, (64, 32))
    Q = _unit(rng, (1, 32))
    allow = np.zeros(64, bool)
    allow[[3, 17, 40]] = True
    mask = jnp.asarray(allow[None, :].astype(np.int8))
    s, i = topk_matmul(jnp.asarray(X), jnp.asarray(Q), k=10, tile_n=32,
                       mask=mask, **INTERP)
    i, s = np.asarray(i)[0], np.asarray(s)[0]
    assert set(i[:3]) == {3, 17, 40}
    assert (i[3:] == -1).all() and (s[3:] == -np.inf).all()


def test_empty_mask(rng):
    X = _unit(rng, (64, 32))
    Q = _unit(rng, (2, 32))
    mask = jnp.zeros((1, 64), jnp.int8)
    s, i = topk_matmul(jnp.asarray(X), jnp.asarray(Q), k=5, tile_n=32,
                       mask=mask, **INTERP)
    assert (np.asarray(i) == -1).all() and (np.asarray(s) == -np.inf).all()


def test_int8_kernel_mask(rng):
    X = _unit(rng, (512, 128))
    Q = _unit(rng, (3, 128))
    allow = _mask(rng, 512)
    qr = quantize_rows(jnp.asarray(X))
    mask = jnp.asarray(allow[None, :].astype(np.int8))
    s, i = topk_matmul_int8(qr.values, qr.scales, jnp.asarray(Q), k=10,
                            tile_n=128, mask=mask, **INTERP)
    # unfiltered kernel over the same store, oracle-masked afterwards:
    # the FULL top-10 over allowed rows must match (the kernel's int8
    # math is identical; only the predicate differs)
    s_all, i_all = topk_matmul_int8(qr.values, qr.scales, jnp.asarray(Q),
                                    k=512, tile_n=512, **INTERP)
    keep = allow[np.asarray(i_all)]
    want = [row_i[row_k][:10] for row_i, row_k in zip(np.asarray(i_all), keep)]
    np.testing.assert_array_equal(np.asarray(i), np.stack(want))
    assert allow[np.asarray(i)].all()


def test_int4_kernel_mask(rng):
    X = _unit(rng, (512, 128))
    Q = _unit(rng, (2, 128))
    allow = _mask(rng, 512)
    qr = quantize_rows_int4(jnp.asarray(X))
    mask = jnp.asarray(allow[None, :].astype(np.int8))
    s, i = topk_matmul_int4(qr.values, qr.scales, jnp.asarray(Q), k=10,
                            tile_n=128, mask=mask, **INTERP)
    s_all, i_all = topk_matmul_int4(qr.values, qr.scales, jnp.asarray(Q),
                                    k=512, tile_n=512, **INTERP)
    keep = allow[np.asarray(i_all)]
    want = [row_i[row_k][:10] for row_i, row_k in zip(np.asarray(i_all), keep)]
    np.testing.assert_array_equal(np.asarray(i), np.stack(want))


def test_pq_kernel_mask(rng):
    x = _unit(rng, (512, 64))
    q = _unit(rng, (2, 64))
    allow = _mask(rng, 512)
    cb = fit_pq(jnp.asarray(x), m=8, iters=5)
    packed = encode_pq(jnp.asarray(x), cb)
    mask = jnp.asarray(allow[None, :].astype(np.int8))
    s, i = pq_topk(packed, jnp.asarray(q), cb, k=10, tile_n=128, mask=mask,
                   interpret=True)
    xh = np.asarray(decode_pq(packed, cb))
    ws, wi = _oracle_masked(q @ xh.T, allow, 10)
    assert allow[np.asarray(i)].all()
    np.testing.assert_allclose(np.asarray(s), ws, rtol=2e-2, atol=2e-2)
    agree = (np.asarray(i) == wi).mean()
    assert agree > 0.9, f"id agreement {agree}"


def test_mask_none_unchanged(rng):
    """mask=None must produce byte-identical results to the pre-mask
    kernel (the default path carries no mask operand at all)."""
    X = _unit(rng, (256, 64))
    Q = _unit(rng, (2, 64))
    s0, i0 = topk_matmul(jnp.asarray(X), jnp.asarray(Q), k=10, tile_n=64,
                         **INTERP)
    s1, i1 = topk_matmul(jnp.asarray(X), jnp.asarray(Q), k=10, tile_n=64,
                         mask=None, **INTERP)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
