"""int4 packed top-k kernel vs int32-accumulation oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.kernels import topk_matmul_int4
from instsearch_tpu.ops.quantize import (dequantize_rows_int4,
                                         quantize_rows_int4, unpack_int4)

INTERP = dict(interpret=True)


def _np_quant4(X):
    """Independent numpy replica of quantize_rows_int4 (unpacked values)."""
    absmax = np.maximum(np.abs(X).max(axis=1, keepdims=True), 1e-12)
    scale = absmax / 7.0
    q = np.clip(np.round(X / scale), -7, 7).astype(np.int32)
    return q, scale


def _oracle_int4(X, Q, k):
    """Exact replica of the kernel's math in numpy: int8 query x int4
    rows, int32 accumulation, scale product."""
    x4, x_scale = _np_quant4(X)
    qf = Q.astype(np.float32)
    q_scale = np.maximum(np.abs(qf).max(axis=1, keepdims=True), 1e-12) / 127.0
    q_i8 = np.clip(np.round(qf / q_scale), -127, 127).astype(np.int32)
    acc = q_i8 @ x4.T                                            # [B, N]
    scores = acc.astype(np.float32) * q_scale * x_scale.reshape(1, -1)
    s, i = jax.lax.top_k(jnp.asarray(scores), k)
    return np.asarray(s), np.asarray(i)


def test_pack_unpack_roundtrip(rng):
    X = rng.standard_normal((32, 64)).astype(np.float32)
    qr = quantize_rows_int4(jnp.asarray(X))
    assert np.asarray(qr.values).shape == (32, 32)   # two per byte
    want, scale = _np_quant4(X)
    got = np.asarray(unpack_int4(qr.values))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(np.asarray(qr.scales).reshape(-1, 1),
                               scale, rtol=1e-6)
    # full nibble range survives the round trip, including -7 and +7
    extremes = jnp.asarray(np.array([[7, -7] * 32], np.float32))
    qe = quantize_rows_int4(extremes)
    np.testing.assert_array_equal(np.asarray(unpack_int4(qe.values)),
                                  np.array([[7, -7] * 32]))


def test_dequantize_error_bound(rng):
    X = rng.standard_normal((64, 128)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    qr = quantize_rows_int4(jnp.asarray(X))
    back = np.asarray(dequantize_rows_int4(qr))
    # one int4 step = absmax/7; error <= half a step per component
    step = np.abs(X).max(axis=1, keepdims=True) / 7.0
    assert (np.abs(back - X) <= step / 2 + 1e-6).all()


def test_int4_matches_oracle(rng):
    X = rng.standard_normal((512, 128)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = rng.standard_normal((3, 128)).astype(np.float32)
    qr = quantize_rows_int4(jnp.asarray(X))
    s, i = topk_matmul_int4(qr.values, qr.scales, jnp.asarray(Q), k=10,
                            tile_n=128, **INTERP)
    ws, wi = _oracle_int4(X, Q, 10)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-5, atol=1e-6)


def test_int4_batched_large_k(rng):
    """B x k shape that exercises the 16-round extraction tier and the
    rolled dense merge (k > 16)."""
    X = rng.standard_normal((1024, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = rng.standard_normal((8, 64)).astype(np.float32)
    qr = quantize_rows_int4(jnp.asarray(X))
    s, i = topk_matmul_int4(qr.values, qr.scales, jnp.asarray(Q), k=32,
                            tile_n=256, **INTERP)
    ws, wi = _oracle_int4(X, Q, 32)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-5, atol=1e-6)


def test_int4_ranking_close_to_f32(rng):
    """int4 keeps the top-1 self-match and most of the top-10 set for
    unit-norm descriptors (coarser than int8 — the capacity trade)."""
    X = rng.standard_normal((1024, 256)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = X[:4] + 0.01 * rng.standard_normal((4, 256)).astype(np.float32)
    qr = quantize_rows_int4(jnp.asarray(X))
    s, i = topk_matmul_int4(qr.values, qr.scales, jnp.asarray(Q), k=10,
                            tile_n=256, **INTERP)
    i = np.asarray(i)
    assert (i[:, 0] == np.arange(4)).all()
    exact = np.argsort(-(Q @ X.T), axis=1)[:, :10]
    overlap = np.mean([len(set(i[r]) & set(exact[r])) for r in range(4)])
    assert overlap >= 6.5, overlap


def test_int4_num_valid_masking(rng):
    X = rng.standard_normal((256, 64)).astype(np.float32)
    X[200:] = 50.0
    Q = rng.standard_normal((2, 64)).astype(np.float32)
    qr = quantize_rows_int4(jnp.asarray(X))
    _, i = topk_matmul_int4(qr.values, qr.scales, jnp.asarray(Q), k=10,
                            num_valid=200, tile_n=64, **INTERP)
    assert np.asarray(i).max() < 200


def test_int4_rejects_dim_mismatch(rng):
    X = rng.standard_normal((64, 32)).astype(np.float32)
    qr = quantize_rows_int4(jnp.asarray(X))
    Q = jnp.asarray(rng.standard_normal((1, 48)).astype(np.float32))
    with pytest.raises(ValueError, match="packed"):
        topk_matmul_int4(qr.values, qr.scales, Q, k=5, tile_n=32, **INTERP)
