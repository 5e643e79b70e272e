"""int8 quantized top-k kernel vs int32-accumulation oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.kernels import topk_matmul_int8
from instsearch_tpu.ops.quantize import dequantize_rows, quantize_rows

INTERP = dict(interpret=True)


def _oracle_int8(x_i8, scales, Q, k):
    """Exact replica of the kernel's math in numpy (int32 accumulation)."""
    qf = Q.astype(np.float32)
    q_scale = np.maximum(np.abs(qf).max(axis=1, keepdims=True), 1e-12) / 127.0
    q_i8 = np.clip(np.round(qf / q_scale), -127, 127).astype(np.int8)
    acc = q_i8.astype(np.int32) @ x_i8.astype(np.int32).T      # [B, N]
    scores = acc.astype(np.float32) * q_scale * scales.reshape(1, -1)
    s, i = jax.lax.top_k(jnp.asarray(scores), k)
    return np.asarray(s), np.asarray(i)


def test_int8_matches_oracle(rng):
    X = rng.standard_normal((512, 128)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = rng.standard_normal((3, 128)).astype(np.float32)
    qr = quantize_rows(jnp.asarray(X))
    s, i = topk_matmul_int8(qr.values, qr.scales, jnp.asarray(Q), k=10,
                            tile_n=128, **INTERP)
    ws, wi = _oracle_int8(np.asarray(qr.values), np.asarray(qr.scales), Q, 10)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-5, atol=1e-6)


def test_int8_ranking_close_to_f32(rng):
    """Quantization must preserve the top-1 self-match and mostly preserve
    the top-10 set."""
    X = rng.standard_normal((1024, 256)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = X[:4] + 0.01 * rng.standard_normal((4, 256)).astype(np.float32)
    qr = quantize_rows(jnp.asarray(X))
    s, i = topk_matmul_int8(qr.values, qr.scales, jnp.asarray(Q), k=10,
                            tile_n=256, **INTERP)
    i = np.asarray(i)
    assert (i[:, 0] == np.arange(4)).all()
    exact = np.argsort(-(Q @ X.T), axis=1)[:, :10]
    overlap = np.mean([len(set(i[r]) & set(exact[r])) for r in range(4)])
    assert overlap >= 8.0, overlap


def test_quantize_roundtrip_error_small(rng):
    X = rng.standard_normal((64, 128)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    qr = quantize_rows(jnp.asarray(X))
    back = np.asarray(dequantize_rows(qr))
    err = np.abs(back - X).max()
    assert err < 1.0 / 127.0, err


def test_int8_num_valid_masking(rng):
    X = rng.standard_normal((256, 64)).astype(np.float32)
    X[200:] = 50.0
    Q = rng.standard_normal((2, 64)).astype(np.float32)
    qr = quantize_rows(jnp.asarray(X))
    _, i = topk_matmul_int8(qr.values, qr.scales, jnp.asarray(Q), k=10,
                            num_valid=200, tile_n=64, **INTERP)
    assert np.asarray(i).max() < 200
