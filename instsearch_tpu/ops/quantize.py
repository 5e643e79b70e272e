"""Symmetric per-row int8 quantization of descriptors.

Halves the index's HBM footprint and bandwidth vs bf16 (the query scan is
HBM-bound, so ~2x faster and ~2x more rows per chip) at negligible ranking
loss for unit-norm descriptors — the standard production trade.

score(q, x) = (q_i8 . x_i8) * q_scale * x_scale   (int32 accum on the MXU)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedRows(NamedTuple):
    values: jax.Array   # int8 [N, D]
    scales: jax.Array   # f32 [1, N] — lane-major for kernel streaming


@jax.jit
def quantize_rows(x: jax.Array) -> QuantizedRows:
    """Per-row symmetric int8: scale = max|row| / 127."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)          # [N, 1]
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return QuantizedRows(values=q, scales=scale.reshape(1, -1))


@jax.jit
def dequantize_rows(qr: QuantizedRows) -> jax.Array:
    return qr.values.astype(jnp.float32) * qr.scales.reshape(-1, 1)
