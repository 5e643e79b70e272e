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


# ---------------------------------------------------------------------------
# int4: two descriptor components per byte — 4x the rows of bf16 per chip
# and half the scan bytes of int8, at a further (measurable, small for
# unit-norm descriptors) ranking loss. Split-half nibble layout: byte j of
# a row packs component j in the LOW nibble and component j + D/2 in the
# HIGH nibble, so unpacking needs no interleave. The dot product is
# order-invariant as long as query and row agree on the layout, and every
# consumer unpacks through unpack_int4, so they always do.
#
# The low nibble is stored with a +8 OFFSET (value in [1, 15]); the high
# nibble is plain two's complement: byte = 16*hi + (lo + 8). This makes
# the scan kernel's unpack nearly free on the VPU:
#   * hi = byte >> 4 exactly (arithmetic shift; the offset low nibble is
#     a non-negative remainder) — ONE elementwise op per tile,
#   * lo never materializes: q_lo·lo = q_lo·byte − 16·(q_lo·hi) − 8·Σq_lo,
#     i.e. two extra int8 MXU matmuls (free in a bandwidth-bound scan)
#     plus a per-query scalar, instead of 6 more VPU passes over the tile
#     (measured on-chip: the pass-heavy unpack erased int4's bandwidth
#     advantage over int8).
#
#   score(q, x) = (q_i8 . x_i4) * q_scale * x_scale,  x_scale = max|row|/7

class QuantizedRowsInt4(NamedTuple):
    values: jax.Array   # int8 [N, D//2], two nibbles per byte
    scales: jax.Array   # f32 [1, N]


@jax.jit
def quantize_rows_int4(x: jax.Array) -> QuantizedRowsInt4:
    """Per-row symmetric int4: scale = max|row| / 7; D must be even."""
    xf = x.astype(jnp.float32)
    n, d = xf.shape
    if d % 2:
        raise ValueError(f"int4 packing needs even D, got {d}")
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)          # [N, 1]
    scale = jnp.maximum(absmax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(xf / scale), -7, 7).astype(jnp.int32)
    lo = q[:, :d // 2] + 8                # offset low nibble, in [1, 15]
    hi = q[:, d // 2:]
    return QuantizedRowsInt4(values=(hi * 16 + lo).astype(jnp.int8),
                             scales=scale.reshape(1, -1))


def unpack_int4(packed: jax.Array) -> jax.Array:
    """int8 [..., D//2] packed nibbles -> int8 [..., D] components in
    logical order (split-half offset layout, see above). Pure elementwise
    + concat: usable inside jit and shard_map."""
    b = packed.astype(jnp.int32)
    hi = b >> 4                    # arithmetic shift: exact signed hi
    lo = (b & 0xF) - 8             # remove the storage offset
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)


@jax.jit
def dequantize_rows_int4(qr: QuantizedRowsInt4) -> jax.Array:
    return (unpack_int4(qr.values).astype(jnp.float32)
            * qr.scales.reshape(-1, 1))
