"""Fused multi-head attention Pallas kernel for the ViT backbones —
built, tuned, and measured; the XLA path stays the production default.

Hypothesis: at ViT extraction shapes (N = 197 tokens, head dim 64) the
materialized [B, h, N, N] attention logits are the encoder block's
dominant HBM term (models/vit.py already halved it by keeping the
logits bf16: 2,317 -> 2,450 img/s on v5e). The token count is small
enough that an entire attention instance — q/k/v tiles plus the full
[N, N] score matrix in f32 — fits in VMEM at once, so one kernel can
compute the whole thing with ZERO logits traffic to HBM: the degenerate
single-tile case of flash attention (no online-softmax machinery, just
two MXU matmuls around a VPU softmax).

Measured on the real chip (ViT-B/16 GeM extraction, 224², bf16, B=128;
BASELINE.md "ViT fused-attention A/B"):

  grid variant                 standalone/layer   in-model img/s
  (batch, head) grid, 1 head     38.8 ms            1,699
  (batch,) grid, 12 heads         2.46 ms           1,882
  XLA einsum path                   —               2,448   <- wins

Batching all heads into one grid step (batched ``dot_general`` over the
head axis) was 16x faster than the per-(batch, head) grid — 1,536 tiny
[256,64] matmul steps pipeline terribly — yet still loses end-to-end.
XLA's fused attention needs no 197->256 lane padding (1.69x wasted
MXU work in the kernel), keeps q/k/v fused with the surrounding
projections instead of round-tripping them through HBM, and overlaps
across the batch dimension. Verdict: at these shapes attention is not
HBM-bound enough for the logits savings to pay for the lost fusion —
"don't hand-schedule what the compiler already does". The kernel stays
in-tree as the measured negative result and as the starting point for
long-token configs (N in the thousands, where the [N,N] term grows
quadratically and streaming K/V becomes mandatory); ``vit_attention=
'auto'`` resolves to the XLA path (models/vit.py), 'pallas' is an
explicit opt-in for A/B benches and tests.

Numerics match the XLA path: bf16 matmul inputs, f32 logit accumulation
and softmax reduction. Padded key columns (N -> Np rounding up to the
128-lane tile) are masked to -inf before the max/exp; padded query rows
compute garbage that the caller slices off.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = np.float32(-np.inf)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    # one batch item per grid step, ALL heads batched into the dots: the
    # per-(batch, head) variant was 16x slower (see module docstring)
    q = q_ref[0]                                      # [h, Np, hd] bf16
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale    # [h, Np, Np] f32
    np_ = logits.shape[-1]
    if n_valid < np_:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
        logits = jnp.where(col < n_valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [h, Np, hd]
    o_ref[0] = o.astype(o_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(q, k, v, *, interpret: bool):
    b, h, n, hd = q.shape
    np_ = _round_up(n, 128)
    if np_ != n:
        pad = [(0, 0), (0, 0), (0, np_ - n), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    blk = pl.BlockSpec((1, h, np_, hd), lambda i: (i, 0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, n_valid=n,
                          scale=1.0 / float(np.sqrt(hd))),
        grid=(b,),
        in_specs=[blk, blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, h, np_, hd), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :n]


def mha(q, k, v, *, interpret: bool = False):
    """Fused scaled-dot-product attention: ``[B, h, N, hd]`` q/k/v (bf16
    or f32) -> ``[B, h, N, hd]``. Softmax scale is 1/sqrt(hd), applied to
    the f32 logits (numerically identical to scaling q first)."""
    if q.shape != k.shape or q.shape != v.shape:
        raise ValueError(f"q/k/v shapes differ: {q.shape} {k.shape} {v.shape}")
    return _run(q, k, v, interpret=interpret)


def mha_reference(q, k, v):
    """jnp oracle with the kernel's exact numerics (f32 logits/softmax)."""
    hd = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / np.sqrt(hd)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
