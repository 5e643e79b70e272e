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
from jax.experimental.pallas import tpu as pltpu

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


_FLASH_NEG = np.float32(-1e30)   # finite mask: -inf would NaN the online
#                                  rescale on fully-padded KV blocks


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s,
                  *, n_valid: int, scale: float, kv_block: int):
    """One (batch, q-block, kv-step) grid cell of flash attention
    (arXiv:2205.14135, forward): all heads batched into the dots (the
    per-head grid measured 16x slower at ViT shapes — module docstring),
    online max/sum carried in VMEM scratch across the sequential kv axis
    exactly like the top-k kernel carries its running heap."""
    ik = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, _FLASH_NEG)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[0]                                       # [h, qb, hd]
    k = k_ref[0]                                       # [h, kvb, hd]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale    # [h, qb, kvb] f32
    col = ik * kv_block + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, 2)
    logits = jnp.where(col < n_valid, logits, _FLASH_NEG)

    m_old = m_s[:]                                     # [h, qb, 1]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - m_new)
    corr = jnp.exp(m_old - m_new)                      # [h, qb, 1]
    l_s[:] = corr * l_s[:] + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [h, qb, hd]
    acc_s[:] = corr * acc_s[:] + pv
    m_s[:] = m_new

    @pl.when(ik == nkv - 1)
    def _emit():
        o_ref[0] = (acc_s[:] / l_s[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block", "kv_block",
                                              "interpret"))
def _run_flash(q, k, v, *, q_block: int, kv_block: int, interpret: bool):
    b, h, n, hd = q.shape
    np_ = _round_up(n, max(q_block, kv_block))
    if np_ != n:
        pad = [(0, 0), (0, 0), (0, np_ - n), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    qblk = pl.BlockSpec((1, h, q_block, hd),
                        lambda ib, iq, ik: (ib, 0, iq, 0))
    kvblk = pl.BlockSpec((1, h, kv_block, hd),
                         lambda ib, iq, ik: (ib, 0, ik, 0))
    out = pl.pallas_call(
        functools.partial(_flash_kernel, n_valid=n,
                          scale=1.0 / float(np.sqrt(hd)),
                          kv_block=kv_block),
        grid=(b, np_ // q_block, np_ // kv_block),
        in_specs=[qblk, kvblk, kvblk],
        out_specs=qblk,
        out_shape=jax.ShapeDtypeStruct((b, h, np_, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, q_block, 1), jnp.float32),
            pltpu.VMEM((h, q_block, 1), jnp.float32),
            pltpu.VMEM((h, q_block, hd), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :n]


def flash_mha(q, k, v, *, q_block: int = 256, kv_block: int = 128,
              interpret: bool = False):
    """Tiled flash attention for LONG token counts (high-resolution ViT
    extraction): the [N, N] logits never touch HBM — KV streams through
    VMEM in ``block``-sized tiles with the online-softmax rescale. The
    single-tile ``mha`` above needs the whole [h, Np, Np] score matrix in
    VMEM (64 MB at 1025 tokens — cannot even compile past ~600 tokens);
    this is its scaling form.

    Measured in-model on the chip (ViT-B/16 GeM extraction, bf16;
    BASELINE.md "ViT flash-attention high-res"):

      tokens (size)      xla img/s   flash img/s
       1,025 (512²)        289.2       199.6
       2,305 (768²)         85.0        66.3
       4,097 (1024²)        25.8        27.8   <- flash wins +7.7%
       9,217 (1536²)         8.17        7.02
      16,385 (2048²)        OOM          2.48  <- flash is the ONLY path

    On *throughput* XLA's fused attention keeps winning almost
    everywhere (same fusion/pipelining story as the single-tile A/B
    above); the kernel's real payoff is MEMORY — it deletes the O(N²)
    HBM term entirely, and at 16k tokens the XLA path cannot compile at
    ANY batch size (the f32 softmax temporaries alone need 24 GB vs
    15.75 GB HBM) while this kernel extracts 2048² images at 2.48 img/s.
    So 'flash' stays an explicit opt-in for huge-resolution extraction
    rather than an auto-selected default. Forward-only (no VJP) —
    extraction is inference; training keeps the XLA path.

    Block sizing: the [h, q_block, kv_block] f32 logits chain (mask/exp/
    rescale temporaries stack ~4 deep in scoped VMEM) must stay well
    under the 16 MB limit — 256×256 measured 17 MB and 512×128 16.5 MB,
    both failed to compile (384×128 was *worse*, 21.1 MB — non-power-of-
    two sublane tiling); 256×128 fits with room for the double-buffered
    KV stream."""
    if q.shape != k.shape or q.shape != v.shape:
        raise ValueError(f"q/k/v shapes differ: {q.shape} {k.shape} {v.shape}")
    return _run_flash(q, k, v, q_block=q_block, kv_block=kv_block,
                      interpret=interpret)


def mha_reference(q, k, v):
    """jnp oracle with the kernel's exact numerics (f32 logits/softmax)."""
    hd = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / np.sqrt(hd)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
