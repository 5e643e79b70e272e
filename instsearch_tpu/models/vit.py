"""Flax Vision Transformer backbones, truncated before the classifier head.

Beyond-reference model family (the reference stack is ResNet/VGG —
SURVEY.md C2/C3): modern instance-retrieval descriptors are increasingly
ViT-based (DINO-style self-supervised features, GeM over patch tokens),
and a ViT is the best-case TPU workload — the whole forward is large
dense matmuls that tile straight onto the MXU, with none of the
narrow-channel early conv stages that cap ResNet MFU at these shapes
(docs/ARCHITECTURE.md "Conv kernels").

Design decisions (TPU-first, drop-in with the existing descriptor stack):

- The module returns the **patch-token grid** ``[N, H/p, W/p, D]`` after
  the final encoder LayerNorm (the class token participates in attention
  but is dropped from the output). Every existing pooling op — GeM, MAC,
  R-MAC grids, the regional re-rank store — consumes that NHWC map
  unchanged; GeM/MAC over patch embeddings is the standard ViT retrieval
  recipe.
- Static shapes: the token count is a trace-time constant per input
  size. Inputs whose side is not a multiple of ``patch_size`` lose the
  remainder pixels (VALID patchify), matching conv-stride semantics.
- Position embeddings are stored at the canonical ``image_size`` grid
  (torchvision checkpoint shape) and bilinearly resized **at trace time**
  for any other input grid — multi-scale extraction (ExtractConfig.scales)
  therefore works exactly like the CNN backbones, with no dynamic shapes.
- bf16 matmuls / f32 LayerNorms and softmax: the attention logits and
  normalization statistics stay in f32 (``preferred_element_type``), the
  MXU work runs in bf16 like the rest of the framework (CLAUDE.md
  conventions).
- Module names mirror torchvision's ``vit_b_16`` state_dict layout
  (``conv_proj``, ``class_token``, ``encoder_layer_{i}.ln_1 / qkv /
  out / linear_1 ...``) so ``torch_import.load_torch_vit`` is a
  mechanical key mapping, same as the ResNet/VGG importers.

Dosovitskiy et al., arXiv:2010.11929.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _resolve_attention(attention: str) -> str:
    """'auto' -> the XLA einsum path. The single-tile fused Pallas kernel
    was built and measured IN-MODEL on the chip and lost: 2,448 img/s
    (xla) vs 1,882 (best kernel variant) at ViT-B/224²/B=128 — XLA's
    fused attention avoids the kernel's 197->256 pad and keeps q/k/v
    fused with the projections (kernels/vit_attention.py docstring has
    the full A/B). 'pallas' stays as an explicit opt-in for benches and
    tests; 'flash' is the tiled online-softmax kernel for huge-
    resolution extraction — measured on chip, XLA stays faster through
    9k tokens, but at 16k tokens (2048² images) the XLA path cannot
    compile at any batch size while 'flash' runs (its O(N²) HBM logits
    term is deleted; kernels/vit_attention.py has the full table), so
    'flash' is the explicit opt-in for that regime."""
    if attention == "auto":
        return "xla"
    if attention not in ("xla", "pallas", "flash"):
        raise ValueError(
            f"attention must be auto|xla|pallas|flash, got {attention!r}")
    return attention


def attend(q, k, v, key_mask, dtype):
    """Attention body shared by the in-block path and the sequence-parallel
    runtime (parallel/sp.py): ``q, k, v`` are ``[B, h, N, hd]``; returns
    ``[B, h, N, hd]``.

    Scale q BEFORE the matmul (one fused multiply instead of an O(B·h·N²)
    pass over the logits) and keep the materialized [B,h,N,N] logits in the
    compute dtype: at bf16 that halves the dominant HBM traffic of the block
    (~9 GB/batch of f32 logits at B=128/12 layers, measured 2,317→2,450
    img/s on v5e); the softmax itself still reduces in f32 via the cast
    below, and the f32-dtype (parity) path is numerically unchanged.

    ``key_mask`` (bool ``[N_k]`` or None) excludes padded key positions —
    masked keys get -inf logits so the f32 softmax renormalizes over the
    real tokens exactly (SP pads the token axis to a multiple of the mesh
    axis; a masked softmax over the pad equals the unpadded softmax)."""
    hd = q.shape[-1]
    att = jnp.einsum("bhqd,bhkd->bhqk", q / np.sqrt(hd), k,
                     preferred_element_type=dtype)
    if key_mask is not None:
        att = jnp.where(key_mask[None, None, None, :], att, -jnp.inf)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v)


class EncoderBlock(nn.Module):
    """Pre-LN transformer block: x + MHSA(LN(x)); x + MLP(LN(x)).

    setup-style with the attention split into ``pre_attention`` (LN + qkv
    projection + head reshape) and ``post_attention`` (out projection +
    residual + MLP) apply-methods, so the sequence-parallel runtime
    (parallel/sp.py) can interpose its all_to_all re-sharding between them
    while this module stays the single source of truth for the math."""

    num_heads: int
    mlp_dim: int
    hidden_dim: int
    dtype: Any = jnp.bfloat16
    attention: str = "auto"

    def setup(self):
        d = self.hidden_dim
        if d % self.num_heads:
            raise ValueError(f"hidden dim {d} not divisible by "
                             f"{self.num_heads} heads")
        self.ln_1 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
        self.qkv = nn.Dense(3 * d, dtype=self.dtype)
        self.out = nn.Dense(d, dtype=self.dtype)
        self.ln_2 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
        self.linear_1 = nn.Dense(self.mlp_dim, dtype=self.dtype)
        self.linear_2 = nn.Dense(self.hidden_dim, dtype=self.dtype)

    def pre_attention(self, x):
        """Token-local half: LN1 + qkv projection.
        ``x [B, n, D]`` -> ``(q, k, v)`` each ``[B, n, h, hd]`` (head axis
        NOT yet transposed — SP re-shards it with an all_to_all first)."""
        d = self.hidden_dim
        hd = d // self.num_heads
        y = self.ln_1(x).astype(self.dtype)
        qkv = self.qkv(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = q.shape
        shp = (b, n, self.num_heads, hd)
        return q.reshape(shp), k.reshape(shp), v.reshape(shp)

    def post_attention(self, x, o):
        """Token-local half: out projection + residual + MLP.
        ``o [B, n, D]`` is the merged attention output."""
        x = x + self.out(o)
        y = self.ln_2(x)
        y = self.linear_1(y.astype(self.dtype))
        # torch nn.GELU default is the exact erf form, not tanh
        y = nn.gelu(y, approximate=False)
        return x + self.linear_2(y)

    def __call__(self, x):
        if x.shape[-1] != self.hidden_dim:
            raise ValueError(f"input dim {x.shape[-1]} != "
                             f"hidden_dim {self.hidden_dim}")
        q, k, v = self.pre_attention(x)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        mode = _resolve_attention(self.attention)
        if mode == "pallas":
            # fused single-tile attention kernel: zero logits traffic to
            # HBM, but measured SLOWER in-model than the einsum path —
            # kept as an explicit opt-in (kernels/vit_attention.py has
            # the on-chip A/B and the why)
            from ..kernels.vit_attention import mha
            # interpret mode keeps attention='pallas' runnable in CPU tests
            o = mha(q, k, v, interpret=jax.default_backend() != "tpu")
        elif mode == "flash":
            # tiled online-softmax kernel: the [N, N] logits never touch
            # HBM — wins at long token counts (kernels/vit_attention.py)
            from ..kernels.vit_attention import flash_mha
            o = flash_mha(q, k, v, interpret=jax.default_backend() != "tpu")
        else:
            o = attend(q, k, v, None, self.dtype)
        b, _, n, _ = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, n, self.hidden_dim)
        return self.post_attention(x, o)


class ViT(nn.Module):
    """Truncated ViT: images [N,H,W,3] -> patch-token maps [N,H/p,W/p,D]."""

    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    image_size: int = 224   # canonical pos-embedding grid (checkpoint shape)
    dtype: Any = jnp.bfloat16
    attention: str = "auto"  # auto (= xla) | xla | pallas; pallas is the
                             # measured-slower opt-in kernel, inference-only
                             # (no VJP) — kernels/vit_attention.py

    # setup() instead of a single @nn.compact __call__ so the pipeline
    # runtime (parallel/pp.py) can call embed/finalize as apply-methods
    # and drive the encoder stack itself — ONE source of truth for the
    # math, and the param tree keys are unchanged (attribute names match
    # the old explicit name= strings, so checkpoints and the torch
    # importer are unaffected).
    def setup(self):
        p = self.patch_size
        self.conv_proj = nn.Conv(self.hidden_dim, (p, p), strides=(p, p),
                                 padding="VALID", dtype=self.dtype)
        g0 = self.image_size // p
        self.class_token = self.param(
            "class_token", nn.initializers.zeros,
            (1, 1, self.hidden_dim), jnp.float32)
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(0.02),
            (1, 1 + g0 * g0, self.hidden_dim), jnp.float32)
        for i in range(self.num_layers):
            setattr(self, f"encoder_layer_{i}",
                    EncoderBlock(self.num_heads, self.mlp_dim,
                                 hidden_dim=self.hidden_dim,
                                 dtype=self.dtype,
                                 attention=self.attention))
        self.ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)

    def embed(self, x):
        """Patchify + class token + position embeddings:
        images ``[N,H,W,3]`` -> tokens ``[N, 1+gh*gw, D]``, ``(gh, gw)``
        (grid dims are trace-time constants)."""
        x = x.astype(self.dtype)
        n = x.shape[0]
        p = self.patch_size
        if x.shape[1] < p or x.shape[2] < p:
            raise ValueError(
                f"input {x.shape[1]}x{x.shape[2]} smaller than patch size {p}")
        x = self.conv_proj(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(n, gh * gw, self.hidden_dim)

        g0 = self.image_size // p
        pos = self.pos_embedding
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (g0, g0):
            # trace-time bilinear resize of the canonical grid: scales /
            # odd input sizes keep static shapes (multi-scale extraction)
            grid_pos = jax.image.resize(
                grid_pos.reshape(1, g0, g0, self.hidden_dim),
                (1, gh, gw, self.hidden_dim), method="bilinear",
            ).reshape(1, gh * gw, self.hidden_dim)
        pos = jnp.concatenate([cls_pos, grid_pos], axis=1)

        x = jnp.concatenate(
            [jnp.broadcast_to(self.class_token.astype(self.dtype),
                              (n, 1, self.hidden_dim)), x], axis=1)
        return x + pos.astype(self.dtype), (gh, gw)

    def finalize(self, x, gh: int, gw: int):
        """Final LayerNorm, drop the class token, reshape to the NHWC
        patch grid the descriptor layer pools."""
        n = x.shape[0]
        x = self.ln(x)
        return x[:, 1:].reshape(n, gh, gw, self.hidden_dim).astype(self.dtype)

    def __call__(self, x, train: bool = False):
        x, (gh, gw) = self.embed(x)
        for i in range(self.num_layers):
            x = getattr(self, f"encoder_layer_{i}")(x)
        return self.finalize(x, gh, gw)


def vit_b_16(dtype=jnp.bfloat16, attention: str = "auto") -> ViT:
    return ViT(hidden_dim=768, num_layers=12, num_heads=12, mlp_dim=3072,
               patch_size=16, dtype=dtype, attention=attention)


def vit_l_16(dtype=jnp.bfloat16, attention: str = "auto") -> ViT:
    return ViT(hidden_dim=1024, num_layers=24, num_heads=16, mlp_dim=4096,
               patch_size=16, dtype=dtype, attention=attention)
