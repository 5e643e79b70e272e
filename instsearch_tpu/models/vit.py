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


class EncoderBlock(nn.Module):
    """Pre-LN transformer block: x + MHSA(LN(x)); x + MLP(LN(x))."""

    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        if d % self.num_heads:
            raise ValueError(f"hidden dim {d} not divisible by "
                             f"{self.num_heads} heads")
        hd = d // self.num_heads
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln_1")(x)
        y = y.astype(self.dtype)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = q.shape

        def heads(t):
            return t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        # scale q BEFORE the matmul (one fused multiply instead of an
        # O(B·h·N²) pass over the logits) and keep the materialized
        # [B,h,N,N] logits in the compute dtype: at bf16 that halves the
        # dominant HBM traffic of the block (~9 GB/batch of f32 logits at
        # B=128/12 layers, measured 2,317→2,450 img/s on v5e); the
        # softmax itself still reduces in f32 via the cast below, and the
        # f32-dtype (parity) path is numerically unchanged
        att = jnp.einsum("bhqd,bhkd->bhqk", q / np.sqrt(hd), k,
                         preferred_element_type=self.dtype)
        att = jax.nn.softmax(att.astype(jnp.float32),
                             axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out")(o)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln_2")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype,
                     name="linear_1")(y.astype(self.dtype))
        # torch nn.GELU default is the exact erf form, not tanh
        y = nn.gelu(y, approximate=False)
        return x + nn.Dense(d, dtype=self.dtype, name="linear_2")(y)


class ViT(nn.Module):
    """Truncated ViT: images [N,H,W,3] -> patch-token maps [N,H/p,W/p,D]."""

    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    image_size: int = 224   # canonical pos-embedding grid (checkpoint shape)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        n, h, w, _ = x.shape
        p = self.patch_size
        if h < p or w < p:
            raise ValueError(f"input {h}x{w} smaller than patch size {p}")
        x = nn.Conv(self.hidden_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="conv_proj")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(n, gh * gw, self.hidden_dim)

        cls = self.param("class_token", nn.initializers.zeros,
                         (1, 1, self.hidden_dim), jnp.float32)
        g0 = self.image_size // p
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, 1 + g0 * g0, self.hidden_dim), jnp.float32)
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
            [jnp.broadcast_to(cls.astype(self.dtype),
                              (n, 1, self.hidden_dim)), x], axis=1)
        x = x + pos.astype(self.dtype)
        for i in range(self.num_layers):
            x = EncoderBlock(self.num_heads, self.mlp_dim, dtype=self.dtype,
                             name=f"encoder_layer_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln")(x)
        # drop the class token; the descriptor layer pools the patch grid
        return x[:, 1:].reshape(n, gh, gw, self.hidden_dim).astype(self.dtype)


def vit_b_16(dtype=jnp.bfloat16) -> ViT:
    return ViT(hidden_dim=768, num_layers=12, num_heads=12, mlp_dim=3072,
               patch_size=16, dtype=dtype)


def vit_l_16(dtype=jnp.bfloat16) -> ViT:
    return ViT(hidden_dim=1024, num_layers=24, num_heads=16, mlp_dim=4096,
               patch_size=16, dtype=dtype)
