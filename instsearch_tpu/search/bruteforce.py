"""Brute-force cosine top-k search, XLA oracle path (SURVEY.md C11).

The Pallas fused kernel (kernels/topk_matmul.py) is the production path;
this jnp implementation is the correctness oracle and the CPU fallback.
Descriptors are L2-normalized, so dot product == cosine similarity.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def search_topk(index: jax.Array, queries: jax.Array, k: int = 10):
    """``index: [N, D]``, ``queries: [Q, D]`` -> ``(scores [Q,k], ids [Q,k])``.

    Matmul runs on the MXU in the index dtype (bf16 for the stored index)
    with f32 accumulation; top-k via jax.lax.top_k on the f32 scores.
    """
    scores = jnp.dot(queries.astype(index.dtype), index.T,
                     preferred_element_type=jnp.float32)  # [Q, N]
    return jax.lax.top_k(scores, k)


@jax.jit
def all_scores(index: jax.Array, queries: jax.Array) -> jax.Array:
    """Full score matrix [Q, N] in f32 (used by evaluation, which needs the
    complete ranking, and by αQE)."""
    return jnp.dot(queries.astype(index.dtype), index.T,
                   preferred_element_type=jnp.float32)
