"""Alpha query expansion (SURVEY.md C12; Radenović arXiv:1711.02512 §5).

The expanded query is the L2-normalized, similarity-weighted sum of the
top-n retrieved descriptors plus the original query:

    q' = l2( q + sum_i  max(s_i, 0)^alpha * x_i ),   i in top-n(q)

One jitted program: search + gather + weighted sum all fuse on device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n",))
def alpha_query_expansion(descriptors: jax.Array, ids: jax.Array,
                          queries: jax.Array, n: int = 10,
                          alpha: float = 3.0) -> jax.Array:
    """``descriptors [N_pad, D]`` (padded rows masked via ``ids < 0``),
    ``queries [Q, D]`` -> expanded queries ``[Q, D]`` (f32, unit norm)."""
    q = jnp.asarray(queries, jnp.float32)
    scores = jnp.dot(q.astype(descriptors.dtype), descriptors.T,
                     preferred_element_type=jnp.float32)          # [Q, N]
    scores = jnp.where(ids[None, :] >= 0, scores, -jnp.inf)
    top_s, top_pos = jax.lax.top_k(scores, n)                     # [Q, n]
    neighbors = jnp.take(descriptors, top_pos, axis=0).astype(jnp.float32)
    w = jnp.clip(top_s, 0.0, None) ** alpha                       # [Q, n]
    expanded = q + jnp.einsum("qn,qnd->qd", w, neighbors)
    norm = jnp.linalg.norm(expanded, axis=-1, keepdims=True)
    return expanded / jnp.maximum(norm, 1e-6)
