"""Brute-force cosine top-k search, XLA oracle path (SURVEY.md C11).

The Pallas fused kernel (kernels/topk_matmul.py) is the production path;
this jnp implementation is the correctness oracle and the CPU fallback.
Descriptors are L2-normalized, so dot product == cosine similarity.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def masked_scores(descriptors: jax.Array, queries: jax.Array,
                  scales: "jax.Array | None" = None,
                  ids: "jax.Array | None" = None,
                  int4: bool = False) -> jax.Array:
    """[Q, N] f32 scores — THE one scoring definition (float,
    int8-with-row-scales, or packed-int4 storage; padding rows masked to
    -inf when ``ids`` is given). index.py and search/qe.py delegate here
    so the dequant and padding-mask semantics cannot drift between paths.
    ``int4=True`` marks ``descriptors`` as [N, D//2] nibble pairs
    (ops/quantize.quantize_rows_int4) — indistinguishable from int8 by
    dtype."""
    if int4:
        from ..ops.quantize import unpack_int4
        rows = unpack_int4(descriptors).astype(jnp.float32)
        scores = jnp.dot(queries.astype(jnp.float32), rows.T,
                         preferred_element_type=jnp.float32) * scales
    elif descriptors.dtype == jnp.int8:
        scores = jnp.dot(queries.astype(jnp.float32),
                         descriptors.T.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scales
    else:
        scores = jnp.dot(queries.astype(descriptors.dtype), descriptors.T,
                         preferred_element_type=jnp.float32)
    if ids is not None:
        scores = jnp.where(ids[None, :] >= 0, scores, -jnp.inf)
    return scores


@partial(jax.jit, static_argnames=("k",))
def search_topk(index: jax.Array, queries: jax.Array, k: int = 10,
                ids: "jax.Array | None" = None):
    """``index: [N, D]``, ``queries: [Q, D]`` -> ``(scores [Q,k], ids [Q,k])``.

    Matmul runs on the MXU in the index dtype (bf16 for the stored index)
    with f32 accumulation; top-k via jax.lax.top_k on the f32 scores.
    Pass ``ids`` when the matrix carries padding rows (id -1): per repo
    convention they must be masked to -inf before any top-k — an unpadded
    research matrix can omit it.
    """
    scores = masked_scores(index, queries, ids=ids)       # [Q, N]
    return jax.lax.top_k(scores, k)


@jax.jit
def all_scores(index: jax.Array, queries: jax.Array) -> jax.Array:
    """Full score matrix [Q, N] in f32 (used by evaluation, which needs the
    complete ranking, and by αQE)."""
    return masked_scores(index, queries)
