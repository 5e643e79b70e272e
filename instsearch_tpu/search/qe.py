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


def expand_from_candidates(queries: jax.Array, top_s: jax.Array,
                           neighbors: jax.Array,
                           alpha: float = 3.0,
                           include_query: bool = True) -> jax.Array:
    """THE weighting/normalization definition: ``queries [Q, D]``,
    ``top_s [Q, n]`` (invalid slots -inf), ``neighbors [Q, n, D]`` f32
    (invalid rows zeroed) -> expanded queries [Q, D] f32 unit-norm.
    Shared by the full-matrix oracle, the fused-kernel composite
    (index.py) and the distributed _local_expand so the math cannot
    drift between them.

    ``include_query=False`` drops the ``+ q`` term — the database-side
    augmentation (αDBA, search/dba.py) aggregates a row's neighbors
    where the row ITSELF is among them (self-similarity 1 -> weight 1),
    so adding the query separately would double-count it."""
    q = jnp.asarray(queries, jnp.float32)
    w = jnp.clip(top_s, 0.0, None) ** alpha                       # [Q, n]
    agg = jnp.einsum("qn,qnd->qd", w, neighbors)
    expanded = q + agg if include_query else agg
    norm = jnp.linalg.norm(expanded, axis=-1, keepdims=True)
    return expanded / jnp.maximum(norm, 1e-6)


@partial(jax.jit, static_argnames=("n", "int4"))
def alpha_query_expansion(descriptors: jax.Array, ids: jax.Array,
                          queries: jax.Array, n: int = 10,
                          alpha: float = 3.0,
                          scales: "jax.Array | None" = None,
                          int4: bool = False) -> jax.Array:
    """``descriptors [N_pad, D]`` (padded rows masked via ``ids < 0``),
    ``queries [Q, D]`` -> expanded queries ``[Q, D]`` (f32, unit norm).
    ``scales [1, N_pad]`` dequantizes an int8-stored index; ``int4``
    marks packed nibble-pair storage (queries then match the UNPACKED
    width 2 * descriptors.shape[1]).

    Reference oracle (materializes the [Q, N] score matrix); the
    production composite in Index.search selects the top-n with the fused
    kernel instead and shares expand_from_candidates."""
    q = jnp.asarray(queries, jnp.float32)
    from .bruteforce import masked_scores
    scores = masked_scores(descriptors, q, scales=scales, ids=ids,
                           int4=int4)                             # [Q, N]
    top_s, top_pos = jax.lax.top_k(scores, n)                     # [Q, n]
    neighbors = jnp.take(descriptors, top_pos, axis=0)
    if int4:
        from ..ops.quantize import unpack_int4
        neighbors = (unpack_int4(neighbors).astype(jnp.float32)
                     * jnp.take(scales[0], top_pos)[..., None])
    else:
        neighbors = neighbors.astype(jnp.float32)
        if descriptors.dtype == jnp.int8:
            neighbors = neighbors * jnp.take(scales[0], top_pos)[..., None]
    neighbors = jnp.where((top_s > -jnp.inf)[..., None], neighbors, 0.0)
    return expand_from_candidates(q, top_s, neighbors, alpha)
