"""Database-side augmentation (αDBA).

Arandjelović & Zisserman, "Three things everyone should know to improve
object retrieval", CVPR 2012 introduced average database augmentation;
the α-weighted variant applies the αQE weighting (Radenović
arXiv:1711.02512 §5, as used database-side by Gordo et al.
arXiv:1610.07940 §5.2) to every DATABASE row offline:

    x_i' = l2( sum_{j in top-n(x_i)}  max(s_ij, 0)^alpha * x_j )

where the top-n of a row includes the row itself (self-similarity 1 ->
weight 1). Every query thereafter scores against the augmented matrix —
a free mAP lift on datasets with connected relevant sets, at zero
query-time cost (the augmentation is one offline batched self-search,
which on TPU runs through the same fused top-k kernel as serving).

This module holds the full-matrix ORACLE; the production path is
``Index.augment_database`` (index.py), which selects neighbors with the
fused Pallas kernel chunk-by-chunk and shares
``qe.expand_from_candidates(include_query=False)`` so the weighting
definition cannot drift between the two.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .qe import expand_from_candidates


@partial(jax.jit, static_argnames=("n",))
def dba_augment(descriptors: jax.Array, ids: jax.Array, n: int = 10,
                alpha: float = 3.0,
                scales: "jax.Array | None" = None) -> jax.Array:
    """Reference oracle: ``descriptors [N_pad, D]`` (padding rows id -1),
    -> augmented rows ``[N_pad, D]`` f32 (padding rows all-zero).

    Materializes the full [N, N] self-similarity matrix — fine for tests
    and small indexes; Index.augment_database is the O(chunk * N)
    production path."""
    from .bruteforce import masked_scores
    x = descriptors.astype(jnp.float32)
    if descriptors.dtype == jnp.int8:
        x = x * scales.reshape(-1, 1)
    scores = masked_scores(descriptors, x, scales=scales, ids=ids)  # [N, N]
    top_s, top_pos = jax.lax.top_k(scores, n)
    neighbors = jnp.take(x, top_pos, axis=0)                    # [N, n, D]
    neighbors = jnp.where((top_s > -jnp.inf)[..., None], neighbors, 0.0)
    out = expand_from_candidates(x, top_s, neighbors, alpha,
                                 include_query=False)
    # padding rows have no positive-score neighbors of their own but may
    # still aggregate garbage through ties at 0 — force them to zero
    return jnp.where((ids >= 0)[:, None], out, 0.0)
