"""Hard-negative mining for retrieval fine-tuning (SURVEY.md C17,
arXiv:1711.02512 §4.3): for each anchor, the hardest negatives are the
highest-scoring database descriptors from *other* classes under the
current model — re-mined every epoch as the model moves.

Runs as one jitted top-k over the pool (the same fused scan shape as
serving search) + a host-side class-exclusion filter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mine_hard_negatives(pool: np.ndarray, pool_labels: np.ndarray,
                        anchors: np.ndarray, anchor_labels: np.ndarray,
                        num_negatives: int = 5,
                        overfetch: int = 4) -> np.ndarray:
    """Returns ``[A, num_negatives]`` pool indices: per anchor, the
    top-scoring entries whose label differs from the anchor's.

    ``overfetch`` controls how many candidates are pulled per anchor before
    label filtering (same-class entries get discarded).
    """
    if len(set(np.asarray(anchor_labels).tolist())
           | set(np.asarray(pool_labels).tolist())) < 2:
        raise ValueError("hard-negative mining needs at least 2 classes")
    k = min(num_negatives * overfetch + 1, pool.shape[0])
    scores = jnp.dot(jnp.asarray(anchors), jnp.asarray(pool).T,
                     preferred_element_type=jnp.float32)
    _, top = jax.lax.top_k(scores, k)
    top = np.asarray(top)
    out = np.zeros((len(anchors), num_negatives), np.int64)
    for i in range(len(anchors)):
        picked = [int(j) for j in top[i] if pool_labels[j] != anchor_labels[i]]
        if len(picked) < num_negatives:
            # fill from random different-class entries (tiny pools /
            # duplicate-heavy top-k); np.isin keeps this O(N) instead of
            # an O(N*len(picked)) membership scan per element
            others = np.flatnonzero(pool_labels != anchor_labels[i])
            rng = np.random.default_rng(i)
            extra = rng.permutation(others)
            extra = extra[~np.isin(extra, picked)]
            picked += [int(j)
                       for j in extra[:num_negatives - len(picked)]]
        if not picked:
            raise ValueError(
                f"anchor {i}: no different-class pool entries to mine")
        while len(picked) < num_negatives:   # tiny pools: cycle
            picked += picked[:num_negatives - len(picked)]
        out[i] = picked[:num_negatives]
    return out
