"""Checkpointing (SURVEY.md §5): orbax for model/whitening pytrees.

The descriptor index itself is stored via ``Index.save`` (flat npz + json
manifest — it is a plain matrix, not a pytree); orbax covers the backbone
variables and training state, where pytree structure matters.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, tree), force=True)


def load_pytree(path: str) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def save_sharded_pytree(path: str, tree: Any) -> None:
    """Persist a pytree of (possibly sharded) jax.Arrays via
    orbax/tensorstore — each shard streams from its own device, no host
    round-trip through a monolithic buffer (SURVEY.md §5 checkpoint row)."""
    import orbax.checkpoint as ocp

    ocp.PyTreeCheckpointer().save(os.path.abspath(path), tree, force=True)


def load_sharded_pytree(path: str, shardings: Any) -> Any:
    """Restore a pytree with target placements: ``shardings`` mirrors the
    tree with a jax.sharding.Sharding per leaf (or None for host numpy).
    Rows land directly on their owning device's memory with the requested
    NamedSharding — a 1M x 512 index loads straight to per-chip HBM."""
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restore_args = jax.tree.map(
        lambda s: ocp.ArrayRestoreArgs(sharding=s), shardings,
        is_leaf=lambda x: x is None)
    return ckptr.restore(os.path.abspath(path), restore_args=restore_args)
