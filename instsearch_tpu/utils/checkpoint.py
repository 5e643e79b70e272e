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
