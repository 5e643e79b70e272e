"""Multi-host (DCN) growth path (SURVEY.md §2.2, §5).

One v5e pod slice holds 8 chips; an index beyond ~16M rows x 512 int8 per
chip outgrows it and spans hosts. The design already supports this: the
'shard' mesh axis simply extends across processes — shard_map code,
collectives, and the Pallas kernels are unchanged; XLA routes the
candidate allgathers over ICI within a slice and DCN across slices.

This module is the thin initialization wrapper. It is exercised in CI only
in single-process form (this environment has one host; SURVEY.md §0).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from ..utils import get_logger

log = get_logger("instsearch.multihost")


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """``jax.distributed.initialize`` wrapper; no-op for single-process runs
    (all arguments None and no cluster env detected)."""
    if coordinator_address is None and num_processes in (None, 1):
        log.info("single-process run; skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    log.info("initialized process %d/%d", jax.process_index(),
             jax.process_count())


def global_shard_mesh(axis: str = "shard") -> Mesh:
    """1-D mesh over ALL devices across every participating process.

    Per-process data placement follows the standard JAX multi-host rule:
    each process feeds the shards that live on its local devices
    (jax.make_array_from_process_local_data for the index rows).
    """
    return Mesh(np.array(jax.devices()), (axis,))
