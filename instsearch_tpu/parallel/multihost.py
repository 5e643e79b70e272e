"""Multi-host (DCN) growth path (SURVEY.md §2.2, §5).

One v5e pod slice holds 8 chips; an index beyond ~16M rows x 512 int8 per
chip outgrows it and spans hosts. The design already supports this: the
'shard' mesh axis simply extends across processes — shard_map code,
collectives, and the Pallas kernels are unchanged; XLA routes the
candidate allgathers over ICI within a slice and DCN across slices.

CI exercises the REAL multi-process path: tests/distributed/test_multihost
spawns 2 processes x 4 virtual CPU devices with Gloo-backed collectives
over loopback, each committing only its local row slice
(build_multihost_index), and asserts cross-process search/QE/full-ranking
against the host oracle. On a TPU fleet the same code rides ICI/DCN.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from ..utils import get_logger

log = get_logger("instsearch.multihost")


def _detect_cluster_env() -> "str | None":
    """Name of the env signal indicating a MULTI-host managed cluster, or
    None. Presence alone is not enough: a single TPU host also exports
    TPU_WORKER_HOSTNAMES (one entry) — only >1 participants mean a
    cluster."""
    import os
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        if os.environ.get(var):
            return var
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return "TPU_WORKER_HOSTNAMES"
    for var in ("SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(os.environ.get(var, "1")) > 1:
                return var
        except ValueError:
            pass
    return None


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """``jax.distributed.initialize`` wrapper.

    With no arguments: initializes via JAX's cluster auto-detection when a
    managed multi-host environment is detected (the canonical no-arg call
    on TPU pods / SLURM / OpenMPI), and no-ops on a plain single host —
    skipping auto-detection on a real pod would silently build a
    single-host index that appears to succeed.
    """
    if coordinator_address is None and num_processes in (None, 1) \
            and process_id is None:
        detected = _detect_cluster_env()
        if detected is None:
            log.info("single host, no multi-host cluster env; skipping "
                     "jax.distributed.initialize")
            return
        log.info("cluster env detected (%s); auto-initializing", detected)
        jax.distributed.initialize()
    else:
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


def shard_local_rows(mesh: Mesh, local_rows, axis: str = "shard"):
    """Assemble the global row-sharded array from THIS process's rows.

    Each host builds/loads only its own slice of the index (rows are
    process-major along the mesh axis: process p holds rows
    ``[p*N/P, (p+1)*N/P)``); the returned global jax.Array spans every
    process without any host ever holding the full matrix. Feed the
    result straight to ShardedIndex — its placement logic passes
    already-global arrays through untouched (parallel/mesh.py:place).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_rows))


def local_row_range(n_rows: int) -> tuple[int, int]:
    """[start, stop) of the global row range this process owns, for a mesh
    spanning ALL processes (global_shard_mesh; rows must divide evenly
    across processes — same contract as ShardedIndex's per-shard
    divisibility). Sub-meshes that cover only some processes need their
    own range math — do not use this helper for them."""
    nproc = jax.process_count()
    if n_rows % nproc:
        raise ValueError(f"{n_rows} rows not divisible by {nproc} processes")
    per = n_rows // nproc
    p = jax.process_index()
    return p * per, (p + 1) * per


def build_multihost_index(local_descriptors, ids, mesh: Mesh | None = None,
                          local_scales=None, local_regional=None,
                          local_regional_scales=None, **kw):
    """ShardedIndex spanning every participating process.

    ``local_descriptors`` ([N/P, D], this process's rows — see
    local_row_range), ``ids`` the host-global id vector ([N], identical on
    every process; ids are metadata and stay host-side for full rankings),
    ``local_scales`` the matching [1, N/P] per-row scales for int8 storage,
    ``local_regional`` ([N/P, R, D]) + ``local_regional_scales`` ([N/P, R])
    this process's slice of the regional re-rank store.
    """
    from .sharded_index import ShardedIndex
    mesh = mesh or global_shard_mesh()
    axis = "shard" if "shard" in mesh.axis_names else mesh.axis_names[0]
    desc = shard_local_rows(mesh, local_descriptors, axis)
    scales = None
    if local_scales is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        scales = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(None, axis)), np.asarray(local_scales))
    regional = (shard_local_rows(mesh, local_regional, axis)
                if local_regional is not None else None)
    regional_scales = (shard_local_rows(mesh, local_regional_scales, axis)
                       if local_regional_scales is not None else None)
    return ShardedIndex(desc, np.asarray(ids), mesh=mesh, scales=scales,
                        regional=regional, regional_scales=regional_scales,
                        **kw)
