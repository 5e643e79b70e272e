"""Device-mesh helpers (SURVEY.md §2.2).

Two logical axes cover this framework's parallelism:
  'data'  — batch data-parallel extraction / training (DP)
  'shard' — index row-sharding for distributed search

The same code path must serve 1 real chip (this environment) and an
8-device CPU test mesh (tests/conftest.py) and a real v5e-8 slice.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "shard") -> Mesh:
    """1-D mesh over the first ``num_devices`` devices."""
    devs = jax.devices()
    n = num_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def default_data_mesh() -> Mesh | None:
    """The default DP-extraction mesh: all local devices over 'data' when
    more than one is visible, else None (single-device path). ONE policy
    for Index.build and ResumableBuilder — change it here, not per-caller.
    Uses local_devices: in a multi-process job jax.devices() includes
    non-addressable devices this host cannot feed batches to."""
    devs = jax.local_devices()
    if len(devs) <= 1:
        return None
    return Mesh(np.array(devs), ("data",))


def make_mesh_2d(data: int, shard: int) -> Mesh:
    devs = jax.devices()
    if data * shard > len(devs):
        raise ValueError(f"requested {data}x{shard} devices, have {len(devs)}")
    arr = np.array(devs[:data * shard]).reshape(data, shard)
    return Mesh(arr, ("data", "shard"))


def shard_rows(mesh: Mesh, x: jax.Array, axis: str = "shard") -> jax.Array:
    """Place a [N, ...] array row-sharded across the mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, x) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P()))
