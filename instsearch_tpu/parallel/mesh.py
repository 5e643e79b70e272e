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


def make_mesh_dp_tp(data: int, model: int) -> Mesh:
    """DP x TP mesh for tensor-parallel ViT extraction (parallel/tp.py):
    batch sharded over 'data', Megatron weight split over 'model'. The
    'model' axis is innermost so the per-block psums ride the
    fastest-varying ICI dimension."""
    devs = jax.devices()
    if data * model > len(devs):
        raise ValueError(f"requested {data}x{model} devices, have {len(devs)}")
    arr = np.array(devs[:data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def place(mesh: Mesh, x, spec: P) -> jax.Array:
    """Commit ``x`` to NamedSharding(mesh, spec), multi-host-safe.

    Single-process meshes use plain device_put. When the mesh spans
    processes (multi-host growth path, parallel/multihost.py), device_put
    of host data onto non-addressable devices is illegal — each process
    instead contributes its addressable shards via make_array_from_callback
    (``x`` must then be the host-global value, identical on every process;
    arrays already globally placed pass through untouched).
    """
    s = NamedSharding(mesh, spec)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # a global (multi-process) array can only pass through unchanged;
        # re-placing it would need a collective this helper must not issue
        if x.sharding != s:
            raise ValueError(
                f"global array already placed with sharding {x.sharding}, "
                f"cannot re-place to {s}; reshard it inside a jitted "
                f"program (or rebuild it with the target sharding)")
        return x
    if not s.is_fully_addressable:
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, s,
                                            lambda idx: arr[idx])
    return jax.device_put(x, s)


def shard_rows(mesh: Mesh, x: jax.Array, axis: str = "shard") -> jax.Array:
    """Place a [N, ...] array row-sharded across the mesh axis."""
    return place(mesh, x, P(axis))


def replicate(mesh: Mesh, x) -> jax.Array:
    return place(mesh, x, P())
