"""Expert-parallel local whitening (SURVEY.md §2.2 EP row).

The reference has no experts of any kind and SURVEY.md §2.2 honestly
marked EP "N/A". The local-whitening bank (ops/local_whiten.py) creates
a real expert axis: E per-cluster projection matrices routed by a coarse
quantizer — the canonical MoE shape, inference-only, with hard top-1
routing. At production scale the bank itself is the reason to shard:
E=1024 experts of [512, 512] f32 are 1 GB of parameters, and growing E
(finer local metrics) or dim trades quality against memory exactly like
growing an MoE's expert count.

Design — ONE SPMD ``shard_map`` program, no dispatch framework:

- ``P [E, dim, D]`` and ``mu [E, D]`` are sharded over the 'expert'
  axis (leading dim); the router codebook ``centroids [E, D]`` is tiny
  and REPLICATED, so every chip computes the same global assignment
  for every row — routing is recomputed, never communicated.
- Each chip projects the rows whose expert lives in its shard and
  contributes zeros for the rest; one ``psum`` combines. Top-1 hard
  routing means each row is non-zero on exactly one chip — the psum IS
  the combine, there is no capacity factor and no dropped tokens
  (GShard-style dispatch matmuls exist for soft/top-2 routing; hard
  top-1 inference doesn't need them).
- The L2 renormalization happens AFTER the psum (on the combined row),
  keeping EP output bit-comparable to the single-device
  ``apply_local_whitening``.
- Composes with a 'data' axis: rows shard over 'data', experts over
  'expert' — a (data × expert) mesh runs both, same code path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.local_whiten import LocalWhiteningParams
from ..ops.pooling import l2_normalize


def place_ep(mesh: Mesh, params: LocalWhiteningParams,
             axis: str = "expert") -> LocalWhiteningParams:
    """Commit a fitted bank to its EP placement: P/mu sharded on the
    expert dim, router codebook replicated."""
    ep = mesh.shape[axis]
    e = params.P.shape[0]
    if e % ep:
        raise ValueError(f"E={e} experts not divisible by {axis}={ep}")
    return LocalWhiteningParams(
        centroids=jax.device_put(params.centroids, NamedSharding(mesh, P())),
        P=jax.device_put(params.P, NamedSharding(mesh, P(axis, None, None))),
        mu=jax.device_put(params.mu, NamedSharding(mesh, P(axis, None))),
    )


def expert_whiten_fn(mesh: Mesh, axis: str = "expert",
                     data_axis: str | None = None,
                     renormalize: bool = True):
    """Build ``f(params, x [B, D]) -> [B, dim]`` applying the expert bank
    with experts sharded over ``mesh[axis]``. Jit the returned function
    (params are arguments, never closed over — CLAUDE.md jit-closure
    landmine)."""
    ep = mesh.shape[axis]
    if data_axis is None and "data" in mesh.axis_names:
        data_axis = "data"

    def body(cent, p_loc, mu_loc, x):
        # cent [E, D] replicated; p_loc [E/ep, dim, D]; x local rows
        e_local = p_loc.shape[0]
        scores = jnp.einsum("bd,ed->be", x.astype(jnp.float32), cent)
        a = jnp.argmax(scores, axis=-1).astype(jnp.int32)       # global id
        lo = jax.lax.axis_index(axis).astype(jnp.int32) * e_local
        mine = (a >= lo) & (a < lo + e_local)
        lidx = jnp.clip(a - lo, 0, e_local - 1)
        xm = x.astype(jnp.float32) - mu_loc[lidx]
        out = jnp.einsum("bd,bod->bo", xm, p_loc[lidx])
        out = jnp.where(mine[:, None], out, 0.0)
        out = jax.lax.psum(out, axis)       # top-1: exactly one contributor
        if renormalize:
            out = l2_normalize(out, axis=-1)
        return out

    row_spec = P(data_axis) if data_axis else P()

    def forward(params: LocalWhiteningParams, x):
        if params.P.shape[0] % ep:
            raise ValueError(f"E={params.P.shape[0]} experts not divisible "
                             f"by {axis}={ep}")
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(axis, None, None), P(axis, None), row_spec),
            out_specs=row_spec,
        )(params.centroids, params.P, params.mu, x)

    return forward
