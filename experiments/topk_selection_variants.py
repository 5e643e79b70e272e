"""Surgical kernel variants to locate the large-k epilogue cost.

Variants (bf16 path only, k > 16):
  nomerge   — merges deleted entirely (WRONG results; isolates the
              unconditional per-tile work: matmul + masks + reductions)
  notiers   — single conditional tier: extract-8 + rank-insert, dense
              fallback when cmax > 8 (exact)
  uncond    — extract-4 + rank-insert UNCONDITIONALLY on every tile (no
              tile_interesting gate), dense fallback when cmax > 4 (exact)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from instsearch_tpu.kernels.topk_matmul import (_extract_candidates,
                                                _insert_sorted, _merge_topk,
                                                default_tile_n)

NEG_INF = np.float32(-np.inf)


def _kernel_variant(num_valid_ref, x_ref, q_ref, out_s_ref, out_i_ref,
                    top_s, top_i, *, k: int, tile_n: int, mode: str):
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        top_s[:] = jnp.full_like(top_s, NEG_INF)
        top_i[:] = jnp.full_like(top_i, -1)

    scores = jax.lax.dot_general(
        q_ref[:], x_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    base = step * tile_n
    row_ids = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    valid = row_ids < num_valid_ref[0]
    scores = jnp.where(valid, scores, NEG_INF)

    tau = jnp.min(top_s[:], axis=1, keepdims=True)
    row_max = jnp.max(scores, axis=1, keepdims=True)
    tile_interesting = jnp.any(row_max > tau)
    b = scores.shape[0]

    if mode == "nomerge":
        # keep a data dependency on scores so nothing is DCE'd: fold the
        # row max into slot 0 occasionally (wrong results, honest stream)
        @pl.when(tile_interesting)
        def _fold():
            top_s[:] = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, top_s.shape, 1) == 0,
                jnp.maximum(top_s[:], row_max), top_s[:])
    elif mode == "notiers":
        @pl.when(tile_interesting)
        def _fold():
            n_above = jnp.sum(scores > tau, axis=1)
            cmax = jnp.max(n_above)
            cand_s, cand_i = _extract_candidates(scores, row_ids, tau, 8)
            new_s, new_i = _insert_sorted(cand_s, cand_i,
                                          top_s[:], top_i[:], k)

            @pl.when(cmax <= 8)
            def _ins():
                top_s[:] = new_s
                top_i[:] = new_i

            @pl.when(cmax > 8)
            def _dense():
                ids_bt = jnp.broadcast_to(row_ids, (b, tile_n))
                ms, mi = _merge_topk(scores, ids_bt, top_s[:], top_i[:], k)
                top_s[:] = ms
                top_i[:] = mi
    elif mode == "uncond":
        n_above = jnp.sum(scores > tau, axis=1)
        cmax = jnp.max(n_above)
        cand_s, cand_i = _extract_candidates(scores, row_ids, tau, 4)
        new_s, new_i = _insert_sorted(cand_s, cand_i, top_s[:], top_i[:], k)

        @pl.when(cmax <= 4)
        def _ins():
            top_s[:] = new_s
            top_i[:] = new_i

        @pl.when(cmax > 4)
        def _dense():
            ids_bt = jnp.broadcast_to(row_ids, (b, tile_n))
            ms, mi = _merge_topk(scores, ids_bt, top_s[:], top_i[:], k)
            top_s[:] = ms
            top_i[:] = mi
    else:
        raise ValueError(mode)

    @pl.when(step == num_steps - 1)
    def _emit():
        out_s_ref[:] = top_s[:]
        out_i_ref[:] = top_i[:]


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "mode"))
def topk_variant(x, q, k=100, tile_n=None, mode="notiers"):
    n, d = x.shape
    b = q.shape[0]
    if tile_n is None:
        tile_n = default_tile_n(n, d, x.dtype, b=b, k=k)
    nv = jnp.asarray([n], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile_n,),
        in_specs=[pl.BlockSpec((tile_n, d), lambda i, nv_ref: (i, 0)),
                  pl.BlockSpec((b, d), lambda i, nv_ref: (0, 0))],
        out_specs=[pl.BlockSpec((b, k), lambda i, nv_ref: (0, 0)),
                   pl.BlockSpec((b, k), lambda i, nv_ref: (0, 0))],
        scratch_shapes=[pltpu.VMEM((b, k), jnp.float32),
                        pltpu.VMEM((b, k), jnp.int32)],
    )
    kernel = functools.partial(_kernel_variant, k=k, tile_n=tile_n,
                               mode=mode)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, k), jnp.float32),
                   jax.ShapeDtypeStruct((b, k), jnp.int32)],
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * x.dtype.itemsize + b * d * 4,
            transcendentals=0),
    )(nv, x, q.astype(x.dtype))


if __name__ == "__main__":
    import json

    from instsearch_tpu import bench as B

    # correctness first, small N on the same chip
    Xs, qs = B._make_index_device(65_536, 512, 2, seed=1)
    # f32 accumulation like the kernel — a bf16-result oracle creates
    # spurious ties the kernel legitimately orders differently
    want_s, want_i = jax.lax.top_k(
        jnp.dot(qs.astype(jnp.bfloat16), Xs.T,
                preferred_element_type=jnp.float32), 100)
    for mode in ("notiers", "uncond"):
        s, i = topk_variant(Xs, qs, k=100, mode=mode)
        ok = bool(jnp.all(i == want_i))
        print(mode, "exact:", ok)
        assert ok, (mode, np.asarray(i)[:, :10], np.asarray(want_i)[:, :10])

    N, D = 1_048_576, 512
    Xd, q = B._make_index_device(N, D, 1)
    q1 = jnp.ones((1, D), jnp.bfloat16)

    def mk(mode, k):
        def make(m):
            def run(X, qq):
                acc = jnp.zeros((), jnp.float32)
                for _ in range(m):
                    s, _ = topk_variant(X, qq + acc * 1e-30, k=k, mode=mode)
                    acc = acc + s[0, 0]
                return acc
            return jax.jit(run)
        return make

    specs = [("probe", B.make_stream_probe, (Xd, q1)),
             ("nomerge_k100", mk("nomerge", 100), (Xd, q)),
             ("notiers_k100", mk("notiers", 100), (Xd, q)),
             ("uncond_k100", mk("uncond", 100), (Xd, q)),
             ("notiers_k200", mk("notiers", 200), (Xd, q)),
             ("uncond_k200", mk("uncond", 200), (Xd, q))]
    res = B.interleaved_marginal([(f, a) for _, f, a in specs],
                                 n1=3, n2=9, reps=5)
    out = {nm: round(float(np.median(r)) * 1e3, 4)
           for (nm, _, _), r in zip(specs, res)}
    print(json.dumps(out))
