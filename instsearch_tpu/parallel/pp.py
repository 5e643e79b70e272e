"""Pipeline-parallel ViT forward (SURVEY.md §2.2 PP row).

The reference has no pipeline parallelism and the CNN backbones never
need it (SURVEY.md §2.2 documents PP as out-of-scope for v1). The ViT
family changes the calculus the same way it did for TP (parallel/tp.py):
a deep encoder stack of IDENTICAL blocks is the textbook pipeline
workload, and on TPU the whole schedule is expressible as one SPMD
program — no per-stage processes, no send/recv framework, just
``shard_map`` over a 'pipe' mesh axis with ``lax.ppermute`` moving
activations between neighbouring stages over ICI.

Design (GPipe schedule, arXiv:1811.06965, forward-only — extraction is
inference; fine-tuning stays DP via train/trainer.py):

- The L encoder layers are split into S = mesh.shape['pipe'] contiguous
  stages. Their parameter subtrees are STACKED into one pytree with a
  leading layer axis and that axis is sharded over 'pipe', so each chip
  holds exactly its own L/S layers — placement is a PartitionSpec, not a
  scatter protocol.
- Patchify/pos-embed (``ViT.embed``) and the final LayerNorm
  (``ViT.finalize``) run replicated outside the pipeline body: they are
  a fraction of a percent of the FLOPs, and keeping them out of the
  loop keeps the rotated activation a single dense [mb, N, D] block.
- The batch is split into ``n_micro`` microbatches. For
  t in range(n_micro + S - 1): every stage applies its local layers
  (``lax.scan`` over the stacked subtree — one trace for L/S layers),
  then the activation rotates one stage forward via ``ppermute``. Stage
  s processes microbatch t-s at step t; the last stage's outputs are
  masked-accumulated and broadcast with one ``psum`` at the end. Every
  device executes the identical program (SPMD) — warm-up/drain bubbles
  are computed-and-discarded, the standard GPipe cost of
  (S-1)/(n_micro+S-1).
- Works composed with a 'data' axis (DP×PP mesh): microbatch rows are
  sharded over 'data', weights are replicated over 'data' and
  stage-sharded over 'pipe'.

Why not pipeline the CNNs: ResNet stages have heterogeneous shapes
(feature-map dims change per stage), so the rotated buffer would need
per-stage padding to the largest activation; the ViT stack rotates one
homogeneous [mb, N, D] tensor. This is the honest scope boundary, same
as tp.py's.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vit import EncoderBlock, ViT


def stack_layer_params(model: ViT, variables):
    """Stack the ``encoder_layer_{i}`` subtrees into one pytree with a
    leading layer axis ``[L, ...]`` (identical structure per layer by
    construction), plus the residual tree (embed/finalize params)."""
    params = dict(variables["params"])
    layers = [params.pop(f"encoder_layer_{i}")
              for i in range(model.num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return {"params": params}, stacked


def place_pp(mesh: Mesh, model: ViT, variables, axis: str = "pipe"):
    """Commit a ViT variables tree to its pipeline placement: stacked
    layer params sharded over ``axis`` on the layer dim, everything else
    replicated. Returns ``(rest_variables, stacked_layers)``."""
    n_stages = mesh.shape[axis]
    if model.num_layers % n_stages:
        raise ValueError(
            f"num_layers={model.num_layers} not divisible by "
            f"{axis}={n_stages} pipeline stages")
    rest, stacked = stack_layer_params(model, variables)
    rest = jax.device_put(rest, NamedSharding(mesh, P()))
    stacked = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))),
        stacked)
    return rest, stacked


def pipelined_vit_fn(model: ViT, mesh: Mesh, n_micro: int,
                     axis: str = "pipe", data_axis: str | None = None):
    """Build ``f(rest_variables, stacked_layers, images) -> NHWC patch
    maps`` running the encoder stack as a GPipe pipeline over
    ``mesh[axis]``. Jit the returned function (params/stacked are
    arguments, never closed over — CLAUDE.md jit-closure landmine)."""
    n_stages = mesh.shape[axis]
    if model.num_layers % n_stages:
        raise ValueError(
            f"num_layers={model.num_layers} not divisible by "
            f"{axis}={n_stages} pipeline stages")
    if data_axis is None and "data" in mesh.axis_names:
        data_axis = "data"

    block = EncoderBlock(model.num_heads, model.mlp_dim,
                         hidden_dim=model.hidden_dim,
                         dtype=model.dtype, attention="xla")

    def stage_apply(local_layers, h):
        # one trace for all L/S resident layers
        def body(hh, lp):
            return block.apply({"params": lp}, hh), None
        h, _ = jax.lax.scan(body, h, local_layers)
        return h

    def pp_body(local_layers, tokens):
        # tokens: [n_micro, mb_local, N, D]; local_layers: [L/S, ...]
        sid = jax.lax.axis_index(axis)
        carry = jnp.zeros_like(tokens[0])
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        collected = []
        for t in range(n_micro + n_stages - 1):
            feed = tokens[min(t, n_micro - 1)]   # drain steps recompute
            inp = jnp.where(sid == 0, feed, carry)
            y = stage_apply(local_layers, inp)
            if t >= n_stages - 1:
                collected.append(
                    jnp.where(sid == n_stages - 1, y, jnp.zeros_like(y)))
            carry = jax.lax.ppermute(y, axis, perm)
        # outputs live on the last stage only; ONE psum replicates them
        # across 'pipe' (out_specs demand pipe-invariance)
        return jax.lax.psum(jnp.stack(collected), axis)

    def spec_for(x):
        return P(axis, *([None] * (x.ndim - 1)))

    def forward(rest_variables, stacked_layers, images):
        tokens, (gh, gw) = model.apply(rest_variables, images,
                                       method="embed")
        b = tokens.shape[0]
        if b % n_micro:
            raise ValueError(f"batch {b} not divisible by "
                             f"n_micro={n_micro}")
        tk = tokens.reshape(n_micro, b // n_micro, *tokens.shape[1:])
        tok_spec = P(None, data_axis) if data_axis else P()
        in_specs = (jax.tree_util.tree_map(spec_for, stacked_layers),
                    tok_spec)
        enc = jax.shard_map(
            pp_body, mesh=mesh, in_specs=in_specs, out_specs=tok_spec,
        )(stacked_layers, tk)
        enc = enc.reshape(b, *tokens.shape[1:])
        return model.apply(rest_variables, enc, gh, gw, method="finalize")

    return forward
