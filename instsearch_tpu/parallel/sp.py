"""Sequence-parallel ViT forward (SURVEY.md §2.2 SP/CP row).

The reference is a CNN stack with no sequence axis, and SURVEY.md §2.2
honestly marked SP/CP "N/A" with row-sharded index scanning as the
structural analog. The ViT family (models/vit.py) creates a REAL token
axis: at high-resolution extraction (1024² @ patch 16 -> 4096 tokens,
more under multi-scale) the [B, h, N, N] attention working set grows
quadratically while MLP activations grow linearly — exactly the regime
sequence parallelism exists for.

Design — DeepSpeed-Ulysses-style all_to_all re-sharding
(arXiv:2309.14509), expressed as ONE SPMD ``shard_map`` program:

- Tokens are padded to a multiple of ``mesh.shape['seq']`` and sharded
  over the 'seq' axis; every token-local stage (LayerNorms, qkv/out
  projections, the whole MLP) runs on N/sp tokens per chip with
  REPLICATED weights — this is where the linear-in-N memory and FLOPs
  live, and it needs no communication at all.
- Attention needs every (query, key) pair, so each block does two
  ``lax.all_to_all``s: the first trades the token shard for a head
  shard (each chip gets ALL N tokens for h/sp heads — attention itself
  is embarrassingly parallel over heads), the second trades back. Per
  block that moves 4·[B, N/sp, D] activation bytes over ICI — the same
  volume Ulysses ships, ~h/3 times less than a Megatron-SP all-gather
  of K and V.
- The pad tokens are excluded exactly: ``models.vit.attend`` masks
  padded keys to -inf before its f32 softmax, so the renormalized
  attention equals the unpadded computation and the pad rows are
  dropped before ``finalize``. The mask is a trace-time constant
  (static shapes — CLAUDE.md conventions).
- Embed/finalize run replicated outside the loop (same boundary as the
  pipeline runtime, parallel/pp.py); the math inside the loop is
  ``EncoderBlock.pre_attention`` / ``attend`` / ``post_attention`` —
  the model module stays the single source of truth.
- Composes with a 'data' axis: batch rows shard over 'data', tokens
  over 'seq', weights replicated — a (data × seq) mesh runs both.

Constraint: ``num_heads % sp == 0`` (the head shard must be even);
token count is padded, so any N works. Forward-only, like PP —
extraction is inference; fine-tuning stays DP (train/trainer.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vit import EncoderBlock, ViT, attend


def place_sp(mesh: Mesh, variables):
    """SP weights are fully replicated (the split axes are activations);
    committing them up-front avoids a first-call transfer per device."""
    return jax.device_put(variables, NamedSharding(mesh, P()))


def sequence_parallel_vit_fn(model: ViT, mesh: Mesh, axis: str = "seq",
                             data_axis: str | None = None):
    """Build ``f(variables, images) -> NHWC patch maps`` running the ViT
    encoder with the token axis sharded over ``mesh[axis]``. Jit the
    returned function (variables are arguments, never closed over —
    CLAUDE.md jit-closure landmine)."""
    sp = mesh.shape[axis]
    if model.num_heads % sp:
        raise ValueError(f"num_heads={model.num_heads} not divisible by "
                         f"{axis}={sp} sequence shards")
    if data_axis is None and "data" in mesh.axis_names:
        data_axis = "data"

    block = EncoderBlock(model.num_heads, model.mlp_dim,
                         hidden_dim=model.hidden_dim,
                         dtype=model.dtype, attention="xla")

    def sp_body(variables, tokens, n_real):
        # tokens: local [B(/data), Np/sp, D]; weights replicated.
        # n_real is a trace-time Python int -> the key mask is a constant.
        n_pad_total = tokens.shape[1] * sp
        key_mask = jnp.arange(n_pad_total) < n_real
        x = tokens
        for i in range(model.num_layers):
            lp = {"params": variables["params"][f"encoder_layer_{i}"]}
            q, k, v = block.apply(lp, x, method="pre_attention")
            # token shard -> head shard: [B, N/sp, h, hd] -> [B, N, h/sp, hd]
            q, k, v = (jax.lax.all_to_all(t, axis, split_axis=2,
                                          concat_axis=1, tiled=True)
                       for t in (q, k, v))
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            o = attend(q, k, v, key_mask, model.dtype)
            # head shard -> token shard: [B, N, h/sp, hd] -> [B, N/sp, h, hd]
            o = jax.lax.all_to_all(o.transpose(0, 2, 1, 3), axis,
                                   split_axis=1, concat_axis=2, tiled=True)
            o = o.reshape(*o.shape[:2], model.hidden_dim)
            x = block.apply(lp, x, o, method="post_attention")
        return x

    def forward(variables, images):
        tokens, (gh, gw) = model.apply(variables, images, method="embed")
        b, n, _ = tokens.shape
        pad = -n % sp
        tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))
        tok_spec = P(data_axis, axis, None)
        var_specs = jax.tree_util.tree_map(lambda _: P(), variables)
        enc = jax.shard_map(
            lambda v, t: sp_body(v, t, n),
            mesh=mesh, in_specs=(var_specs, tok_spec), out_specs=tok_spec,
        )(variables, tokens)
        enc = enc[:, :n]
        return model.apply(variables, enc, gh, gw, method="finalize")

    return forward
