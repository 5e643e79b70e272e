"""Tensor-parallel parameter sharding (SURVEY.md §2.2 TP row).

The reference has no TP and the CNN backbones don't need it (ResNet-50
fits in one chip's HBM with room for a 4M-row index — SURVEY.md §2.2
documents TP as out-of-scope for v1). The ViT family (models/vit.py)
changes that calculus: ViT-L/16 is 300M params of pure matmul, and the
Megatron-style column/row split of its attention + MLP blocks is the
textbook TP decomposition — and on TPU it is expressed entirely as
PartitionSpecs, NOT hand-written collectives:

  qkv Dense      kernel [D, 3D]   -> P(None, 'model')   (column split:
                                      heads divide across chips)
  out Dense      kernel [D, D]    -> P('model', None)   (row split:
                                      XLA inserts ONE psum after it)
  MLP linear_1   kernel [D, 4D]   -> P(None, 'model')
  MLP linear_2   kernel [4D, D]   -> P('model', None)   (second psum)
  everything else (LayerNorms, patch conv, pos embeddings, biases of
  row-split layers) -> replicated

With the parameters committed to these shardings and the activations
data-sharded, GSPMD propagates the split through the reshape-to-heads
and einsums and inserts exactly the two all-reduces per block that
Megatron-LM (arXiv:1909.08053) issues by hand. The attention split is
along heads, so the [B, h/tp, N, N] logits also shrink per-chip — TP
divides the dominant HBM term too, not just the FLOPs.

The spec builder is name-driven and returns replicated specs for every
parameter it does not recognize, so applying it to a ResNet/VGG tree is
a harmless no-op (pure DP) — one code path for all backbones.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# parameter-name suffixes -> spec factory, keyed on (layer name, leaf name).
# Column-split layers shard kernel output dim AND bias; row-split layers
# shard kernel input dim only (their bias is added after the psum).
_COL_SPLIT = ("qkv", "linear_1")
_ROW_SPLIT = ("out", "linear_2")


def tp_param_spec(path: tuple[str, ...], axis: str = "model") -> P:
    """PartitionSpec for one parameter identified by its flax path
    (tuple of name strings, e.g. ('params', 'encoder_layer_0', 'qkv',
    'kernel')). Unrecognized parameters replicate."""
    if len(path) < 2:
        return P()
    layer, leaf = path[-2], path[-1]
    if layer in _COL_SPLIT:
        if leaf == "kernel":
            return P(None, axis)
        if leaf == "bias":
            return P(axis)
    elif layer in _ROW_SPLIT and leaf == "kernel":
        return P(axis, None)
    return P()


def tp_param_specs(variables, axis: str = "model"):
    """PartitionSpec pytree matching ``variables`` (Megatron split for the
    recognized attention/MLP layers, replicated otherwise)."""
    def spec(key_path, _leaf):
        names = tuple(
            k.key if hasattr(k, "key") else str(k) for k in key_path)
        return tp_param_spec(names, axis)

    return jax.tree_util.tree_map_with_path(spec, variables)


def place_tp(mesh: Mesh, variables, axis: str = "model"):
    """Commit a variables pytree to its TP shardings on ``mesh``.

    Validates divisibility up-front: a column-split kernel whose output
    dim does not divide by the mesh axis would silently replicate under
    GSPMD-with-padding semantics elsewhere; here it is an error."""
    tp = mesh.shape[axis]
    specs = tp_param_specs(variables, axis)

    def commit(kp, leaf):
        names = tuple(k.key if hasattr(k, "key") else str(k) for k in kp)
        s = tp_param_spec(names, axis)
        for dim, name in enumerate(s):
            if name == axis and leaf.shape[dim] % tp:
                raise ValueError(
                    f"parameter {'/'.join(names)} dim {dim} "
                    f"({leaf.shape[dim]}) not divisible by {axis}={tp}")
        return jax.device_put(leaf, NamedSharding(mesh, s))

    del specs  # commit() recomputes per-leaf (keeps shapes for the check)
    return jax.tree_util.tree_map_with_path(commit, variables)
