"""Pipeline-parallel ViT forward (SURVEY.md §2.2 PP row; parallel/pp.py).

GPipe schedule as one SPMD shard_map program: stacked layer params
sharded over 'pipe', activations rotated with ppermute. Asserted: PP
output == single-device output bit-for-equivalent math (f32), params
are REALLY stage-sharded, DP×PP composes, and the divisibility guards
fire."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from instsearch_tpu.models.vit import ViT
from instsearch_tpu.parallel.pp import (
    pipelined_vit_fn, place_pp, stack_layer_params)


def _tiny_vit(num_layers=4):
    return ViT(hidden_dim=32, num_layers=num_layers, num_heads=4, mlp_dim=64,
               patch_size=4, image_size=16, dtype=jnp.float32)


def _init(model, rng, batch=8):
    x = rng.standard_normal((batch, 16, 16, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return variables, x


def _mesh(shape, names):
    n = int(np.prod(shape))
    devs = np.array(jax.devices()[:n]).reshape(shape)
    return Mesh(devs, names)


@pytest.mark.parametrize("stages,n_micro", [(4, 4), (2, 8), (8, 2)])
def test_pp_matches_single_device(rng, stages, n_micro):
    model = _tiny_vit(num_layers=8)
    variables, x = _init(model, rng, batch=8)
    ref = np.asarray(model.apply(variables, jnp.asarray(x)))

    mesh = _mesh((stages,), ("pipe",))
    rest, stacked = place_pp(mesh, model, variables)
    fwd = jax.jit(pipelined_vit_fn(model, mesh, n_micro=n_micro))
    out = np.asarray(fwd(rest, stacked, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_pp_dp_composition(rng):
    # DP×PP: batch rows sharded over 'data', stages over 'pipe'
    model = _tiny_vit(num_layers=4)
    variables, x = _init(model, rng, batch=8)
    ref = np.asarray(model.apply(variables, jnp.asarray(x)))

    mesh = _mesh((2, 4), ("data", "pipe"))
    rest, stacked = place_pp(mesh, model, variables)
    fwd = jax.jit(pipelined_vit_fn(model, mesh, n_micro=2))
    out = np.asarray(fwd(rest, stacked, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_layers_really_stage_sharded(rng):
    model = _tiny_vit(num_layers=8)
    variables, _ = _init(model, rng)
    mesh = _mesh((4,), ("pipe",))
    rest, stacked = place_pp(mesh, model, variables)
    qkv = stacked["qkv"]["kernel"]          # [L=8, 32, 96]
    assert qkv.shape == (8, 32, 96)
    # each device holds exactly its 2 stage layers
    assert qkv.addressable_shards[0].data.shape == (2, 32, 96)
    # embed/finalize params replicated
    conv = rest["params"]["conv_proj"]["kernel"]
    assert conv.addressable_shards[0].data.shape == conv.shape


def test_stack_roundtrip_preserves_values(rng):
    model = _tiny_vit(num_layers=4)
    variables, _ = _init(model, rng)
    rest, stacked = stack_layer_params(model, variables)
    l2 = variables["params"]["encoder_layer_2"]["linear_1"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(stacked["linear_1"]["kernel"][2]), np.asarray(l2))
    assert "encoder_layer_0" not in rest["params"]
    assert "conv_proj" in rest["params"]


def test_indivisible_layers_rejected(rng):
    model = _tiny_vit(num_layers=5)
    variables, _ = _init(model, rng)
    mesh = _mesh((4,), ("pipe",))
    with pytest.raises(ValueError, match="not divisible"):
        place_pp(mesh, model, variables)
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_vit_fn(model, mesh, n_micro=2)


def test_indivisible_batch_rejected(rng):
    model = _tiny_vit(num_layers=4)
    variables, x = _init(model, rng, batch=6)
    mesh = _mesh((4,), ("pipe",))
    rest, stacked = place_pp(mesh, model, variables)
    fwd = pipelined_vit_fn(model, mesh, n_micro=4)
    with pytest.raises(ValueError, match="not divisible"):
        fwd(rest, stacked, jnp.asarray(x))
