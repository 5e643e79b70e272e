"""Sequence-parallel ViT forward (SURVEY.md §2.2 SP/CP row; parallel/sp.py).

Ulysses-style token sharding: tokens over 'seq', two all_to_alls per
block trading token <-> head shards, padded keys masked to -inf inside
the shared f32 softmax. Asserted: SP output == single-device output in
f32 (the pad mask is exact, not approximate), DP×SP composes, the
head-divisibility guard fires, and an indivisible token count (17
tokens over 4 shards) is handled by the pad+mask path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from instsearch_tpu.models.vit import ViT
from instsearch_tpu.parallel.sp import place_sp, sequence_parallel_vit_fn


def _tiny_vit(num_heads=4):
    # 16x16 @ patch 4 -> 17 tokens incl. cls: NOT divisible by any sp>1,
    # so every parametrization exercises the pad+mask path
    return ViT(hidden_dim=32, num_layers=2, num_heads=num_heads, mlp_dim=64,
               patch_size=4, image_size=16, dtype=jnp.float32)


def _init(model, rng, batch=4):
    x = rng.standard_normal((batch, 16, 16, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return variables, x


def _mesh(shape, names):
    n = int(np.prod(shape))
    devs = np.array(jax.devices()[:n]).reshape(shape)
    return Mesh(devs, names)


@pytest.mark.parametrize("sp", [2, 4])
def test_sp_matches_single_device(rng, sp):
    model = _tiny_vit()
    variables, x = _init(model, rng)
    ref = np.asarray(model.apply(variables, jnp.asarray(x)))

    mesh = _mesh((sp,), ("seq",))
    svars = place_sp(mesh, variables)
    fwd = jax.jit(sequence_parallel_vit_fn(model, mesh))
    out = np.asarray(fwd(svars, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_sp_dp_composition(rng):
    model = _tiny_vit()
    variables, x = _init(model, rng, batch=4)
    ref = np.asarray(model.apply(variables, jnp.asarray(x)))

    mesh = _mesh((2, 4), ("data", "seq"))
    svars = place_sp(mesh, variables)
    fwd = jax.jit(sequence_parallel_vit_fn(model, mesh))
    out = np.asarray(fwd(svars, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_sp_multiscale_input(rng):
    # a different input size (24 -> 37 tokens) reuses the same fn builder
    # machinery: pos-embedding resize at trace time + a different pad
    model = _tiny_vit()
    variables, _ = _init(model, rng)
    x = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    ref = np.asarray(model.apply(variables, jnp.asarray(x)))

    mesh = _mesh((4,), ("seq",))
    fwd = jax.jit(sequence_parallel_vit_fn(model, mesh))
    out = np.asarray(fwd(place_sp(mesh, variables), jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_sp_head_divisibility_guard():
    model = _tiny_vit(num_heads=2)
    mesh = _mesh((4,), ("seq",))
    with pytest.raises(ValueError, match="not divisible"):
        sequence_parallel_vit_fn(model, mesh)
