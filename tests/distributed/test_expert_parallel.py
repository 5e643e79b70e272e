"""Expert-parallel local whitening (SURVEY.md §2.2 EP row; parallel/ep.py).

Expert bank sharded over 'expert', router replicated, one psum combine.
Asserted: EP output == single-device apply_local_whitening (the psum
combine is exact for hard top-1 routing), the bank is REALLY sharded,
DP×EP composes, and the divisibility guard fires."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from instsearch_tpu.ops.local_whiten import (
    apply_local_whitening, fit_local_whitening)
from instsearch_tpu.parallel.ep import expert_whiten_fn, place_ep


def _bank(rng, e=8, d=16, n_per=64):
    centers = rng.standard_normal((e, d)).astype(np.float32) * 4
    x = np.concatenate([
        centers[i] + rng.standard_normal((n_per, d)).astype(np.float32)
        for i in range(e)])
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    params = fit_local_whitening(x, e, seed=0, chunk=128)
    return params, x


def _mesh(shape, names):
    n = int(np.prod(shape))
    devs = np.array(jax.devices()[:n]).reshape(shape)
    return Mesh(devs, names)


@pytest.mark.parametrize("ep", [2, 4, 8])
def test_ep_matches_single_device(rng, ep):
    params, x = _bank(rng)
    q = jnp.asarray(x[:32])
    ref = np.asarray(apply_local_whitening(q, params))

    mesh = _mesh((ep,), ("expert",))
    ep_params = place_ep(mesh, params)
    fwd = jax.jit(expert_whiten_fn(mesh))
    out = np.asarray(fwd(ep_params, q))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_ep_dp_composition(rng):
    params, x = _bank(rng)
    q = jnp.asarray(x[:32])
    ref = np.asarray(apply_local_whitening(q, params))

    mesh = _mesh((2, 4), ("data", "expert"))
    ep_params = place_ep(mesh, params)
    fwd = jax.jit(expert_whiten_fn(mesh))
    out = np.asarray(fwd(ep_params, q))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_bank_really_sharded(rng):
    params, _ = _bank(rng)
    mesh = _mesh((4,), ("expert",))
    ep_params = place_ep(mesh, params)
    # 8 experts over 4 devices -> 2 expert matrices per device
    assert ep_params.P.addressable_shards[0].data.shape == (2, 16, 16)
    assert ep_params.mu.addressable_shards[0].data.shape == (2, 16)
    # the router codebook is replicated
    assert ep_params.centroids.addressable_shards[0].data.shape == (8, 16)


def test_ep_divisibility_guard(rng):
    params, _ = _bank(rng, e=6)
    mesh = _mesh((4,), ("expert",))
    with pytest.raises(ValueError, match="not divisible"):
        place_ep(mesh, params)
