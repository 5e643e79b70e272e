"""Numerics guards (SURVEY.md §5 race/sanitizer row): the hot pipelines must
run clean under jax.debug_nans, and whitening must not produce NaNs on
degenerate inputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.ops import (
    apply_whitening, fit_whitening, gem_pool, l2_normalize, rmac_pool,
)


def test_pooling_clean_under_debug_nans(rng):
    x = jnp.asarray(rng.random((2, 9, 11, 8)).astype(np.float32))
    with jax.debug_nans(True):
        jax.block_until_ready(gem_pool(x, 3.0))
        jax.block_until_ready(rmac_pool(x, 2))
        jax.block_until_ready(l2_normalize(jnp.zeros((2, 8))))  # zero vector


def test_whitening_degenerate_rank(rng):
    # more dims than samples: covariance is rank-deficient
    X = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
    with jax.debug_nans(True):
        params = fit_whitening(X)
        out = jax.block_until_ready(apply_whitening(X, params))
    assert bool(jnp.all(jnp.isfinite(out)))


def test_whitening_constant_input():
    X = jnp.ones((16, 8), jnp.float32)
    params = fit_whitening(X)
    out = apply_whitening(X, params)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_gem_zero_featuremap():
    x = jnp.zeros((1, 4, 4, 8), jnp.float32)
    with jax.debug_nans(True):
        out = jax.block_until_ready(gem_pool(x, 3.0))
    assert bool(jnp.all(jnp.isfinite(out)))
