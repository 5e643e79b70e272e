"""Pooling numerics vs handwritten numpy oracles (SURVEY.md §4.1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.ops import (
    avg_pool, gem_pool, l2_normalize, mac_pool,
    rmac_pool, rmac_region_grid, rmac_regional_descriptors,
)


def _maps(rng, n=2, h=13, w=17, c=8):
    # non-negative like post-ReLU feature maps
    return rng.random((n, h, w, c)).astype(np.float32)


def test_avg_pool_matches_numpy(rng):
    x = _maps(rng)
    np.testing.assert_allclose(avg_pool(jnp.asarray(x)), x.mean(axis=(1, 2)), rtol=1e-5)


def test_mac_pool_matches_numpy(rng):
    x = _maps(rng)
    np.testing.assert_allclose(mac_pool(jnp.asarray(x)), x.max(axis=(1, 2)), rtol=1e-6)


def test_gem_matches_numpy(rng):
    x = _maps(rng) + 0.01
    p = 3.0
    want = (np.clip(x, 1e-6, None) ** p).mean(axis=(1, 2)) ** (1 / p)
    np.testing.assert_allclose(gem_pool(jnp.asarray(x), p), want, rtol=1e-4)


def test_gem_limits(rng):
    x = _maps(rng) + 0.1
    xj = jnp.asarray(x)
    # p=1 -> average pooling
    np.testing.assert_allclose(gem_pool(xj, 1.0), avg_pool(xj), rtol=1e-4)
    # p large -> approaches MAC (lower bound max * (H*W)^(-1/p) ~ 0.92 * max here)
    np.testing.assert_allclose(gem_pool(xj, 64.0), mac_pool(xj), rtol=0.1)
    assert np.all(np.asarray(gem_pool(xj, 64.0)) <= np.asarray(mac_pool(xj)) * 1.001)


def test_l2_normalize_unit_norm_and_idempotent(rng):
    x = rng.standard_normal((4, 32)).astype(np.float32)
    y = np.asarray(l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1), 1.0, rtol=1e-5)
    y2 = np.asarray(l2_normalize(jnp.asarray(y)))
    np.testing.assert_allclose(y, y2, rtol=1e-5)


@pytest.mark.parametrize("h,w", [(7, 7), (7, 11), (20, 13), (32, 32), (5, 23)])
@pytest.mark.parametrize("levels", [1, 2, 3])
def test_rmac_grid_properties(h, w, levels):
    regions = rmac_region_grid(h, w, levels)
    assert regions, "grid must be non-empty"
    for (y, x, sy, sx) in regions:
        assert sy == sx, "R-MAC regions are square"
        assert 0 <= y and y + sy <= h
        assert 0 <= x and x + sx <= w
        assert sy >= 1
    # level-1 regions have side floor(2*min/2) = min(h, w)
    assert regions[0][2] == min(h, w)
    # more levels -> strictly more regions
    if levels > 1:
        assert len(regions) > len(rmac_region_grid(h, w, levels - 1))


def test_rmac_grid_overlap_near_target():
    # consecutive same-level regions should overlap roughly 40%
    regions = rmac_region_grid(16, 32, 1)
    assert len(regions) >= 2
    (y0, x0, s, _), (y1, x1, _, _) = regions[0], regions[1]
    inter = max(0, s - abs(x1 - x0)) * max(0, s - abs(y1 - y0))
    frac = inter / (s * s)
    assert 0.2 <= frac <= 0.75, f"overlap {frac}"


def test_rmac_regional_matches_loop_oracle(rng):
    x = _maps(rng, n=1, h=12, w=18, c=4)
    levels = 2
    got = np.asarray(rmac_regional_descriptors(jnp.asarray(x), levels))
    regions = rmac_region_grid(12, 18, levels)
    assert got.shape == (1, len(regions), 4)
    for r, (y, xx, sy, sx) in enumerate(regions):
        want = x[:, y:y + sy, xx:xx + sx, :].max(axis=(1, 2))
        np.testing.assert_allclose(got[:, r], want, rtol=1e-6)


def test_rmac_pool_unit_norm(rng):
    x = _maps(rng, n=3, h=14, w=14, c=16)
    d = np.asarray(rmac_pool(jnp.asarray(x), levels=3))
    assert d.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-4)
