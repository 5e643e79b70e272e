"""Lw whitening + hard-negative mining + learnable GeM p."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.ops.whitening import apply_whitening, fit_lw_whitening
from instsearch_tpu.train.mining import mine_hard_negatives


def test_lw_whitening_normalizes_intraclass_scatter(rng):
    # pairs differing mostly along one direction: Lw must equalize it
    D = 16
    noise_dir = np.zeros(D, np.float32)
    noise_dir[0] = 1.0
    a = rng.standard_normal((500, D)).astype(np.float32)
    p = a + 3.0 * rng.standard_normal((500, 1)).astype(np.float32) * noise_dir \
        + 0.05 * rng.standard_normal((500, D)).astype(np.float32)
    params = fit_lw_whitening(jnp.asarray(a), jnp.asarray(p))
    wa = np.asarray(apply_whitening(jnp.asarray(a), params, renormalize=False))
    wp = np.asarray(apply_whitening(jnp.asarray(p), params, renormalize=False))
    diff = wa - wp
    scatter = np.var(diff, axis=0)
    # post-whitening the pair-difference variance is isotropic-ish
    assert scatter.max() / max(scatter.min(), 1e-6) < 10.0, scatter
    # raw data was wildly anisotropic in that direction
    raw = np.var(a - p, axis=0)
    assert raw.max() / raw.min() > 100.0


def test_lw_whitening_few_pairs(rng):
    # fewer pairs than dims: clamp to m-1 components, bounded amplification
    a = rng.standard_normal((10, 64)).astype(np.float32)
    p = a + 0.05 * rng.standard_normal((10, 64)).astype(np.float32)
    params = fit_lw_whitening(jnp.asarray(a), jnp.asarray(p))
    assert params.P.shape == (9, 64)
    out = np.asarray(apply_whitening(jnp.asarray(a), params))
    assert np.isfinite(out).all()
    # matched pairs still closer than random after projection
    wa = np.asarray(apply_whitening(jnp.asarray(a[:4]), params))
    wp = np.asarray(apply_whitening(jnp.asarray(p[:4]), params))
    wr = np.asarray(apply_whitening(jnp.asarray(a[4:8]), params))
    assert (wa * wp).sum(1).mean() > (wa * wr).sum(1).mean()


def test_lw_whitening_dim_reduction(rng):
    a = rng.standard_normal((200, 12)).astype(np.float32)
    p = a + 0.1 * rng.standard_normal((200, 12)).astype(np.float32)
    params = fit_lw_whitening(jnp.asarray(a), jnp.asarray(p), dim=4)
    assert params.P.shape == (4, 12)


def test_mining_excludes_same_class(rng):
    pool = rng.standard_normal((50, 8)).astype(np.float32)
    pool /= np.linalg.norm(pool, axis=1, keepdims=True)
    labels = np.arange(50) % 5
    anchors = pool[:10]
    negs = mine_hard_negatives(pool, labels, anchors, labels[:10],
                               num_negatives=3)
    assert negs.shape == (10, 3)
    for i in range(10):
        assert all(labels[j] != labels[i] for j in negs[i])


def test_mining_picks_hardest(rng):
    # pool entry 7 is nearly identical to anchor but different class:
    # must be the first negative
    pool = rng.standard_normal((20, 8)).astype(np.float32)
    pool /= np.linalg.norm(pool, axis=1, keepdims=True)
    labels = np.zeros(20, np.int64)
    labels[7] = 1
    anchor = pool[0:1]
    pool[7] = pool[0] + 1e-3
    negs = mine_hard_negatives(pool, labels, anchor, labels[0:1],
                               num_negatives=1)
    assert negs[0, 0] == 7


@pytest.mark.slow
def test_learnable_gem_p_gets_gradient():
    from instsearch_tpu.config import TrainConfig
    from instsearch_tpu.train import Trainer
    cfg = TrainConfig(backbone="vgg16", pooling="gem", learn_gem_p=True,
                      image_size=32, batch_size=2, num_negatives=1,
                      dtype="float32", lr=1e-3)
    tr = Trainer(cfg, seed=0)
    p0 = float(tr.state.params["gem_p"])
    rng = np.random.default_rng(0)
    batch = rng.random((2, 3, 32, 32, 3), dtype=np.float32)
    for _ in range(2):
        tr.step(batch)
    p1 = float(tr.state.params["gem_p"])
    assert p0 == pytest.approx(3.0)
    assert p1 != p0
