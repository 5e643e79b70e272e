"""Data-parallel trainer on 8 fake devices: loss decreases, and the
DP-sharded step matches the single-device step numerically."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from instsearch_tpu.config import TrainConfig
from instsearch_tpu.train import Trainer


CFG = TrainConfig(backbone="vgg16", pooling="mac", image_size=32,
                  batch_size=8, num_negatives=1, dtype="float32", lr=1e-4)


def _batch(seed=0, b=8):
    rng = np.random.default_rng(seed)
    base = rng.random((b, 1, 32, 32, 3), dtype=np.float32)
    pos = np.clip(base + rng.normal(0, 0.02, base.shape), 0, 1).astype(np.float32)
    neg = rng.random((b, 1, 32, 32, 3), dtype=np.float32)
    return np.concatenate([base, pos, neg], axis=1)  # [B, 3, S, S, 3]


@pytest.mark.slow
def test_loss_decreases_single_device():
    tr = Trainer(CFG, seed=0)
    b = _batch(0)   # fixed batch: repeated steps must reduce its loss
    losses = [tr.step(b)["loss"] for i in range(8)]
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_dp_matches_single_device():
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    tr_dp = Trainer(CFG, mesh=mesh, seed=0)
    tr_sd = Trainer(CFG, seed=0)
    b = _batch(0)
    l_dp = tr_dp.step(b)["loss"]
    l_sd = tr_sd.step(b)["loss"]
    assert l_dp == pytest.approx(l_sd, rel=1e-4)
    # one more step so gradients (not just loss) are compared through params
    l_dp2 = tr_dp.step(_batch(1))["loss"]
    l_sd2 = tr_sd.step(_batch(1))["loss"]
    assert l_dp2 == pytest.approx(l_sd2, rel=1e-3)
