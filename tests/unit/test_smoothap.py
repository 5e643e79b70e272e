"""Smooth-AP loss (train/trainer.py::smoothap_loss, arXiv:2007.12163)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.config import TrainConfig
from instsearch_tpu.train import smoothap_loss


def _desc(rows):
    """rows: [B, T, D] -> unit-norm descriptors."""
    x = np.asarray(rows, np.float32)
    return jnp.asarray(x / np.linalg.norm(x, axis=-1, keepdims=True))


CFG = TrainConfig(loss="smoothap", smoothap_tau=0.01)


def test_perfect_ranking_near_zero_loss():
    """Anchor ≈ positive, negatives far: soft-AP ≈ 1, loss ≈ 0."""
    d = 8
    rng = np.random.default_rng(0)
    a = rng.standard_normal(d)
    negs = [rng.standard_normal(d) for _ in range(3)]
    desc = _desc([[a, a + 1e-3 * rng.standard_normal(d)] + negs])
    loss = float(smoothap_loss(desc, CFG))
    assert loss < 0.05


def test_exact_ap_at_small_tau():
    """Positive ranked below m well-separated negatives -> AP = 1/(1+m):
    the sigmoid relaxation must recover exact AP when margins >> tau."""
    # orthogonal axes: score(anchor, e_i) picks coordinates directly
    a = np.zeros(8); a[0] = 1.0
    pos = np.zeros(8); pos[0] = 0.5; pos[1] = np.sqrt(1 - 0.25)  # s = 0.5
    hi1 = np.zeros(8); hi1[0] = 0.9; hi1[2] = np.sqrt(1 - 0.81)  # s = 0.9
    hi2 = np.zeros(8); hi2[0] = 0.8; hi2[3] = np.sqrt(1 - 0.64)  # s = 0.8
    lo = np.zeros(8); lo[4] = 1.0                                # s = 0.0
    desc = _desc([[a, pos, hi1, hi2, lo]])
    loss = float(smoothap_loss(desc, CFG))
    np.testing.assert_allclose(loss, 1.0 - 1.0 / 3.0, atol=1e-3)


def test_cross_tuple_negatives_count():
    """Another tuple's members are in-batch negatives: a second tuple
    whose positive outranks the first anchor's positive must lower AP."""
    a1 = np.zeros(8); a1[0] = 1.0
    p1 = np.zeros(8); p1[0] = 0.5; p1[1] = np.sqrt(0.75)
    n1 = np.zeros(8); n1[5] = 1.0
    # tuple 2's positive also scores 0.9 against anchor 1 (while still
    # matching its own anchor), so it outranks p1 in anchor 1's list
    a2 = np.zeros(8); a2[6] = 1.0
    p2 = np.zeros(8); p2[0] = 0.9; p2[6] = np.sqrt(1 - 0.81)
    n2 = np.zeros(8); n2[5] = 1.0
    both = _desc([[a1, p1, n1], [a2, p2, n2]])
    only = _desc([[a1, p1, n1]])
    assert float(smoothap_loss(both, CFG)) > float(smoothap_loss(only, CFG))


def test_gradient_improves_ranking():
    """One gradient step on the descriptors must raise the positive's
    score relative to the best negative (the loss is rank-directional)."""
    rng = np.random.default_rng(3)
    desc = _desc(rng.standard_normal((2, 4, 8)))

    def loss_of(x):
        return smoothap_loss(x, TrainConfig(loss="smoothap",
                                            smoothap_tau=0.1))

    g = jax.grad(loss_of)(desc)
    stepped = desc - 0.1 * g

    def margin(x):
        s = jnp.einsum("bd,bkd->bk", x[:, 0], x[:, 1:])
        return float(jnp.mean(s[:, 0] - jnp.max(s[:, 1:], axis=-1)))

    assert margin(stepped) > margin(desc)


def test_trainer_step_with_smoothap(rng):
    """End-to-end: a Trainer step with loss='smoothap' runs and returns a
    finite loss in [0, 1]."""
    from instsearch_tpu.train import Trainer

    cfg = TrainConfig(backbone="vgg16", pooling="gem", image_size=32,
                      batch_size=2, num_negatives=2, dtype="float32",
                      loss="smoothap")
    tr = Trainer(cfg, seed=0)
    imgs = rng.integers(0, 256, (2, 4, 32, 32, 3), dtype=np.uint8)
    m = tr.step(imgs)
    loss = float(m["loss"])
    assert np.isfinite(loss) and 0.0 <= loss <= 1.0


def test_unknown_loss_rejected():
    from instsearch_tpu.train import Trainer
    with pytest.raises(ValueError, match="unknown loss"):
        Trainer(TrainConfig(loss="nope", image_size=32, dtype="float32"))
