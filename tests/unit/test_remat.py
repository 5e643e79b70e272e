"""TrainConfig.remat: rematerialized backbone pass is numerically exact."""
import numpy as np

from instsearch_tpu.config import TrainConfig
from instsearch_tpu.train import Trainer


def test_remat_step_matches_plain(rng):
    """jax.checkpoint trades FLOPs for activation memory; the loss and the
    updated parameters must be bit-compatible with the plain step (same
    weights, same batch) — remat changes WHEN activations exist, not any
    math."""
    imgs = rng.integers(0, 256, (2, 3, 32, 32, 3), dtype=np.uint8)
    base = TrainConfig(backbone="vgg16", pooling="gem", image_size=32,
                       batch_size=2, num_negatives=1, dtype="float32")
    t0 = Trainer(base, seed=0)
    t1 = Trainer(base.replace(remat=True), seed=0)
    m0 = t0.step(imgs)
    m1 = t1.step(imgs)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    p0 = t0.state.params
    p1 = t1.state.params
    for k in p0:
        a = np.asarray(
            p0[k] if not isinstance(p0[k], dict) else p0[k]["kernel"])
        b = np.asarray(
            p1[k] if not isinstance(p1[k], dict) else p1[k]["kernel"])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
