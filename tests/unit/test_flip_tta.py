"""Horizontal-flip TTA (ExtractConfig.flip): mirrored-pass averaging."""
import numpy as np
import pytest

from instsearch_tpu.config import ExtractConfig
from instsearch_tpu.extractor import Extractor


def _cfgs(flip):
    return ExtractConfig(backbone="vgg16", pooling="gem", image_size=32,
                         dtype="float32", batch_size=4, flip=flip)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(5)
    return rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)


def test_flip_makes_descriptors_mirror_invariant(images):
    """flip=True averages D(x) and D(mirror x), so a mirrored input yields
    the SAME descriptor (the two-element mean commutes); flip=False does
    not have this property — the contrast proves the flag acts."""
    mirrored = images[:, :, ::-1].copy()
    ex = Extractor(_cfgs(True), seed=0)
    d = np.asarray(ex(images))
    dm = np.asarray(ex(mirrored))
    np.testing.assert_allclose(d, dm, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, rtol=1e-5)

    ex0 = Extractor(_cfgs(False), seed=0)
    d0 = np.asarray(ex0(images))
    dm0 = np.asarray(ex0(mirrored))
    assert np.abs(d0 - dm0).max() > 1e-3


def test_flip_composes_with_multiscale(images):
    """Every scale contributes an unflipped and a flipped descriptor; the
    mirror-invariance holds across the multi-scale average too."""
    cfg = _cfgs(True).replace(scales=(1.0, 0.75))
    ex = Extractor(cfg, seed=0)
    d = np.asarray(ex(images))
    dm = np.asarray(ex(images[:, :, ::-1].copy()))
    np.testing.assert_allclose(d, dm, rtol=1e-4, atol=1e-5)


def test_flip_combined_build_keeps_regional_unflipped(images, rng):
    """The single-pass build path: the global descriptor averages the
    mirrored pass, but the regional store pools the UNFLIPPED scale-1.0
    map only (region geometry is side-dependent), so it matches the
    flip=False regional output exactly."""
    import jax
    from instsearch_tpu.extractor import build_combined_fn

    cfg = _cfgs(True).replace(rmac_levels=2)
    model, fn = build_combined_fn(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 3), np.float32))
    d, reg = jax.jit(fn)(variables, images, None)
    model0, fn0 = build_combined_fn(cfg.replace(flip=False))
    d0, reg0 = jax.jit(fn0)(variables, images, None)
    np.testing.assert_array_equal(np.asarray(reg), np.asarray(reg0))
    assert np.abs(np.asarray(d) - np.asarray(d0)).max() > 1e-4
    # and the global half agrees with the plain extract path
    ex = Extractor(cfg, variables=variables)
    np.testing.assert_allclose(np.asarray(ex(images)), np.asarray(d),
                               rtol=1e-5, atol=1e-6)
