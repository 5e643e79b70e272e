"""Data-parallel extraction on 8 fake CPU devices (SURVEY.md §2.2 DP row):
the DP-meshed Extractor must match the single-device Extractor on the same
weights, including non-divisible batch sizes (row padding) and the
extract_paths production loop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from instsearch_tpu.config import ExtractConfig
from instsearch_tpu.extractor import Extractor

CFG = ExtractConfig(backbone="resnet18", pooling="gem", image_size=32,
                    dtype="float32", batch_size=8)


@pytest.fixture(scope="module")
def extractors():
    single = Extractor(CFG, seed=0)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    dp = Extractor(CFG, variables=single.variables, seed=0, mesh=mesh)
    return single, dp


@pytest.mark.parametrize("batch", [8, 16, 5])   # 5 exercises pad-to-devices
def test_dp_matches_single_device(extractors, batch):
    single, dp = extractors
    imgs = (np.random.default_rng(batch).random(
        (batch, 32, 32, 3)) * 255).astype(np.uint8)
    d0 = np.asarray(single(imgs))
    d1 = np.asarray(dp(imgs))
    assert d1.shape == d0.shape == (batch, 512)
    np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-6)


def test_dp_output_is_batch_sharded(extractors):
    _, dp = extractors
    imgs = np.zeros((16, 32, 32, 3), np.uint8)
    out = dp._jit(dp.variables, *dp._place(imgs)[:1], None)
    # committed input sharding must propagate: no single device holds all rows
    shard_rows = {s.device.id: s.index[0] for s in out.addressable_shards}
    assert len(shard_rows) == 8


def test_dp_extract_paths(extractors, tmp_path):
    import cv2
    single, dp = extractors
    paths = []
    rng = np.random.default_rng(0)
    for i in range(11):
        p = str(tmp_path / f"img_{i}.png")
        cv2.imwrite(p, (rng.random((40, 48, 3)) * 255).astype(np.uint8))
        paths.append(p)
    d0, k0 = single.extract_paths(paths)
    d1, k1 = dp.extract_paths(paths)
    np.testing.assert_array_equal(k0, k1)
    np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-6)


def test_dp_regional_matches(extractors):
    single, dp = extractors
    imgs = (np.random.default_rng(7).random(
        (8, 32, 32, 3)) * 255).astype(np.uint8)
    r0 = np.asarray(single.extract_regional(imgs))
    r1 = np.asarray(dp.extract_regional(imgs))
    np.testing.assert_allclose(r1, r0, rtol=1e-5, atol=1e-6)
