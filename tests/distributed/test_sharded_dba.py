"""Distributed αDBA: augment_database(mesh=...) routes neighbor
selection through the row-sharded machinery and must equal the
single-device augmentation."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.config import IndexConfig, PipelineConfig
from instsearch_tpu.index import Index
from instsearch_tpu.parallel import make_mesh


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _make(X, dtype="float32"):
    cfg = PipelineConfig(index=IndexConfig(dtype=dtype, row_tile=8))
    return Index.from_descriptors(X, [f"i{i}" for i in range(len(X))], cfg)


@pytest.mark.parametrize("dtype", ["float32", "int8", "int4"])
def test_sharded_dba_equals_single_device(dtype):
    rng = np.random.default_rng(71)
    X = _unit(rng.standard_normal((200, 32)).astype(np.float32))
    single = _make(X, dtype)
    single.augment_database(n=6, alpha=2.0, chunk=32)
    sharded = _make(X, dtype)
    sharded.augment_database(n=6, alpha=2.0, chunk=32, mesh=make_mesh(8))
    a = np.asarray(single.descriptors, np.float32)
    b = np.asarray(sharded.descriptors, np.float32)
    if dtype in ("int8", "int4"):
        # quantized storage: both requantize the same f32 augmentation —
        # values must match bit-for-bit (same quantizer, same input)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_allclose(np.asarray(single.scales),
                                   np.asarray(sharded.scales),
                                   rtol=1e-6, atol=1e-7)
    else:
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # search still works over the mesh-augmented store
    s, i = sharded.search(X[:3])
    assert (np.asarray(i)[:, 0] == np.arange(3)).all()
