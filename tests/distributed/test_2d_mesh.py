"""A single 2-D (data x shard) mesh composes DP extraction with index
row-sharding in one job — the full-machine layout for build-and-serve
(SURVEY.md §2.2: DP and shard are independent axes of the same device set).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.config import ExtractConfig
from instsearch_tpu.extractor import Extractor
from instsearch_tpu.parallel import ShardedIndex
from instsearch_tpu.parallel.mesh import make_mesh_2d
from instsearch_tpu.search import search_topk

CFG = ExtractConfig(backbone="resnet18", pooling="gem", image_size=32,
                    dtype="float32", batch_size=8)


@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh_2d(2, 4)


def test_dp_extraction_on_2d_mesh(mesh2d):
    single = Extractor(CFG, seed=0)
    dp = Extractor(CFG, variables=single.variables, seed=0, mesh=mesh2d)
    assert dp._dp_size == 2
    imgs = (np.random.default_rng(1).random((6, 32, 32, 3)) * 255
            ).astype(np.uint8)
    np.testing.assert_allclose(np.asarray(dp(imgs)),
                               np.asarray(single(imgs)),
                               rtol=1e-5, atol=1e-6)


def test_sharded_search_on_2d_mesh(mesh2d):
    rng = np.random.default_rng(2)
    X = rng.standard_normal((512, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    ids = np.arange(512, dtype=np.int32)
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids), mesh=mesh2d)
    assert sidx.axis == "shard" and sidx.mesh.shape["shard"] == 4
    Q = jnp.asarray(X[:3] + 0.001)
    s_d, i_d = sidx.search(Q, k=10)
    s_l, i_l = search_topk(jnp.asarray(X), Q, k=10)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_l))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_l), rtol=1e-5)


def test_build_and_serve_one_mesh(mesh2d):
    """Extract DP over 'data', serve sharded over 'shard' — same devices."""
    ex = Extractor(CFG, seed=0, mesh=mesh2d)
    imgs = (np.random.default_rng(3).random((64, 32, 32, 3)) * 255
            ).astype(np.uint8)
    descs = np.asarray(ex(imgs))
    ids = np.arange(64, dtype=np.int32)
    sidx = ShardedIndex(jnp.asarray(descs), jnp.asarray(ids), mesh=mesh2d,
                        k=5)
    _, i = sidx.search(jnp.asarray(descs[:4]), k=5)
    assert (np.asarray(i)[:, 0] == np.arange(4)).all()
    # QE and full ranking also run on the 2-D mesh
    _, iq = sidx.search_qe(jnp.asarray(descs[:4]), k=5, qe_n=3)
    assert (np.asarray(iq)[:, 0] == np.arange(4)).all()
    ranks = sidx.full_ranking(jnp.asarray(descs[:2]))
    assert ranks.shape == (2, 64)
    assert (ranks[:, 0] == np.arange(2)).all()
