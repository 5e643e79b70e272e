"""Incremental indexing: Index.add() writes new rows into the pre-sized
capacity (IndexConfig.capacity) in place; overflow re-pads; int8 storage
quantizes added rows with fresh per-row scales."""
import numpy as np
import pytest
import jax.numpy as jnp

from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index


def _mk(n=40, d=32, dtype="float32", capacity=128, seed=5):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(index=IndexConfig(dtype=dtype, row_tile=8,
                                           capacity=capacity),
                         search=SearchConfig(k=5, use_pallas=False))
    idx = Index.from_descriptors(X, [f"a{i}" for i in range(n)], cfg)
    Y = rng.standard_normal((20, d)).astype(np.float32)
    Y /= np.linalg.norm(Y, axis=1, keepdims=True)
    return idx, X, Y


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_add_within_capacity(dtype):
    idx, X, Y = _mk(dtype=dtype)
    n_pad_before = idx.descriptors.shape[0]
    added = idx.add(descriptors=Y, names=[f"b{i}" for i in range(20)])
    assert added == 20
    assert idx.num_valid == 60
    assert idx.descriptors.shape[0] == n_pad_before   # in-place, no re-pad
    # old and new rows both searchable with correct ids
    _, i_old = idx.search(X[:3])
    assert (i_old[:, 0] == np.arange(3)).all()
    _, i_new = idx.search(Y[:3])
    assert (i_new[:, 0] == np.arange(40, 43)).all()
    assert idx.names[41] == "b1"


def test_add_overflow_repads():
    idx, X, Y = _mk(capacity=48)          # 40 + 20 > 48 -> re-pad
    idx.add(descriptors=Y, names=[f"b{i}" for i in range(20)])
    assert idx.num_valid == 60
    assert idx.descriptors.shape[0] >= 60
    _, i_new = idx.search(Y[:2])
    assert (i_new[:, 0] == np.arange(40, 42)).all()
    _, i_old = idx.search(X[:2])
    assert (i_old[:, 0] == np.arange(2)).all()


def test_add_overflow_int8_drift_bounded():
    """Capacity-overflow add() on int8 storage dequantizes and REQUANTIZES
    every existing row; the compounding quantization error must stay below
    one quantization step per element vs a fresh single-quantization build
    (review r2: the code comment admitted the drift but nothing bounded
    it). Double rounding adds at most half a step on top of the fresh
    build's half step, so scores over unit vectors stay within
    sqrt(D) * step."""
    idx, X, Y = _mk(dtype="int8", capacity=48)
    idx.add(descriptors=Y, names=[f"b{i}" for i in range(20)])  # re-pad

    Z = np.concatenate([X, Y])
    cfg = idx.cfg   # same (grown) capacity -> same padded shape
    fresh = Index.from_descriptors(Z, [f"c{i}" for i in range(60)], cfg)

    # element-level: dequantized rows within one quantization step
    deq_re = (np.asarray(idx.descriptors[:60], np.float32)
              * np.asarray(idx.scales)[0][:60, None])
    deq_fr = (np.asarray(fresh.descriptors[:60], np.float32)
              * np.asarray(fresh.scales)[0][:60, None])
    step = np.maximum(np.asarray(idx.scales)[0][:60],
                      np.asarray(fresh.scales)[0][:60])[:, None]
    assert (np.abs(deq_re - deq_fr) <= step + 1e-7).all()

    # score-level: same queries, same rows -> drift < sqrt(D) * step
    rng = np.random.default_rng(17)
    q = rng.standard_normal((8, X.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s_re = np.asarray(idx._masked_scores(q))[:, :60]
    s_fr = np.asarray(fresh._masked_scores(q))[:, :60]
    bound = np.sqrt(X.shape[1]) * step.max()
    assert np.abs(s_re - s_fr).max() < bound
    # and retrieval agrees with the fresh build
    _, i_re = idx.search(Z[:5])
    _, i_fr = fresh.search(Z[:5])
    np.testing.assert_array_equal(i_re[:, 0], i_fr[:, 0])


def test_add_int8_scales_written():
    idx, X, Y = _mk(dtype="int8")
    idx.add(descriptors=Y, names=[f"b{i}" for i in range(20)])
    sc = np.asarray(idx.scales)[0]
    assert (sc[40:60] > 0).all()          # fresh scales for new rows
    s, i = idx.search(Y[:1])
    assert i[0, 0] == 40 and s[0, 0] > 0.9


def test_add_paths_with_extractor(tmp_path):
    import cv2
    from instsearch_tpu.config import ExtractConfig
    rng = np.random.default_rng(0)

    def write(name):
        p = str(tmp_path / f"{name}.png")
        low = rng.random((8, 8, 3), np.float32)
        img = cv2.resize(low, (32, 32), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(p, (img * 255).astype(np.uint8))
        return p

    first = [write(f"x{i}") for i in range(6)]
    later = [write(f"y{i}") for i in range(4)]
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="resnet18", image_size=32,
                              dtype="float32", batch_size=4),
        index=IndexConfig(row_tile=8, capacity=32),
        search=SearchConfig(k=3, use_pallas=False))
    idx = Index.build(first, cfg, seed=0)
    assert idx.num_valid == 6
    added = idx.add(paths=later)
    assert added == 4 and idx.num_valid == 10
    # a freshly-added image must self-match through the image query path
    img = cv2.imread(later[0])[:, :, ::-1].copy()
    _, ids = idx.query_images(img[None])
    assert ids[0, 0] == 6
    # the grown index still serves sharded
    sidx = idx.to_sharded()
    q = np.asarray(idx.extractor(img[None]))
    _, i = sidx.search(jnp.asarray(q), k=3)
    assert np.asarray(i)[0, 0] == 6


def test_add_paths_extends_regional_store(tmp_path):
    import cv2
    from instsearch_tpu.config import ExtractConfig
    rng = np.random.default_rng(1)

    def write(name):
        p = str(tmp_path / f"{name}.png")
        low = rng.random((8, 8, 3), np.float32)
        img = cv2.resize(low, (32, 32), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(p, (img * 255).astype(np.uint8))
        return p

    first = [write(f"x{i}") for i in range(6)]
    later = [write(f"y{i}") for i in range(3)]
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="resnet18", image_size=32,
                              dtype="float32", batch_size=4),
        index=IndexConfig(row_tile=8, capacity=16),
        search=SearchConfig(k=3, use_pallas=False, rerank_enabled=True,
                            rerank_depth=8))
    idx = Index.build(first, cfg, seed=0)
    assert idx.regional is not None
    r_before = idx.regional.shape
    idx.add(paths=later)
    assert idx.num_valid == 9
    assert idx.regional.shape == r_before     # in capacity: same padding
    # regional rows for the added images are non-zero and re-rank works
    assert float(jnp.abs(idx.regional[6]).max()) > 0
    img = cv2.imread(later[0])[:, :, ::-1].copy()
    _, ids = idx.query_images(img[None])
    assert ids[0, 0] == 6


def test_add_without_regional_paths_raises():
    idx, X, Y = _mk()
    idx.regional = jnp.zeros((idx.descriptors.shape[0], 2, 32))
    with pytest.raises(ValueError):
        idx.add(descriptors=Y, names=["b0"])


def test_add_after_quarantine_ids_unique():
    """ids are dataset positions and exceed len(names) after a quarantined
    build; add() must allocate PAST the max id, never colliding."""
    rng = np.random.default_rng(7)
    X = rng.standard_normal((3, 32)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(index=IndexConfig(row_tile=8, capacity=16),
                         search=SearchConfig(k=3, use_pallas=False))
    # simulate: dataset position 2 was quarantined during build
    idx = Index.from_descriptors(X, ["a", "b", "d"], cfg,
                                 original_ids=np.array([0, 1, 3]))
    Y = rng.standard_normal((2, 32)).astype(np.float32)
    Y /= np.linalg.norm(Y, axis=1, keepdims=True)
    idx.add(descriptors=Y, names=["e", "f"])
    ids = np.asarray(idx.ids)
    valid = ids[ids >= 0]
    assert len(valid) == len(set(valid.tolist())), valid   # all unique
    assert set(valid.tolist()) == {0, 1, 3, 4, 5}
    _, i = idx.search(Y[:1])
    assert i[0, 0] == 4
