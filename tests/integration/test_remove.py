"""Index.remove(): in-place removal by name.

The kernel masks validity by row position (kernels/topk_matmul.py:156),
so removal compacts surviving tail rows into the holes — these tests pin
that the compaction (a) never returns removed ids, (b) keeps surviving
scores BIT-IDENTICAL to a fresh build (int8 rows move verbatim, no
requantization), (c) composes with add(), the regional store, and the
sharded view.
"""
import numpy as np
import pytest

from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index, attach_regional_store


def _mk(n=40, d=32, dtype="float32", capacity=128, seed=5, k=5):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(index=IndexConfig(dtype=dtype, row_tile=8,
                                           capacity=capacity),
                         search=SearchConfig(k=k, use_pallas=False))
    idx = Index.from_descriptors(X, [f"a{i}" for i in range(n)], cfg)
    return idx, X


def _scores_by_id(idx, q, n_ids):
    """[Q, n_ids] score table keyed by dataset id (row-order free)."""
    s = np.asarray(idx._masked_scores(q))
    ids = np.asarray(idx.ids)
    out = np.full((q.shape[0], n_ids), -np.inf, np.float32)
    for pos, i in enumerate(ids):
        if i >= 0:
            out[:, i] = s[:, pos]
    return out


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_remove_middle_and_tail(dtype):
    idx, X = _mk(dtype=dtype)
    n_pad = idx.descriptors.shape[0]
    removed_ids = [3, 17, 38, 39]            # middle holes + pure tail
    m = idx.remove([f"a{i}" for i in removed_ids])
    assert m == 4
    assert idx.num_valid == 36
    assert idx.descriptors.shape[0] == n_pad      # in place, no re-pad

    # valid rows stay a contiguous prefix (the kernel's mask invariant)
    ids = np.asarray(idx.ids)
    assert (ids[:36] >= 0).all() and (ids[36:] == -1).all()
    assert sorted(ids[:36]) == [i for i in range(40)
                                if i not in removed_ids]

    # search never returns a removed id; survivors still self-match
    q = X / np.linalg.norm(X, axis=1, keepdims=True)
    _, top = idx.search(q)
    assert not np.isin(np.asarray(top), removed_ids).any()
    keep = [i for i in range(40) if i not in removed_ids]
    assert (np.asarray(top)[keep, 0] == np.array(keep)).all()

    # surviving scores BIT-identical to a fresh build of the survivors
    # (rows + int8 scales moved verbatim — no requantization drift)
    fresh = Index.from_descriptors(
        X[keep], [f"a{i}" for i in keep], idx.cfg,
        original_ids=np.array(keep, np.int32))
    got = _scores_by_id(idx, q[:8], 40)[:, keep]
    want = _scores_by_id(fresh, q[:8], 40)[:, keep]
    assert np.array_equal(got, want)


def test_remove_unknown_name_raises_and_leaves_index_unchanged():
    idx, X = _mk()
    ids_before = np.asarray(idx.ids).copy()
    with pytest.raises(KeyError, match="nope"):
        idx.remove(["a1", "nope"])
    assert idx.num_valid == 40
    assert np.array_equal(np.asarray(idx.ids), ids_before)
    assert idx.remove([]) == 0


def test_remove_then_add_reuses_prefix():
    idx, X = _mk()
    idx.remove(["a0", "a39"])
    rng = np.random.default_rng(9)
    Y = rng.standard_normal((4, 32)).astype(np.float32)
    Y /= np.linalg.norm(Y, axis=1, keepdims=True)
    added = idx.add(descriptors=Y, names=[f"b{i}" for i in range(4)])
    assert added == 4 and idx.num_valid == 42
    ids = np.asarray(idx.ids)
    live = ids[ids >= 0]
    assert len(np.unique(live)) == len(live)       # ids stay unique
    _, top = idx.search(Y)
    new_ids = set(int(i) for i in np.asarray(top)[:, 0])
    assert len(new_ids) == 4                       # each new row found
    for i in np.asarray(top)[:, 0]:
        assert idx.name_of(int(i)).startswith("b")


def test_name_of_after_remove():
    idx, _ = _mk()
    idx.remove(["a7"])
    assert idx.name_of(7) is None                  # gone from the map
    assert idx.name_of(39) == "a39"                # tail row moved, id kept


def test_remove_with_regional_store_int8():
    rng = np.random.default_rng(11)
    n, d, r = 24, 16, 4
    X = rng.standard_normal((n, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    reg = rng.standard_normal((n, r, d)).astype(np.float32)
    cfg = PipelineConfig(
        index=IndexConfig(dtype="int8", row_tile=8),
        search=SearchConfig(k=3, use_pallas=False, rerank_depth=6,
                            rerank_enabled=True))
    idx = Index.from_descriptors(X, [f"a{i}" for i in range(n)], cfg)
    attach_regional_store(idx, reg)

    removed = [1, 10, 23]
    idx.remove([f"a{i}" for i in removed])
    keep = [i for i in range(n) if i not in removed]
    fresh = Index.from_descriptors(
        X[keep], [f"a{i}" for i in keep], cfg,
        original_ids=np.array(keep, np.int32))
    attach_regional_store(fresh, reg[keep])

    q = X[:5]
    qreg = rng.standard_normal((5, r, d)).astype(np.float32)
    s1, i1 = idx.search(q, query_regional=qreg)
    s2, i2 = fresh.search(q, query_regional=qreg)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))


def test_remove_sharded_parity():
    from instsearch_tpu.parallel import make_mesh
    idx, X = _mk(k=4)
    idx.remove(["a2", "a3", "a30"])
    q = X[:6]
    s_single, i_single = idx.search(q)
    sidx = idx.to_sharded(mesh=make_mesh())        # 8 virtual devices
    s_sh, i_sh = sidx.search(q, k=4)
    assert np.array_equal(np.asarray(i_single), np.asarray(i_sh))
    # scores differ by summation order across shards (ulp-level only)
    np.testing.assert_allclose(np.asarray(s_single), np.asarray(s_sh),
                               rtol=1e-6, atol=1e-6)


def test_remove_save_load_roundtrip(tmp_path):
    idx, X = _mk(dtype="int8")
    idx.remove(["a5", "a6", "a39"])
    s0, i0 = idx.search(X[:6])
    idx.save(str(tmp_path / "idx"))
    loaded = Index.load(str(tmp_path / "idx"))
    assert loaded.num_valid == 37
    s1, i1 = loaded.search(X[:6])
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    assert np.array_equal(np.asarray(s0), np.asarray(s1))
    # the loaded index can keep mutating
    loaded.remove(["a38"])
    _, top = loaded.search(X[:6])
    assert not np.isin(np.asarray(top), [5, 6, 38, 39]).any()


def test_cli_update_index(tmp_path):
    """`cli update-index`: the offline add/remove path over a saved
    index (daemon counterpart: serve's add/remove requests)."""
    import json as _json

    from instsearch_tpu import ExtractConfig
    from instsearch_tpu.cli import main
    from instsearch_tpu.eval import make_mini_dataset

    mini = make_mini_dataset(str(tmp_path / "mini"), seed=3)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem",
                              image_size=64, batch_size=8, dtype="float32"),
        search=SearchConfig(k=3, use_pallas=False))
    idx = Index.build(mini.db_paths, cfg, seed=0)
    idx_dir = str(tmp_path / "idx")
    idx.save(idx_dir)

    qpath = mini.image_path(mini.qimlist[0])
    rc = main(["update-index", "--index", idx_dir,
               "--remove", mini.imlist[0], mini.imlist[1],
               "--add", qpath])
    assert rc == 0
    updated = Index.load(idx_dir)
    assert updated.num_valid == len(mini.imlist) - 1
    assert mini.qimlist[0] in updated.names
    assert mini.imlist[0] not in updated.names

    # the added image self-matches through the reloaded extractor
    from instsearch_tpu.data import frontend
    img = frontend.load_square(qpath, 64)[None]
    _, ids = updated.query_images(img)
    assert updated.name_of(int(np.asarray(ids)[0, 0])) == mini.qimlist[0]

    # unknown name -> loud failure, index untouched
    with pytest.raises(KeyError):
        main(["update-index", "--index", idx_dir, "--remove", "nope"])


def test_remove_everything_but_one():
    idx, X = _mk(n=16, k=1)
    idx.remove([f"a{i}" for i in range(15)])
    assert idx.num_valid == 1
    _, top = idx.search(X[15:16])
    assert int(np.asarray(top)[0, 0]) == 15
