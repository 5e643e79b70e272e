"""SubsetFilter construction + staleness semantics (search/subset.py)."""
import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index
from instsearch_tpu.search.subset import SubsetFilter, build_position_mask


def _index(rng, n=120, d=16, dtype="float32"):
    X = rng.standard_normal((n, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(extract=ExtractConfig(dtype="float32"),
                         index=IndexConfig(dtype=dtype, row_tile=8),
                         search=SearchConfig(k=5, use_pallas=False))
    return Index.from_descriptors(X, [f"im{i}" for i in range(n)], cfg), X


def test_make_subset_by_names(rng):
    idx, _ = _index(rng)
    sub = idx.make_subset(names=["im3", "im7", "im11"])
    assert isinstance(sub, SubsetFilter)
    assert sub.count == 3
    assert sub.mask.shape == (1, idx.descriptors.shape[0])
    m = np.asarray(sub.mask)[0]
    assert set(np.flatnonzero(m)) == {3, 7, 11}
    assert sub.names == ("im3", "im7", "im11")


def test_make_subset_by_ids(rng):
    idx, _ = _index(rng)
    ids_np = np.asarray(idx.ids)[:idx.num_valid]
    sub = idx.make_subset(ids=[int(ids_np[5]), int(ids_np[9])])
    m = np.asarray(sub.mask)[0]
    assert set(np.flatnonzero(m)) == {5, 9}


def test_make_subset_by_raw_mask_clips_padding(rng):
    idx, _ = _index(rng)
    n_pad = idx.descriptors.shape[0]
    raw = np.ones(n_pad, bool)          # naively allows padding rows too
    sub = idx.make_subset(mask=raw)
    assert sub.count == idx.num_valid   # padding rows clipped out


def test_unknown_members_raise(rng):
    idx, _ = _index(rng)
    with pytest.raises(KeyError):
        idx.make_subset(names=["im3", "nope"])
    with pytest.raises(KeyError):
        idx.make_subset(ids=[999_999])


def test_exactly_one_spec(rng):
    idx, _ = _index(rng)
    with pytest.raises(ValueError):
        build_position_mask(idx)
    with pytest.raises(ValueError):
        build_position_mask(idx, names=["im1"], ids=[1])


def test_remove_invalidates(rng):
    idx, _ = _index(rng)
    Q = np.asarray(idx.descriptors)[:2]
    sub = idx.make_subset(names=["im3", "im7"])
    idx.search(Q, subset=sub)           # fresh filter: fine
    idx.remove(["im0"])                 # positions move
    with pytest.raises(ValueError, match="stale"):
        idx.search(Q, subset=sub)
    sub2 = idx.make_subset(names=["im3", "im7"])   # rebuilt: fine again
    idx.search(Q, subset=sub2)


def test_add_keeps_filter_valid_new_rows_excluded(rng):
    idx, X = _index(rng, n=100)
    # capacity is padded past 100 (row_tile) — this add stays in place
    sub = idx.make_subset(names=[f"im{i}" for i in range(100)])
    new = rng.standard_normal((2, X.shape[1])).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    idx.add(descriptors=new, names=["new0", "new1"])
    s, i = idx.search(new, subset=sub)  # the new rows' best match is
    got = set(np.asarray(i).ravel())    # themselves — but they are NOT
    ids_np = np.asarray(idx.ids)        # members, so they never come back
    new_ids = {int(ids_np[100]), int(ids_np[101])}
    assert not (got & new_ids)


def test_empty_subset_returns_padding(rng):
    idx, X = _index(rng)
    sub = idx.make_subset(names=[])
    assert sub.count == 0
    s, i = idx.search(X[:2], subset=sub)
    assert (np.asarray(i) == -1).all()
    assert (np.asarray(s) == -np.inf).all()


def test_adhoc_specs_match_prebuilt(rng):
    idx, X = _index(rng)
    names = [f"im{i}" for i in range(0, 120, 5)]
    want = idx.search(X[:3], subset=idx.make_subset(names=names))
    got_names = idx.search(X[:3], subset=names)
    ids_np = np.asarray(idx.ids)
    got_ids = idx.search(X[:3],
                         subset=[int(ids_np[i]) for i in range(0, 120, 5)])
    np.testing.assert_array_equal(got_names[1], want[1])
    np.testing.assert_array_equal(got_ids[1], want[1])
