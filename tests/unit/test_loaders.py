"""PrefetchLoader / grain pipeline / classic dataset gt-dir loader."""
import os

import numpy as np
import pytest

from instsearch_tpu.data import frontend
from instsearch_tpu.data.loader import PrefetchLoader, grain_dataset
from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.eval.datasets import load_classic


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    return make_mini_dataset(str(tmp_path_factory.mktemp("mini_ld")),
                             n_instances=2, n_views=2, n_distractors=1, seed=5)


def test_prefetch_matches_direct(mini):
    direct = list(frontend.batch_paths(mini.db_paths, 32, 4))
    prefetched = list(PrefetchLoader(mini.db_paths, 32, 4, depth=2))
    assert len(direct) == len(prefetched)
    for (a, ia), (b, ib) in zip(direct, prefetched):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(ia, ib)


def test_prefetch_quarantines(mini, tmp_path):
    bad = str(tmp_path / "bad.jpg")
    open(bad, "wb").write(b"junk")
    quarantine = []
    batches = list(PrefetchLoader([mini.db_paths[0], bad], 32, 2,
                                  quarantine=quarantine))
    assert quarantine == [bad]
    assert batches[0][1][1] == -1   # padded slot


def test_grain_pipeline(mini):
    ds = grain_dataset(mini.db_paths, 32, 4)
    batches = list(ds)
    total = sum((idx >= 0).sum() for _, idx in batches)
    assert total == len(mini.db_paths)
    img0 = frontend.load_square(mini.db_paths[0], 32)
    np.testing.assert_array_equal(batches[0][0][0], img0)


def test_load_classic_gt_dir(tmp_path, mini):
    """Synthesize the classic Oxford gt txt format and load it."""
    import shutil
    base = tmp_path / "oxford5k"
    (base / "gt").mkdir(parents=True)
    (base / "jpg").mkdir()
    # three db images + one query image reusing mini's jpgs
    names = ["all_souls_000001", "all_souls_000002", "radcliffe_000003",
             "query_img_0009"]
    for n, src in zip(names, mini.db_paths):
        shutil.copy(src, base / "jpg" / f"{n}.jpg")
    gt = base / "gt"
    (gt / "all_souls_1_query.txt").write_text(
        "oxc1_query_img_0009 10.0 20.0 200.0 300.0\n")
    (gt / "all_souls_1_good.txt").write_text("all_souls_000001\n")
    (gt / "all_souls_1_ok.txt").write_text("all_souls_000002\n")
    (gt / "all_souls_1_junk.txt").write_text("radcliffe_000003\n")

    ds = load_classic("oxford5k", str(tmp_path))
    assert ds.qimlist == ["query_img_0009"]
    assert len(ds.imlist) == 4
    e = ds.gnd[0]
    assert e["bbx"] == [10.0, 20.0, 200.0, 300.0]
    i = {n: k for k, n in enumerate(ds.imlist)}
    assert e["hard"] == [i["all_souls_000001"]]   # classic 'good'
    assert e["easy"] == [i["all_souls_000002"]]   # classic 'ok'
    assert e["junk"] == [i["radcliffe_000003"]]
    # evaluation protocol 'classic' = good+ok positives
    from instsearch_tpu.eval import evaluate_ranks
    ranks = np.array([[i["all_souls_000001"], i["radcliffe_000003"],
                       i["all_souls_000002"], i["query_img_0009"]]])
    res = evaluate_ranks(ranks, ds.gnd, "classic")
    assert res["mAP"] == pytest.approx(100.0)


def test_prefetch_early_exit_stops_producer(mini):
    """Abandoning iteration (break) must not leave the producer thread
    blocked on the bounded queue forever (review r2)."""
    import threading
    import time

    from instsearch_tpu.data.loader import iter_batches

    before = threading.active_count()
    for batch, idxs in iter_batches(mini.db_paths, 32, 2, depth=1):
        break                       # abandon immediately
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_load_dataset_mini_refuses_nondefault_fixture(tmp_path):
    """load_dataset('mini') regenerates the default fixture in place
    (byte-deterministic) but must refuse to clobber a fixture generated
    with non-default parameters (review r2)."""
    from instsearch_tpu.eval.datasets import load_dataset, make_mini_dataset

    root = str(tmp_path)
    make_mini_dataset(os.path.join(root, "mini"))          # default
    ds = load_dataset("mini", root)                        # fine: identical
    assert len(ds.imlist) > 0
    make_mini_dataset(os.path.join(root, "mini"), n_instances=10)
    with pytest.raises(ValueError, match="non-default"):
        load_dataset("mini", root)
