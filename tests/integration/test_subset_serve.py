"""Named subset filters through the serving loop (serve.py +
search/subset.py): define_subset / per-query "subset" / drop_subset on
the image core, and ids/positions subsets on the capacity vector core.
In-process against ServeCore/VectorServeCore (the stdin/TCP transports
are protocol-tested in test_serve*.py; handle_line IS the stdin path)."""
import json

import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.index import Index
from instsearch_tpu.serve import ServeCore, VectorServeCore


@pytest.fixture(scope="module")
def core(tmp_path_factory):
    mini = make_mini_dataset(str(tmp_path_factory.mktemp("mini_sub")),
                             seed=3)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem",
                              image_size=64, batch_size=8,
                              dtype="float32"),
        search=SearchConfig(k=5, use_pallas=False))
    idx = Index.build(mini.db_paths, cfg, seed=0)
    return ServeCore(idx), mini


def _ask(core, req: dict) -> dict:
    return core.handle_line(json.dumps(req))


@pytest.mark.slow
def test_define_query_drop(core):
    sc, mini = core
    members = mini.imlist[::2]
    r = _ask(sc, {"define_subset": {"name": "evens", "members": members}})
    assert r["count"] == len(members) and "evens" in r["subsets"]

    # db image 1 is NOT a member: filtered top hit must differ from it
    r = _ask(sc, {"image": mini.db_paths[1], "k": 3, "subset": "evens"})
    names = [e["name"] for e in r["results"][0]]
    assert names and set(names) <= set(members)
    # unfiltered: self-match wins
    r2 = _ask(sc, {"image": mini.db_paths[1], "k": 3})
    assert r2["results"][0][0]["name"] == mini.imlist[1]

    r = _ask(sc, {"drop_subset": "evens"})
    assert "evens" not in r["subsets"]
    r = _ask(sc, {"image": mini.db_paths[1], "subset": "evens"})
    assert "error" in r and "unknown subset" in r["error"]


@pytest.mark.slow
def test_unknown_subset_is_an_error_line(core):
    sc, mini = core
    r = _ask(sc, {"image": mini.db_paths[0], "subset": "never-defined"})
    assert "error" in r


@pytest.mark.slow
def test_mutations_rebuild_subsets(core):
    sc, mini = core
    members = list(mini.imlist[:4])
    _ask(sc, {"define_subset": {"name": "four", "members": members}})
    removed = members[0]
    r = _ask(sc, {"remove": [removed]})
    assert r["removed"] == 1
    # the filter re-resolved over survivors: the removed member is gone,
    # queries keep working against the compacted positions
    assert sc.subsets["four"].count == 3
    r = _ask(sc, {"image": mini.db_paths[1], "k": 4, "subset": "four"})
    names = [e["name"] for e in r["results"][0]]
    assert removed not in names
    assert set(names) <= set(members[1:])
    # restore the row for other tests sharing the fixture
    r = _ask(sc, {"add": [mini.db_paths[0]]})
    assert r["added"] == 1


def test_vector_core_subsets(tmp_path):
    from instsearch_tpu.search.ivfpq import HostRowStore, IVFPQView

    rng = np.random.default_rng(5)
    X = rng.standard_normal((256, 32)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    store = HostRowStore.create(str(tmp_path / "st"), X, dtype="float32")
    view = IVFPQView.from_host_store(store, n_clusters=8, nprobe=8, m=8,
                                     depth=64, sample=None)
    vc = VectorServeCore(store, view, k=5)
    r = _ask(vc, {"define_subset": {"name": "quarters",
                                    "positions": list(range(0, 256, 4))}})
    assert r["count"] == 64
    r = _ask(vc, {"vector": [float(v) for v in X[2]], "subset": "quarters"})
    ids = [e["id"] for e in r["results"][0]]
    assert ids and all(i % 4 == 0 for i in ids)
    # row 2 itself is NOT a member — its filtered top-1 cannot be itself
    assert 2 not in ids
    # row mutations stay rejected
    r = _ask(vc, {"add": ["x"]})
    assert "error" in r
    # ids spec routes through store ids (positions here: none were given)
    r = _ask(vc, {"define_subset": {"name": "two", "ids": [0, 8]}})
    assert r["count"] == 2
    r = _ask(vc, {"vector": [float(v) for v in X[8]], "subset": "two"})
    assert r["results"][0][0]["id"] == 8
