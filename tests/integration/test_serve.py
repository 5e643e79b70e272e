"""`cli serve`: the JSON-lines serving loop over a saved index."""
import json
import os
import subprocess
import sys

import pytest

from instsearch_tpu import ExtractConfig, PipelineConfig, SearchConfig
from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.index import Index


@pytest.mark.slow
@pytest.mark.parametrize("sharded", [False, True])
def test_serve_loop(tmp_path, sharded):
    mini = make_mini_dataset(str(tmp_path / "mini"), seed=7)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem", image_size=64,
                              batch_size=8, dtype="float32"),
        search=SearchConfig(k=5, use_pallas=False))
    idx = Index.build(mini.db_paths, cfg, seed=0)
    idx_dir = str(tmp_path / "idx")
    idx.save(idx_dir)

    args = ["serve", "--index", idx_dir] + (["--sharded"] if sharded else [])
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; from instsearch_tpu.cli import main; "
            f"sys.exit(main({args!r}))")
    env = dict(os.environ)
    if sharded:                     # 8-virtual-device mesh in the server
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                         text=True, env=env)
    try:
        ready = json.loads(p.stdout.readline())
        assert ready["ready"] and ready["rows"] == len(mini.imlist)
        if sharded:
            assert ready["shards"] == 8

        # single query: a db image must self-match at rank 0
        p.stdin.write(json.dumps({"image": mini.db_paths[0], "k": 3}) + "\n")
        p.stdin.flush()
        r = json.loads(p.stdout.readline())
        assert r["results"][0][0]["name"] == mini.imlist[0]
        assert r["results"][0][0]["score"] > 0.99
        assert len(r["results"][0]) == 3
        assert r["latency_ms"] > 0

        # batch of two, default k
        p.stdin.write(json.dumps(
            {"images": [mini.db_paths[1], mini.db_paths[2]]}) + "\n")
        p.stdin.flush()
        r = json.loads(p.stdout.readline())
        assert [row[0]["name"] for row in r["results"]] == \
            [mini.imlist[1], mini.imlist[2]]
        assert len(r["results"]) == 2          # padded bucket rows dropped

        # k beyond the row count: strictly valid JSON, padded slots
        # (-Infinity / id -1) filtered out of the response (review r2)
        p.stdin.write(json.dumps({"image": mini.db_paths[0],
                                  "k": 60}) + "\n")
        p.stdin.flush()
        line_out = p.stdout.readline()
        assert "Infinity" not in line_out
        r = json.loads(line_out)
        assert len(r["results"][0]) == len(mini.imlist)
        assert all(e["id"] >= 0 for e in r["results"][0])

        # oversized batch (9 > largest warm bucket): split into warm
        # buckets, all rows answered in order (review r2)
        p.stdin.write(json.dumps(
            {"images": [mini.db_paths[i % len(mini.db_paths)]
                        for i in range(9)], "k": 2}) + "\n")
        p.stdin.flush()
        r = json.loads(p.stdout.readline())
        assert len(r["results"]) == 9
        assert [row[0]["name"] for row in r["results"]] == \
            [mini.imlist[i % len(mini.imlist)] for i in range(9)]
        assert all(len(row) == 2 for row in r["results"])   # k sliced

        # decode failure answers with error and keeps serving
        p.stdin.write(json.dumps({"image": "/nonexistent.jpg"}) + "\n")
        p.stdin.flush()
        assert "error" in json.loads(p.stdout.readline())
        # malformed requests (valid JSON, wrong shape/types) must answer
        # with error lines, never kill the long-lived server (review r2)
        for bad in ["42", "[1, 2]", json.dumps({"k": 3}),
                    json.dumps({"image": mini.db_paths[0], "k": None}),
                    json.dumps({"images": [1, 2]})]:
            p.stdin.write(bad + "\n")
            p.stdin.flush()
            assert "error" in json.loads(p.stdout.readline()), bad
        p.stdin.write(json.dumps({"image": mini.db_paths[3]}) + "\n")
        p.stdin.flush()
        r = json.loads(p.stdout.readline())
        assert r["results"][0][0]["name"] == mini.imlist[3]

        # dynamic corpus: remove a db image -> it stops matching itself
        n_rows = len(mini.imlist)
        p.stdin.write(json.dumps({"remove": [mini.imlist[0]]}) + "\n")
        p.stdin.flush()
        r = json.loads(p.stdout.readline())
        assert r == {"removed": 1, "rows": n_rows - 1,
                     "latency_ms": r["latency_ms"]}
        p.stdin.write(json.dumps({"image": mini.db_paths[0], "k": 3}) + "\n")
        p.stdin.flush()
        r = json.loads(p.stdout.readline())
        assert all(e["name"] != mini.imlist[0] for e in r["results"][0])

        # add a query image as a new row -> it self-matches at rank 0
        qpath = mini.image_path(mini.qimlist[0])
        p.stdin.write(json.dumps({"add": [qpath]}) + "\n")
        p.stdin.flush()
        r = json.loads(p.stdout.readline())
        assert r["added"] == 1 and r["rows"] == n_rows
        p.stdin.write(json.dumps({"image": qpath, "k": 1}) + "\n")
        p.stdin.flush()
        r = json.loads(p.stdout.readline())
        assert r["results"][0][0]["name"] == mini.qimlist[0]
        assert r["results"][0][0]["score"] > 0.99

        # removing an unknown name answers error, keeps serving
        p.stdin.write(json.dumps({"remove": ["no-such-name"]}) + "\n")
        p.stdin.flush()
        assert "error" in json.loads(p.stdout.readline())

        p.stdin.close()                 # EOF -> clean exit
        assert p.wait(timeout=120) == 0
    finally:
        if p.poll() is None:
            p.kill()


@pytest.mark.slow
def test_serve_batch_no_recompile(tmp_path):
    """Any request size (9, 130, ...) is served through the warmed bucket
    shapes ONLY — zero new XLA compilations after warm-up (a cold shape
    costs ~90-110 s through the TPU tunnel mid-request; review r2)."""
    import numpy as np
    from instsearch_tpu.cli import serve_batch, serve_buckets
    from tests.bench.test_no_recompile import _count_compiles

    mini = make_mini_dataset(str(tmp_path / "mini"), seed=9)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem", image_size=64,
                              batch_size=8, dtype="float32"),
        search=SearchConfig(k=5, use_pallas=False))
    idx = Index.build(mini.db_paths, cfg, seed=0)
    buckets = serve_buckets(cfg.search.query_chunk)
    assert buckets == [1, 2, 4, 8]
    scfg = idx.cfg.search
    for b in buckets:                                  # warm
        idx.query_images(np.zeros((b, 64, 64, 3), np.uint8))

    rng = np.random.default_rng(0)
    def run():
        for n in (9, 130):
            batch = (rng.random((n, 64, 64, 3)) * 255).astype(np.uint8)
            s, i = serve_batch(idx, None, batch, scfg, buckets)
            assert s.shape == (n, scfg.k) and i.shape == (n, scfg.k)

    assert _count_compiles(run) == 0


@pytest.mark.slow
def test_serve_lw_index_no_recompile(tmp_path):
    """An lw-enabled index serves through the same warm buckets: the lw
    composite (index._lw_composite_jit) is what the warm-up compiles, so
    oversized requests still trigger zero new compilations."""
    import numpy as np
    from instsearch_tpu.cli import serve_batch, serve_buckets
    from tests.bench.test_no_recompile import _count_compiles

    mini = make_mini_dataset(str(tmp_path / "mini"), seed=11)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem", image_size=64,
                              batch_size=8, dtype="float32"),
        search=SearchConfig(k=5, use_pallas=False, rerank_depth=16))
    idx = Index.build(mini.db_paths, cfg, seed=0)
    idx.fit_local_whitening(n_clusters=4, seed=0)
    assert idx.cfg.search.lw_enabled
    buckets = serve_buckets(idx.cfg.search.query_chunk)
    scfg = idx.cfg.search
    for b in buckets:                                  # warm
        idx.query_images(np.zeros((b, 64, 64, 3), np.uint8))

    rng = np.random.default_rng(1)
    def run():
        batch = (rng.random((9, 64, 64, 3)) * 255).astype(np.uint8)
        s, i = serve_batch(idx, None, batch, scfg, buckets)
        assert s.shape == (9, scfg.k) and (np.asarray(i) >= 0).all()

    assert _count_compiles(run) == 0


@pytest.mark.slow
def test_serve_ivfpq_index_no_recompile(tmp_path):
    """An IVF-PQ index serves through the same warm buckets: the cascade
    composite (search/ivfpq._ivfpq_composite_jit) is what the warm-up
    compiles, so oversized requests still trigger zero new
    compilations."""
    import numpy as np
    from instsearch_tpu.cli import serve_batch, serve_buckets
    from tests.bench.test_no_recompile import _count_compiles

    mini = make_mini_dataset(str(tmp_path / "mini"), seed=12)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem", image_size=64,
                              batch_size=8, dtype="float32"),
        search=SearchConfig(k=5, use_pallas=False))
    idx = Index.build(mini.db_paths, cfg, seed=0)
    idx.build_ivfpq(n_clusters=4, nprobe=2, m=8, depth=16, sample=None)
    assert idx.cfg.search.ivfpq_nprobe == 2
    buckets = serve_buckets(idx.cfg.search.query_chunk)
    scfg = idx.cfg.search
    for b in buckets:                                  # warm
        idx.query_images(np.zeros((b, 64, 64, 3), np.uint8))

    rng = np.random.default_rng(1)

    def run():
        batch = (rng.random((9, 64, 64, 3)) * 255).astype(np.uint8)
        s, i = serve_batch(idx, None, batch, scfg, buckets)
        assert s.shape == (9, scfg.k) and (np.asarray(i) >= 0).all()

    assert _count_compiles(run) == 0


def test_serve_reconstruct_request():
    """{"reconstruct": {"names"|"ids": [...]}} returns the stored rows
    through Index.reconstruct — in-process against ServeCore.handle_line
    (the stdin path); works on a descriptor-only index (no extractor)."""
    import numpy as np
    from instsearch_tpu import IndexConfig
    from instsearch_tpu.serve import ServeCore

    rng = np.random.default_rng(0)
    X = rng.standard_normal((32, 16)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(extract=ExtractConfig(dtype="float32"),
                         index=IndexConfig(dtype="float32", row_tile=8),
                         search=SearchConfig(k=3, use_pallas=False))
    idx = Index.from_descriptors(X, [f"im{i}" for i in range(32)], cfg)
    sc = ServeCore(idx)
    r = sc.handle_line(json.dumps({"reconstruct": {"names": ["im5", "im0"]}}))
    assert r["dim"] == 16
    np.testing.assert_allclose(np.asarray(r["vectors"], np.float32),
                               X[[5, 0]], rtol=1e-6)
    ids_np = np.asarray(idx.ids)[:32]
    r = sc.handle_line(json.dumps({"reconstruct": {"ids": [int(ids_np[7])]}}))
    np.testing.assert_allclose(np.asarray(r["vectors"], np.float32),
                               X[[7]], rtol=1e-6)
    r = sc.handle_line(json.dumps({"reconstruct": {"names": ["nope"]}}))
    assert "error" in r


def test_serve_range_request(tmp_path):
    """{"range": {"image": ..., "tau": ...}} returns every match above
    the threshold plus the exact count through Index.search_range."""
    import numpy as np
    from instsearch_tpu.serve import ServeCore

    mini = make_mini_dataset(str(tmp_path / "mini"), seed=13)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem", image_size=64,
                              batch_size=8, dtype="float32"),
        search=SearchConfig(k=3, use_pallas=False))
    idx = Index.build(mini.db_paths, cfg, seed=0)
    sc = ServeCore(idx)
    r = sc.handle_line(json.dumps(
        {"range": {"image": mini.db_paths[0], "tau": 0.999,
                   "max_results": 8}}))
    # the image itself scores ~1.0; count agrees with the result list
    assert r["count"] >= 1 and not r["truncated"]
    assert r["results"][0]["name"] == mini.imlist[0]
    assert len(r["results"]) == r["count"]
    assert all(e["score"] >= 0.999 - 1e-3 for e in r["results"])
    # oracle cross-check: count == number of rows >= tau for this query
    img = sc.decode({"image": mini.db_paths[0]})[0]
    q = np.asarray(idx.extractor(img))
    exact = int((np.asarray(idx._masked_scores(q))[0] >= 0.999).sum())
    assert r["count"] == exact
    # unknown subset -> error line, not a crash
    r = sc.handle_line(json.dumps(
        {"range": {"image": mini.db_paths[0], "tau": 0.5,
                   "subset": "nope"}}))
    assert "error" in r
