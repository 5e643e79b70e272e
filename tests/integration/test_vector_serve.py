"""Capacity-scale VECTOR serving (serve.VectorServeCore): a
HostRowStore + IVFPQView pair serving raw descriptor queries through the
same transport contract as image serving — stdin handle_line, TCP
micro-batching, cascade vs ADC-only modes, read-only semantics, and the
CLI flag path."""
import json
import socket
import threading

import numpy as np
import pytest

from instsearch_tpu.search.ivfpq import HostRowStore, IVFPQView
from instsearch_tpu.serve import VectorServeCore, serve_tcp


def _store_and_view(tmp_path, rng, n=512, d=32, ids=None):
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    store = HostRowStore.create(str(tmp_path / "store"), x, ids=ids)
    view = IVFPQView.from_host_store(store, n_clusters=8, nprobe=8, m=4,
                                     depth=n, kmeans_iters=3, pq_iters=3,
                                     sample=None)
    return x, store, view


def test_handle_line_cascade_and_errors(tmp_path, rng):
    x, store, view = _store_and_view(tmp_path, rng)
    core = VectorServeCore(store, view, k=5)
    core.warmup()
    info = core.ready_info()
    assert info["rows"] == len(x) and info["mode"] == "cascade"

    # self-query: exact cascade must put the row itself at rank 0
    r = core.handle_line(json.dumps({"vector": x[3].tolist(), "k": 3}))
    assert r["results"][0][0]["id"] == 3
    # int8 store: the exact re-score is against dequantized rows, so the
    # self-match lands within quantization error of 1.0
    assert r["results"][0][0]["score"] > 0.99
    assert len(r["results"][0]) == 3

    # batch form
    r = core.handle_line(json.dumps({"vectors": [x[1].tolist(),
                                                 x[2].tolist()]}))
    assert [row[0]["id"] for row in r["results"]] == [1, 2]

    # wrong dimension answers with an error line, not an exception
    r = core.handle_line(json.dumps({"vector": [1.0, 2.0]}))
    assert "error" in r

    # mutations are rejected: the store/view pair is offline-built
    r = core.handle_line(json.dumps({"add": ["x.jpg"]}))
    assert "read-only" in r["error"]


def test_adc_only_mode_and_store_ids(tmp_path, rng):
    ids = (np.arange(512, dtype=np.int32) + 1000)
    x, store, view = _store_and_view(tmp_path, rng, ids=ids)
    core = VectorServeCore(store, view, k=5, adc_only=True)
    assert core.ready_info()["mode"] == "adc"
    q = x[7] + 0.02 * rng.standard_normal(x.shape[1]).astype(np.float32)
    r = core.handle_line(json.dumps({"vector": q.tolist()}))
    top = r["results"][0]
    assert top[0]["id"] == 1007        # store ids, ADC-only self-match
    # ADC scores are approximate: close to 1, not exactly the cosine
    assert 0.5 < top[0]["score"] < 1.5

    # cascade mode must agree on the winner and report the exact score
    core2 = VectorServeCore(store, view, k=5)
    r2 = core2.handle_line(json.dumps({"vector": q.tolist()}))
    assert r2["results"][0][0]["id"] == 1007
    assert abs(r2["results"][0][0]["score"] - float(q @ x[7])) < 2e-2


def test_vector_serve_tcp_microbatching(tmp_path, rng):
    x, store, view = _store_and_view(tmp_path, rng)
    core = VectorServeCore(store, view, k=5, query_chunk=16)
    stop = threading.Event()
    port_box = {}
    ready = threading.Event()

    def ready_cb(port):
        port_box["port"] = port
        ready.set()

    t = threading.Thread(target=serve_tcp, daemon=True,
                         args=(core,),
                         kwargs=dict(port=0, ready_cb=ready_cb,
                                     stop_event=stop,
                                     batch_wait_ms=20.0))
    t.start()
    assert ready.wait(timeout=120)
    try:
        conns = [socket.create_connection(("127.0.0.1",
                                           port_box["port"]))
                 for _ in range(2)]
        files = [c.makefile("rwb") for c in conns]
        for i, f in enumerate(files):
            f.write((json.dumps({"vector": x[i].tolist(),
                                 "k": 2}) + "\n").encode())
            f.flush()
        outs = [json.loads(f.readline()) for f in files]
        for i, r in enumerate(outs):
            assert r["results"][0][0]["id"] == i
        # both replies report the batch they rode in (micro-batched or
        # at minimum the padded bucket width)
        assert all(r["batch_rows"] >= 1 for r in outs)
        for c in conns:
            c.close()
    finally:
        stop.set()
        t.join(timeout=10)


def test_cli_flag_validation(capsys):
    from instsearch_tpu.cli import main
    assert main(["serve", "--host-store", "/nonexistent"]) == 2
    assert "ivfpq-view" in capsys.readouterr().err
    assert main(["serve"]) == 2
    assert "--host-store" in capsys.readouterr().err
    assert main(["serve", "--host-store", "/x", "--ivfpq-view", "/y",
                 "--sharded"]) == 2
    assert "single-process" in capsys.readouterr().err
