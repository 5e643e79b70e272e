"""TCP serving with cross-client micro-batching (instsearch_tpu/serve.py).

The server runs in-process (ephemeral port, stop_event shutdown) over a
tiny real index; clients are plain sockets speaking JSON lines.
"""
import json
import socket
import threading
import time

import numpy as np
import pytest

from instsearch_tpu import ExtractConfig, PipelineConfig, SearchConfig
from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.index import Index
from instsearch_tpu.serve import ServeCore, serve_tcp


@pytest.fixture(scope="module")
def served_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_tcp")
    mini = make_mini_dataset(str(tmp / "mini"), seed=21)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem", image_size=64,
                              batch_size=8, dtype="float32"),
        search=SearchConfig(k=5, use_pallas=False))
    idx = Index.build(mini.db_paths, cfg, seed=0)
    return mini, idx


@pytest.fixture()
def tcp_server(served_index):
    """Start serve_tcp on an ephemeral port; yields (mini, connect_fn)."""
    mini, idx = served_index
    core = ServeCore(idx)
    stop = threading.Event()
    port_box: "list[int]" = []
    got_port = threading.Event()

    def ready(p):
        port_box.append(p)
        got_port.set()

    t = threading.Thread(
        target=serve_tcp, daemon=True,
        kwargs=dict(core=core, port=0, batch_wait_ms=150.0,
                    ready_cb=ready, stop_event=stop))
    t.start()
    assert got_port.wait(timeout=300), "server never came up"

    conns = []

    def connect():
        s = socket.create_connection(("127.0.0.1", port_box[0]), timeout=60)
        f = s.makefile("rw")
        conns.append((s, f))
        return f

    yield mini, connect
    stop.set()
    for s, f in conns:
        try:
            s.close()
        except OSError:
            pass
    t.join(timeout=10)


def _ask(f, req) -> dict:
    f.write(json.dumps(req) + "\n")
    f.flush()
    return json.loads(f.readline())


def test_tcp_query_roundtrip(tcp_server):
    mini, connect = tcp_server
    f = connect()
    r = _ask(f, {"image": mini.db_paths[0], "k": 3})
    assert r["results"][0][0]["name"] == mini.imlist[0]
    assert r["results"][0][0]["score"] > 0.99
    assert len(r["results"][0]) == 3
    assert r["latency_ms"] > 0 and r["batch_rows"] >= 1
    # errors answer on the same connection, which stays usable
    assert "error" in _ask(f, {"image": "/nonexistent.jpg"})
    f.write("not json\n")
    f.flush()
    assert "error" in json.loads(f.readline())
    f.write("[1, 2]\n")                    # non-object JSON
    f.flush()
    assert "error" in json.loads(f.readline())
    r = _ask(f, {"image": mini.db_paths[1]})
    assert r["results"][0][0]["name"] == mini.imlist[1]
    # k beyond rows: strict JSON, padded slots dropped
    f.write(json.dumps({"image": mini.db_paths[0], "k": 60}) + "\n")
    f.flush()
    line = f.readline()
    assert "Infinity" not in line
    assert all(e["id"] >= 0 for e in json.loads(line)["results"][0])


def test_tcp_cross_client_microbatching(tcp_server):
    """Concurrent queries from separate connections within the batching
    window run as ONE device batch: batch_rows > 1 on the co-batched
    responses."""
    mini, connect = tcp_server
    files = [connect() for _ in range(3)]
    # one warm round trip per connection so the server threads exist
    for i, f in enumerate(files):
        _ask(f, {"image": mini.db_paths[i], "k": 1})

    out: "list[dict]" = [None] * 3
    barrier = threading.Barrier(3)

    def fire(i):
        barrier.wait()
        out[i] = _ask(files[i], {"image": mini.db_paths[i], "k": 2})

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None for r in out)
    for i, r in enumerate(out):
        assert r["results"][0][0]["name"] == mini.imlist[i]
    # the 150 ms window is far wider than the fire skew: at least one
    # response must have been co-batched with another client's query
    assert max(r["batch_rows"] for r in out) >= 2


def test_tcp_mutation_barrier(tcp_server):
    """remove -> query on one connection: the mutation is a dispatcher
    barrier, so the following query must see the mutated corpus."""
    mini, connect = tcp_server
    f = connect()
    victim = mini.imlist[4]
    r = _ask(f, {"remove": [victim]})
    assert r["removed"] == 1
    r = _ask(f, {"image": mini.db_paths[4], "k": 5})
    assert all(e["name"] != victim for e in r["results"][0])
    # failing mutation answers an error line, server keeps serving
    assert "error" in _ask(f, {"remove": ["no-such-name"]})
    qpath = mini.image_path(mini.qimlist[0])
    r = _ask(f, {"add": [qpath]})
    assert r["added"] == 1
    r = _ask(f, {"image": qpath, "k": 1})
    assert r["results"][0][0]["name"] == mini.qimlist[0]
