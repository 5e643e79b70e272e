"""Serving runtime: warm-bucket request handling over stdin or TCP.

The reference has no serving story (SURVEY.md §1.1: linear notebook
scripts); this module is the production path for the online query stack
(SURVEY.md §3.2). Two transports share one core:

- **stdin/stdout JSON-lines** (``cli serve``): one request per line, one
  response line — scriptable, single-client.
- **TCP JSON-lines** (``cli serve --port N``): many concurrent clients,
  one line-delimited JSON connection each, with **cross-client
  micro-batching**: requests that arrive within ``batch_wait_ms`` of each
  other are concatenated into ONE device batch through the warm bucket
  shapes. On TPU this is the difference between paying the fixed
  per-program dispatch cost per client and amortizing it across them —
  the fused kernel's cost is per-scan, not per-query, until the merge
  bound (docs/ARCHITECTURE.md), so co-batched queries are nearly free.

Threading contract: JAX device work is NOT thread-safe to interleave, so
exactly ONE thread touches the device — the caller's loop thread in
stdin mode, the dispatcher thread in TCP mode. Connection reader threads
only parse JSON and decode images (host work that releases the GIL).
Mutations (``add``/``remove``) are barriers: the dispatcher stops
filling a batch when it meets one, so global queue order is preserved
(a client that sends ``remove`` then ``query`` sees its own mutation
applied first).
"""
from __future__ import annotations

import json
import queue
import socket
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np


def serve_buckets(query_chunk: int) -> list[int]:
    """The warm bucket sizes for serving: powers of two up to
    min(8, query_chunk). Small on purpose — each bucket is one compiled
    program at startup (~90-110 s each through this environment's TPU
    tunnel), and splitting covers every larger request (serve_batch)."""
    buckets = [1]
    while buckets[-1] < min(8, max(1, query_chunk or 8)):
        buckets.append(buckets[-1] * 2)
    return buckets


def serve_batch(idx, sidx, batch, scfg, buckets, subset=None):
    """Serve an image batch of ANY size through warm bucket shapes only:
    oversized requests are SPLIT into largest-bucket chunks (remainder
    padded up to the smallest covering bucket), so no request length can
    trigger an XLA recompile mid-request — ~90-110 s per cold program
    through the axon tunnel, the exact stall the buckets exist to prevent
    (review r2: padding only covered lengths <= max(buckets); 9..chunk
    ran a cold shape). ``subset``: an optional SubsetFilter restricting
    results (search/subset.py) — filter PRESENCE toggles the compiled
    program, filter VALUES do not, so all registered subsets share the
    same warm programs."""
    n = batch.shape[0]
    out_s, out_i = [], []
    pos = 0
    while pos < n:
        rem = n - pos
        b = next((x for x in buckets if x >= rem), buckets[-1])
        take = min(rem, b)
        piece = batch[pos:pos + take]
        if take < b:                       # pad up to the warm bucket
            piece = np.concatenate(
                [piece, np.repeat(piece[-1:], b - take, axis=0)])
        s, i = idx.query_images(piece, scfg, sharded_index=sidx,
                                subset=subset)
        out_s.append(s[:take])
        out_i.append(i[:take])
        pos += take
    return np.concatenate(out_s), np.concatenate(out_i)


@dataclass
class _Job:
    kind: str                        # "query" | "mutate"
    req: dict
    images: Optional[np.ndarray]     # decoded [B, S, S, 3] uint8 (query)
    reply: Callable[[dict], None]
    enqueued: float = field(default_factory=time.perf_counter)

    @property
    def batch_key(self):
        """Micro-batching compatibility: jobs co-batch only when they run
        the SAME device program against the same filter — one mask per
        device batch (the mask is a per-batch operand, not per-query)."""
        return self.req.get("subset")


class ServeCore:
    """Owns the index, the optional sharded view and the warm programs.

    ``decode`` is host-only and safe on any thread; ``mutate`` and
    ``run_queries`` touch the device and must stay on ONE thread.
    """

    def __init__(self, idx, sharded: bool = False,
                 spill_reserve: int = 4096):
        self.idx = idx
        self.sidx = idx.to_sharded() if sharded else None
        self.size = idx.cfg.extract.image_size
        self.warm_k = idx.cfg.search.k
        self.buckets = serve_buckets(idx.cfg.search.query_chunk)
        # named subset filters (search/subset.py): defined by clients
        # ({"define_subset": ...}), referenced per query ({"subset": nm}).
        # Kept by member NAMES so index mutations can rebuild them.
        self.subsets: dict = {}
        self._subset_warmed = False
        # pre-grow attached views' spill arrays: search-program trace
        # shapes include them, and a well-balanced build ships an EMPTY
        # spill — without the reservation the FIRST live add grows the
        # spill and the next IVF/IVF-PQ-routed query recompiles
        # (~90-110 s through this box's tunnel). Growth past the
        # reservation still recompiles (power-of-two steps bound it to
        # once per doubling).
        if spill_reserve:
            if idx.ivf is not None:
                idx.ivf.reserve_spill(spill_reserve, idx)
            if idx.ivfpq is not None:
                idx.ivfpq.reserve_spill(spill_reserve)

    def query_cap(self) -> int:
        """Micro-batch row cap for the TCP dispatcher."""
        return self.idx.cfg.search.query_chunk or 128

    def warmup(self) -> None:
        for b in self.buckets:
            self.idx.query_images(
                np.zeros((b, self.size, self.size, 3), np.uint8),
                sharded_index=self.sidx)

    def ready_info(self) -> dict:
        ready = {"ready": True, "rows": self.idx.num_valid,
                 "dim": self.idx.dim}
        if self.sidx is not None:
            ready["shards"] = int(self.sidx.mesh.shape[self.sidx.axis])
        return ready

    # ---- host side (any thread) --------------------------------------
    def decode(self, req: dict) -> tuple[np.ndarray, int]:
        """Request dict -> (decoded image batch, requested k). Raises on
        missing/undecodable paths or a bad k — the transport answers with
        an error line."""
        from .data import frontend
        paths = req.get("images") or [req["image"]]
        imgs = [frontend.load_square(p, self.size) for p in paths]
        bad = [p for p, im in zip(paths, imgs) if im is None]
        if bad:
            raise ValueError(f"cannot decode: {bad}")
        return np.stack(imgs), int(req.get("k", self.warm_k))

    # ---- device side (single thread) ---------------------------------
    def define_subset(self, name: str, members) -> dict:
        """Register a named collection filter. The FIRST definition warms
        the masked program variants for every bucket (mask PRESENCE
        toggles the program; mask VALUES don't — later subsets reuse
        them), so steady-state filtered queries never compile."""
        sub = self.idx.make_subset(names=list(members))
        self.subsets[name] = sub
        if not self._subset_warmed:
            for b in self.buckets:
                self.idx.query_images(
                    np.zeros((b, self.size, self.size, 3), np.uint8),
                    sharded_index=self.sidx, subset=sub)
            self._subset_warmed = True
        return {"subset": name, "count": sub.count,
                "subsets": sorted(self.subsets)}

    def _refresh_subsets(self) -> None:
        """Rebuild registered filters after an index mutation moved row
        positions (remove / capacity-growing add): surviving member names
        re-resolve; removed members drop out of their collections."""
        alive = set(self.idx.names)
        for nm, sub in list(self.subsets.items()):
            if (sub.layout_gen == self.idx._layout_gen
                    and sub.n_pad == self.idx.descriptors.shape[0]):
                continue
            members = [m for m in (sub.names or ()) if m in alive]
            self.subsets[nm] = self.idx.make_subset(names=members)

    def mutate(self, req: dict) -> dict:
        t0 = time.perf_counter()
        if "define_subset" in req:
            spec = req["define_subset"]
            resp = self.define_subset(spec["name"], spec["members"])
        elif "drop_subset" in req:
            self.subsets.pop(req["drop_subset"], None)
            resp = {"dropped": req["drop_subset"],
                    "subsets": sorted(self.subsets)}
        elif "add" in req:
            n = self.idx.add(paths=list(req["add"]))
            self._refresh_subsets()
            resp = {"added": n}
        else:
            n = self.idx.remove(list(req["remove"]))
            self._refresh_subsets()
            resp = {"removed": n}
        if self.sidx is not None and ("add" in req or "remove" in req):
            self.sidx = self.idx.to_sharded()  # re-place mutated rows
        resp["rows"] = self.idx.num_valid
        resp["latency_ms"] = round((time.perf_counter() - t0) * 1e3, 3)
        return resp

    def run_queries(self, jobs: "list[tuple[np.ndarray, int]]",
                    subset: "str | None" = None) -> list[dict]:
        """One device pass for a list of (images, req_k) query jobs —
        possibly from different clients (TCP micro-batching). Runs at the
        warm top-k width when every request fits inside it; only a
        k > warm_k compiles a new width (once, then cached). ``subset``:
        registered filter name shared by every job in the batch (the
        dispatcher only co-batches jobs with equal batch_key)."""
        sub = None
        if subset is not None:
            sub = self.subsets.get(subset)
            if sub is None:
                raise KeyError(f"unknown subset {subset!r} — define it "
                               f"first ({{'define_subset': ...}})")
        ks = [k for _, k in jobs]
        k_run = self.warm_k if max(ks) <= self.warm_k else max(ks)
        scfg = self.idx.cfg.search.replace(k=k_run)
        batch = (jobs[0][0] if len(jobs) == 1
                 else np.concatenate([im for im, _ in jobs]))
        t0 = time.perf_counter()
        scores, ids = serve_batch(self.idx, self.sidx, batch, scfg,
                                  self.buckets, subset=sub)
        latency = round((time.perf_counter() - t0) * 1e3, 3)
        out, pos = [], 0
        for images, req_k in jobs:
            b = images.shape[0]
            s, i = scores[pos:pos + b], ids[pos:pos + b]
            pos += b
            # padded slots (id -1 / -inf) are dropped: -inf serializes as
            # the non-standard JSON token -Infinity and breaks clients
            results = [[{"rank": r, "name": self.idx.name_of(ii),
                         "id": int(ii), "score": float(ss)}
                        for r, (ss, ii) in enumerate(zip(srow[:req_k],
                                                         irow[:req_k]))
                        if ii >= 0]
                       for srow, irow in zip(s, i)]
            out.append({"results": results, "latency_ms": latency,
                        "batch_rows": int(batch.shape[0])})
        return out

    def handle_line(self, line: str) -> dict:
        """stdin-mode request handling: parse -> decode -> device, all on
        the caller's thread. Never raises — a long-lived server must
        answer bad requests with an error line, not die mid-stream."""
        try:
            req = json.loads(line)
            if _is_mutation(req):
                return self.mutate(req)
            if "range" in req:
                # {"range": {"image": P, "tau": T[, "max_results": M]
                #            [, "subset": name]}} -> every match scoring
                # >= tau + the EXACT count (Index.search_range). Single
                # image only: the b=1 extraction is already warm; the
                # top-M/count programs compile once per distinct M
                # (default 256), then cache.
                spec = req["range"]
                images, _ = self.decode({"image": spec["image"]})
                sub = None
                if spec.get("subset") is not None:
                    sub = self.subsets.get(spec["subset"])
                    if sub is None:
                        raise KeyError(f"unknown subset {spec['subset']!r}")
                q = self.idx.extractor(images)
                s, i, counts = self.idx.search_range(
                    q, float(spec["tau"]),
                    max_results=int(spec.get("max_results", 256)),
                    subset=sub)
                n = int(counts[0])
                results = [{"rank": r, "name": self.idx.name_of(ii),
                            "id": int(ii), "score": float(ss)}
                           for r, (ss, ii) in enumerate(zip(s[0], i[0]))
                           if ii >= 0]
                return {"results": results, "count": n,
                        "truncated": n > len(results)}
            if "reconstruct" in req:
                # stored-row readback ({"reconstruct": {"names": [...]}}
                # or {"ids": [...]}): Index.reconstruct pads positions to
                # a power of two, so request sizes share ~log2 compiled
                # gather programs (first size in a bucket compiles once)
                spec = req["reconstruct"]
                rows = self.idx.reconstruct(names=spec.get("names"),
                                            ids=spec.get("ids"))
                return {"vectors": rows.tolist(), "dim": int(rows.shape[1])}
            images, req_k = self.decode(req)
            return self.run_queries([(images, req_k)],
                                    subset=req.get("subset"))[0]
        except Exception as e:    # noqa: BLE001
            return {"error": f"{type(e).__name__}: {e}"}


def _is_mutation(req: dict) -> bool:
    return ("add" in req or "remove" in req or "define_subset" in req
            or "drop_subset" in req)


class VectorServeCore:
    """Capacity-scale vector serving: a :class:`HostRowStore` +
    :class:`IVFPQView` pair (search/ivfpq.py) serving raw DESCRIPTOR
    queries — the deployment form where the exact rows (32 GB+ at 64M×512)
    live in a memory-mapped host file and only the ~2 GB of codes sit on
    the chip, so there is no device-resident Index and no image extractor.

    Satisfies the ServeCore transport contract (decode / mutate /
    run_queries / ready_info / warmup / query_cap / handle_line), so the
    stdin loop and :func:`serve_tcp` (cross-client micro-batching
    included) drive it unchanged.

      request:  {"vector": [f32 × D]} | {"vectors": [[...], ...]}
                [+ "k": int] [+ "subset": NAME]
                | {"define_subset": {"name": N, "ids": [...]}}
                |                   {... "positions": [...]}}
                | {"drop_subset": N}
      response: {"results": [[{rank, id, score}, ...] per vector], ...}

    ``id`` is the store's id (row position when the store carries none);
    there are no names — descriptor-space serving has no path metadata.
    Mutations are rejected: the store/view pair is built offline
    (rebuild and restart to change the corpus).

    Two quality modes, fixed at startup: the exact host-gather cascade
    (``IVFPQView.search_host`` — per-query random reads of depth rows
    from the memmap, exact re-score) or ADC-only (``adc_only=True`` →
    ``IVFPQView.search_adc`` — ranking straight from the pruned on-chip
    scan, NO host gather: the latency mode; fit the view with
    ``anisotropic_t`` to hold raw-ADC quality, see ops/pq.py).
    """

    def __init__(self, store, view, k: int = 10, adc_only: bool = False,
                 query_chunk: int = 128):
        self.store = store
        self.view = view
        self.warm_k = k
        self.adc_only = adc_only
        self._cap = query_chunk or 128
        self.buckets = serve_buckets(self._cap)
        # named subset filters over store rows: {"define_subset":
        # {"name": ..., "ids": [...store ids...]}} (or "positions").
        # Each is a device-resident [1, N] int8 mask — N bytes on chip
        # per registered collection (64 MB at 64M rows); the corpus is
        # read-only, so filters never go stale.
        self.subsets: dict = {}
        if view.codebook.dim != store.d:
            raise ValueError(f"view dim {view.codebook.dim} != store "
                             f"dim {store.d}")

    def query_cap(self) -> int:
        return self._cap

    def define_subset(self, name: str, ids=None, positions=None) -> dict:
        import jax.numpy as jnp
        if (ids is None) == (positions is None):
            raise ValueError("define_subset needs exactly one of "
                             "ids= / positions=")
        allow = np.zeros(self.store.n, bool)
        if positions is not None:
            p = np.asarray(list(positions), np.int64)
            if p.size and (p.min() < 0 or p.max() >= self.store.n):
                raise ValueError("subset positions out of range")
            allow[p] = True
        elif self.store.ids is None:       # ids ARE positions then
            return self.define_subset(name, positions=ids)
        else:
            want = np.asarray(list(ids))
            hit = np.isin(self.store.ids, want)
            if hit.sum() < len(np.unique(want)):
                raise KeyError("some subset ids are not in the store")
            allow = hit
        mask = jnp.asarray(allow[None, :].astype(np.int8))
        self.subsets[name] = mask
        return {"subset": name, "count": int(allow.sum()),
                "subsets": sorted(self.subsets)}

    # ---- host side (any thread) --------------------------------------
    def decode(self, req: dict) -> tuple[np.ndarray, int]:
        """Request dict -> (query vectors [B, D] f32, requested k)."""
        vecs = req.get("vectors")
        if vecs is None:
            vecs = [req["vector"]]
        arr = np.asarray(vecs, np.float32)
        if arr.ndim != 2 or arr.shape[1] != self.store.d:
            raise ValueError(
                f"vectors must be [B, {self.store.d}] (got {arr.shape})")
        return arr, int(req.get("k", self.warm_k))

    # ---- device side (single thread) ---------------------------------
    def mutate(self, req: dict) -> dict:
        if "define_subset" in req:
            spec = req["define_subset"]
            return self.define_subset(spec["name"], ids=spec.get("ids"),
                                      positions=spec.get("positions"))
        if "drop_subset" in req:
            self.subsets.pop(req["drop_subset"], None)
            return {"dropped": req["drop_subset"],
                    "subsets": sorted(self.subsets)}
        raise ValueError("host-store serving is read-only; rebuild the "
                         "store/view offline and restart")

    def _search(self, q: np.ndarray, k: int, mask=None):
        if self.adc_only:
            return self.view.search_adc(q, k=k, ids=self.store.ids,
                                        mask=mask)
        return self.view.search_host(self.store, q, k=k, mask=mask)

    def warmup(self) -> None:
        for b in self.buckets:
            self._search(np.zeros((b, self.store.d), np.float32),
                         self.warm_k)

    def ready_info(self) -> dict:
        return {"ready": True, "rows": self.store.n, "dim": self.store.d,
                "mode": "adc" if self.adc_only else "cascade",
                "nprobe": self.view.nprobe, "depth": self.view.depth}

    def run_queries(self, jobs: "list[tuple[np.ndarray, int]]",
                    subset: "str | None" = None) -> list[dict]:
        """One device pass per micro-batch, padded up to the nearest warm
        bucket so steady-state requests never compile (the ADC select is
        a static-[B] program; filter PRESENCE adds one more program per
        bucket, shared by every registered subset)."""
        mask = None
        if subset is not None:
            mask = self.subsets.get(subset)
            if mask is None:
                raise KeyError(f"unknown subset {subset!r} — define it "
                               f"first ({{'define_subset': ...}})")
        ks = [k for _, k in jobs]
        k_run = self.warm_k if max(ks) <= self.warm_k else max(ks)
        batch = (jobs[0][0] if len(jobs) == 1
                 else np.concatenate([v for v, _ in jobs]))
        b = batch.shape[0]
        bucket = next((x for x in self.buckets if x >= b), b)
        from .utils import COUNTERS
        COUNTERS.add("vector_queries_served", b)
        t0 = time.perf_counter()
        qb = (batch if bucket == b else np.concatenate(
            [batch, np.zeros((bucket - b, batch.shape[1]), np.float32)]))
        scores, ids = self._search(qb, k_run, mask=mask)
        latency = round((time.perf_counter() - t0) * 1e3, 3)
        out, pos = [], 0
        for vecs, req_k in jobs:
            n = vecs.shape[0]
            s, i = scores[pos:pos + n], ids[pos:pos + n]
            pos += n
            results = [[{"rank": r, "id": int(ii), "score": float(ss)}
                        for r, (ss, ii) in enumerate(zip(srow[:req_k],
                                                         irow[:req_k]))
                        if ii >= 0 and np.isfinite(ss)]
                       for srow, irow in zip(s, i)]
            out.append({"results": results, "latency_ms": latency,
                        "batch_rows": int(b)})
        return out

    def handle_line(self, line: str) -> dict:
        try:
            req = json.loads(line)
            if _is_mutation(req):
                return self.mutate(req)
            vecs, req_k = self.decode(req)
            return self.run_queries([(vecs, req_k)],
                                    subset=req.get("subset"))[0]
        except Exception as e:    # noqa: BLE001
            return {"error": f"{type(e).__name__}: {e}"}


def serve_tcp(core: ServeCore, host: str = "127.0.0.1", port: int = 0,
              batch_wait_ms: float = 2.0,
              ready_cb: Optional[Callable[[int], None]] = None,
              stop_event: Optional[threading.Event] = None) -> int:
    """Blocking TCP JSON-lines server with cross-client micro-batching.

    ``port=0`` binds an ephemeral port; ``ready_cb(actual_port)`` fires
    after warm-up, once the listener accepts connections. ``stop_event``
    (tests) shuts the server down cleanly; without one the call blocks
    until the process is signalled. Returns 0.

    Batching policy: the dispatcher takes the oldest queued query, then
    keeps draining compatible query jobs until (a) the queue momentarily
    empties AND ``batch_wait_ms`` has elapsed since the first job,
    (b) accumulated rows reach ``SearchConfig.query_chunk``, or (c) a
    mutation job arrives (a barrier — it runs right after the batch,
    preserving global order).
    """
    stop = stop_event or threading.Event()
    q: "queue.Queue[_Job]" = queue.Queue()
    cap = core.query_cap()

    def dispatcher():
        pending: Optional[_Job] = None
        while not stop.is_set():
            job = pending
            pending = None
            if job is None:
                try:
                    job = q.get(timeout=0.05)
                except queue.Empty:
                    continue
            if job.kind == "mutate":
                _safe_reply(job, lambda j=job: core.mutate(j.req))
                continue
            jobs = [job]
            rows = job.images.shape[0]
            deadline = job.enqueued + batch_wait_ms / 1e3
            while rows < cap:
                tmo = deadline - time.perf_counter()
                try:
                    nxt = q.get(timeout=tmo) if tmo > 0 \
                        else q.get_nowait()
                except queue.Empty:
                    break
                if nxt.kind == "mutate" or \
                        nxt.batch_key != job.batch_key:
                    # barrier: mutations preserve global order; a job
                    # against a DIFFERENT subset filter needs its own
                    # device batch (one mask per batch) — run it next
                    pending = nxt
                    break
                jobs.append(nxt)
                rows += nxt.images.shape[0]
            try:
                responses = core.run_queries(
                    [(j.images, j.req["k"]) for j in jobs],
                    subset=job.batch_key)
            except Exception as e:         # noqa: BLE001 — answer, don't die
                err = {"error": f"{type(e).__name__}: {e}"}
                responses = [err] * len(jobs)
            for j, resp in zip(jobs, responses):
                _safe_reply(j, lambda r=resp: r)

    def _safe_reply(job: _Job, make) -> None:
        # a failing mutation or a torn-down connection must not kill the
        # dispatcher: errors answer on that client's line, writes to dead
        # sockets are dropped
        try:
            resp = make()
        except Exception as e:             # noqa: BLE001
            resp = {"error": f"{type(e).__name__}: {e}"}
        try:
            job.reply(resp)
        except OSError:
            pass

    def client_thread(conn: socket.socket) -> None:
        f = conn.makefile("rwb")
        wlock = threading.Lock()

        def reply(obj: dict) -> None:
            with wlock:
                f.write((json.dumps(obj) + "\n").encode())
                f.flush()

        try:
            for raw in f:
                line = raw.strip()
                if not line:
                    continue
                try:
                    req = json.loads(line)
                    if not isinstance(req, dict):
                        raise ValueError("request must be a JSON object")
                    if _is_mutation(req):
                        q.put(_Job("mutate", req, None, reply))
                    else:
                        images, req_k = core.decode(req)
                        q.put(_Job("query",
                                   {"k": req_k,
                                    "subset": req.get("subset")},
                                   images, reply))
                except Exception as e:     # noqa: BLE001
                    try:
                        reply({"error": f"{type(e).__name__}: {e}"})
                    except OSError:
                        break
        finally:
            try:
                conn.close()
            except OSError:
                pass

    core.warmup()
    srv = socket.create_server((host, port))
    srv.settimeout(0.2)
    disp = threading.Thread(target=dispatcher, daemon=True,
                            name="serve-dispatcher")
    disp.start()
    if ready_cb is not None:
        ready_cb(srv.getsockname()[1])
    try:
        while not stop.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            threading.Thread(target=client_thread, args=(conn,),
                             daemon=True, name="serve-client").start()
    finally:
        srv.close()
        stop.set()
        disp.join(timeout=5)
    return 0
