"""Command-line interface (SURVEY.md N11).

    python -m instsearch_tpu.cli build-index --images DIR --out IDX [--config F]
    python -m instsearch_tpu.cli query --index IDX --image IMG [-k 10]
    python -m instsearch_tpu.cli evaluate --dataset mini --data-root data [...]
    python -m instsearch_tpu.cli serve --index IDX   # JSON-lines loop
    python -m instsearch_tpu.cli bench [--what extraction|query|all|extended]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

from .config import PipelineConfig


def _load_cfg(args) -> PipelineConfig:
    cfg = PipelineConfig.load(args.config) if args.config else PipelineConfig()
    if getattr(args, "backbone", None):
        cfg = PipelineConfig(extract=cfg.extract.replace(backbone=args.backbone),
                             index=cfg.index, search=cfg.search, eval=cfg.eval)
    return cfg


def cmd_build_index(args) -> int:
    from .index import Index
    cfg = _load_cfg(args)
    if getattr(args, "dba_n", 0):
        cfg = cfg.replace(index=cfg.index.replace(
            dba_n=args.dba_n, dba_alpha=args.dba_alpha))
    variables = None
    whitening = None
    if args.weights:
        # consume a `finetune` checkpoint: orbax variables + sidecar meta
        # describing the tuned model (gem_p / backbone / pooling / Lw)
        from .utils import load_pytree
        variables = load_pytree(args.weights)
        meta_path = args.weights + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                wmeta = json.load(fh)
            cfg = PipelineConfig(
                extract=cfg.extract.replace(
                    backbone=wmeta.get("backbone", cfg.extract.backbone),
                    pooling=wmeta.get("pooling", cfg.extract.pooling),
                    gem_p=wmeta.get("gem_p", cfg.extract.gem_p),
                    image_size=wmeta.get("image_size",
                                         cfg.extract.image_size)),
                index=cfg.index, search=cfg.search, eval=cfg.eval)
            if wmeta.get("whitening"):
                # Lw whitening fit by `finetune --fit-lw` replaces the
                # PCA fit for this build; resolve relative to the meta
                # file (legacy sidecars recorded relative paths) and fail
                # loudly rather than silently drop the Lw step
                wpath = wmeta["whitening"]
                if not os.path.isabs(wpath):
                    wpath = os.path.join(os.path.dirname(
                        os.path.abspath(meta_path)), os.path.basename(wpath))
                if not os.path.exists(wpath):
                    print(f"error: whitening sidecar {wmeta['whitening']} "
                          f"recorded by finetune --fit-lw not found "
                          f"(looked at {wpath})", file=sys.stderr)
                    return 2
                import jax.numpy as jnp
                from .ops.whitening import WhiteningParams
                raw = np.load(wpath)
                whitening = WhiteningParams(P=jnp.asarray(raw["P"]),
                                            mu=jnp.asarray(raw["mu"]))
    paths = sorted(glob.glob(os.path.join(args.images, "*.jpg"))) + \
        sorted(glob.glob(os.path.join(args.images, "*.png")))
    if not paths:
        print(f"error: no images found under {args.images}", file=sys.stderr)
        return 2
    if args.resumable:
        from .builder import ResumableBuilder
        b = ResumableBuilder(paths, cfg, args.out + ".build",
                             variables=variables)
        b.run()
        idx = b.finalize(whitening=whitening)
    else:
        idx = Index.build(paths, cfg, variables=variables,
                          whitening=whitening)
    out = {"indexed": idx.num_valid,
           "quarantined": len(getattr(idx, "quarantined", [])),
           "dim": idx.dim, "out": args.out}
    if cfg.index.dba_n:
        out["dba_n"] = cfg.index.dba_n
    if args.ivf:
        ivf = idx.build_ivf(n_clusters=args.ivf_clusters or None,
                            nprobe=args.nprobe)
        out["ivf"] = {"clusters": ivf.n_clusters, "nprobe": ivf.nprobe,
                      "scan_fraction": round(ivf.scan_fraction(), 4)}
    idx.save(args.out)
    print(json.dumps(out))
    return 0


def cmd_update_index(args) -> int:
    """Offline index maintenance: add images / remove names on a saved
    index, in place (the daemon counterpart is serve's {"add"}/{"remove"}
    requests). Adds use the persisted extractor weights + fitted
    whitening; removals compact in place (Index.remove), so the padded
    shape — and every compiled search program a later `serve` warms —
    is unchanged unless an add overflows IndexConfig.capacity."""
    from .index import Index
    idx = Index.load(args.index)
    # mutation drops an attached IVF view (row positions move); remember
    # its sizing so it can be rebuilt over the updated rows before saving
    ivf_params = ((idx.ivf.n_clusters, idx.ivf.nprobe)
                  if idx.ivf is not None else None)
    added = removed = 0
    if args.remove:
        removed = idx.remove(args.remove)
    if args.add:
        paths = []
        for p in args.add:
            if os.path.isdir(p):
                paths += sorted(glob.glob(os.path.join(p, "*.jpg"))) + \
                    sorted(glob.glob(os.path.join(p, "*.png")))
            else:
                paths.append(p)
        if not paths:
            print(f"error: no images found in {args.add}", file=sys.stderr)
            return 2
        if idx.extractor is None:
            print("error: index has no extractor weights; cannot extract "
                  "new images", file=sys.stderr)
            return 2
        added = idx.add(paths=paths)
    if ivf_params is not None and idx.ivf is None and (added or removed):
        idx.build_ivf(n_clusters=min(ivf_params[0], idx.num_valid),
                      nprobe=ivf_params[1])
    idx.save(args.out or args.index)
    print(json.dumps({"added": added, "removed": removed,
                      "rows": idx.num_valid,
                      "out": args.out or args.index}))
    return 0


def cmd_query(args) -> int:
    from .data import frontend
    from .index import Index
    import jax.numpy as jnp
    idx = Index.load(args.index)
    if idx.extractor is None:
        # a fresh seed-0 extractor would produce descriptors unrelated to
        # the store -> confidently wrong neighbors (ADVICE r1)
        print("error: index has no extractor weights; rebuild it with this "
              "version or attach an Extractor programmatically",
              file=sys.stderr)
        return 2
    img = frontend.load_square(args.image, idx.cfg.extract.image_size)
    if img is None:
        print(f"error: cannot decode {args.image}", file=sys.stderr)
        return 2
    scfg = idx.cfg.search.replace(k=args.k)
    if args.nprobe is not None:   # 0 = exact even when an IVF view exists
        scfg = scfg.replace(ivf_nprobe=args.nprobe)
    if getattr(args, "diffusion", False):
        scfg = scfg.replace(diffusion_enabled=True, rerank_enabled=False,
                            refine_enabled=False)
    scores, ids = idx.query_images(img[None], scfg)
    # drop padded slots (id -1, score -inf): fewer valid rows than k —
    # -inf also serializes as the non-standard JSON token -Infinity
    results = [{"rank": r, "name": idx.name_of(i), "id": int(i),
                "score": float(s)}
               for r, (s, i) in enumerate(zip(scores[0], ids[0])) if i >= 0]
    print(json.dumps({"query": args.image, "results": results}))
    return 0


def serve_buckets(query_chunk: int) -> list[int]:
    """The warm bucket sizes for serving: powers of two up to
    min(8, query_chunk). Small on purpose — each bucket is one compiled
    program at startup (~90-110 s each through this environment's TPU
    tunnel), and splitting covers every larger request (serve_batch)."""
    buckets = [1]
    while buckets[-1] < min(8, max(1, query_chunk or 8)):
        buckets.append(buckets[-1] * 2)
    return buckets


def serve_batch(idx, sidx, batch, scfg, buckets):
    """Serve an image batch of ANY size through warm bucket shapes only:
    oversized requests are SPLIT into largest-bucket chunks (remainder
    padded up to the smallest covering bucket), so no request length can
    trigger an XLA recompile mid-request — ~90-110 s per cold program
    through the axon tunnel, the exact stall the buckets exist to prevent
    (review r2: padding only covered lengths <= max(buckets); 9..chunk
    ran a cold shape)."""
    import numpy as np
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
        s, i = idx.query_images(piece, scfg, sharded_index=sidx)
        out_s.append(s[:take])
        out_i.append(i[:take])
        pos += take
    return np.concatenate(out_s), np.concatenate(out_i)


def cmd_serve(args) -> int:
    """JSON-lines serving loop: the online query path (SURVEY.md §3.2) as
    a long-lived process. One request per stdin line -> one response line
    on stdout; the image->descriptor->top-k programs (one per warm bucket
    size) are compiled at startup (the {"ready": true} line marks warm),
    and any request length is served by splitting into warm buckets, so
    steady-state latency is the jitted path only. The one remaining cold
    shape is a request ``k`` LARGER than the index config's k (top-k width
    is a static program shape): it compiles once, is cached for the rest
    of the process, and smaller k's are served by slicing the warm width.

      request:  {"image": PATH} | {"images": [PATH, ...]}  [+ "k": int]
                | {"add": [PATH, ...]} | {"remove": [NAME, ...]}
      response: {"results": [[{rank, name, id, score}, ...] per image],
                 "latency_ms": float}
                | {"added"|"removed": int, "rows": int, "latency_ms": float}
                | {"error": str}

    ``add``/``remove`` mutate the live index between queries (dynamic
    corpus serving): both are in-place row writes at the padded shapes,
    so no search program recompiles — UNLESS an ``add`` overflows
    ``IndexConfig.capacity``, which re-pads and recompiles on the next
    query (~90-110 s through this environment's tunnel; size capacity to
    expected growth). Under ``--sharded`` the mesh view is re-placed
    after each mutation. Decode failures answer with "error" and keep
    serving; EOF exits 0.
    """
    import time

    import numpy as np

    from .data import frontend
    from .index import Index
    from .utils import COUNTERS

    idx = Index.load(args.index)
    if idx.extractor is None:
        print("error: index has no extractor weights; refusing to serve "
              "with a random-init extractor (wrong retrieval)",
              file=sys.stderr)
        return 2
    sidx = idx.to_sharded() if args.sharded else None   # multi-chip serving
    size = idx.cfg.extract.image_size
    warm_k = idx.cfg.search.k
    buckets = serve_buckets(idx.cfg.search.query_chunk)
    for b in buckets:
        idx.query_images(np.zeros((b, size, size, 3), np.uint8),
                         sharded_index=sidx)            # compile
    ready = {"ready": True, "rows": idx.num_valid, "dim": idx.dim}
    if sidx is not None:
        ready["shards"] = int(sidx.mesh.shape[sidx.axis])
    print(json.dumps(ready), flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            if "add" in req or "remove" in req:
                t0 = time.perf_counter()
                if "add" in req:
                    n = idx.add(paths=list(req["add"]))
                    resp = {"added": n}
                else:
                    n = idx.remove(list(req["remove"]))
                    resp = {"removed": n}
                if sidx is not None:       # re-place mutated rows on mesh
                    sidx = idx.to_sharded()
                resp["rows"] = idx.num_valid
                resp["latency_ms"] = round(
                    (time.perf_counter() - t0) * 1e3, 3)
                print(json.dumps(resp), flush=True)
                continue
            paths = req.get("images") or [req["image"]]
            imgs = [frontend.load_square(p, size) for p in paths]
            bad = [p for p, im in zip(paths, imgs) if im is None]
            if bad:
                print(json.dumps({"error": f"cannot decode: {bad}"}),
                      flush=True)
                continue
            req_k = int(req.get("k", warm_k))
            # run at the warm top-k width when the request fits inside it
            # (slice below); only k > warm_k compiles a new width (once)
            k_run = warm_k if req_k <= warm_k else req_k
            scfg = idx.cfg.search.replace(k=k_run)
            t0 = time.perf_counter()
            scores, ids = serve_batch(idx, sidx, np.stack(imgs), scfg,
                                      buckets)
            latency = (time.perf_counter() - t0) * 1e3
            # padded slots (id -1 / -inf) are dropped: -inf serializes as
            # the non-standard JSON token -Infinity and breaks clients
            results = [[{"rank": r, "name": idx.name_of(i), "id": int(i),
                         "score": float(s)}
                        for r, (s, i) in enumerate(zip(srow[:req_k],
                                                       irow[:req_k]))
                        if i >= 0]
                       for srow, irow in zip(scores, ids)]
            print(json.dumps({"results": results,
                              "latency_ms": round(latency, 3)}), flush=True)
        except Exception as e:    # noqa: BLE001 — a long-lived server
            # must answer bad requests (malformed JSON, wrong types, ...)
            # with an error line, never die mid-stream
            print(json.dumps({"error": f"{type(e).__name__}: {e}"}),
                  flush=True)
    COUNTERS.dump()
    return 0


def cmd_evaluate(args) -> int:
    from .eval.datasets import load_dataset
    from .eval.evaluate import build_index_for_dataset, evaluate_index
    cfg = _load_cfg(args)
    ds = load_dataset(args.dataset, args.data_root)
    if args.distractors:
        from .eval.datasets import with_distractors
        ds = with_distractors(ds, args.distractors)
    idx = build_index_for_dataset(ds, cfg)
    sidx = idx.to_sharded() if args.sharded else None
    res = evaluate_index(idx, ds, args.protocol, sharded_index=sidx)
    res.pop("per_query_ap", None)
    if args.sharded:
        res["sharded"] = True
        res["num_shards"] = int(sidx.mesh.shape[sidx.axis])
    print(json.dumps(res))
    return 0


def cmd_bench(args) -> int:
    from .bench import run_bench
    from .utils import COUNTERS
    if args.trace:
        from .utils.observe import trace
        with trace(args.trace):
            out = run_bench(args.what)
        out["trace_dir"] = args.trace
    else:
        out = run_bench(args.what)
    if args.tensorboard:
        from .utils.observe import emit_tensorboard
        emit_tensorboard(args.tensorboard, scalars=out)   # bench/* scalars
        out["tensorboard_dir"] = args.tensorboard
    out["counters"] = COUNTERS.dump()   # after emit: counters/* written once
    print(json.dumps(out))
    return 0


def cmd_finetune(args) -> int:
    """Fine-tune a backbone on a labeled image tree: each subdirectory of
    --images is one instance/class (C17)."""
    import numpy as np
    from .config import TrainConfig
    from .train.finetune import finetune
    from .utils import save_pytree

    if not os.path.isdir(args.images):
        print(f"error: {args.images} is not a directory", file=sys.stderr)
        return 2
    paths, labels = [], []
    for li, sub in enumerate(sorted(os.listdir(args.images))):
        d = os.path.join(args.images, sub)
        if not os.path.isdir(d):
            continue
        for p in (sorted(glob.glob(os.path.join(d, "*.jpg")))
                  + sorted(glob.glob(os.path.join(d, "*.png")))):
            paths.append(p)
            labels.append(li)
    n_classes = len(set(labels))
    if not paths or n_classes < 2:
        print(f"error: need >= 2 class subdirectories with images under "
              f"{args.images} (found {n_classes})", file=sys.stderr)
        return 2
    counts = np.bincount(np.asarray(labels))
    num_neg = min(args.num_negatives, int((counts.sum() - counts.max())))
    cfg = TrainConfig(backbone=args.backbone or "resnet50",
                      image_size=args.image_size, learn_gem_p=args.learn_p,
                      batch_size=args.batch_size, num_negatives=max(1, num_neg),
                      lr=args.lr)
    try:
        out = finetune(paths, np.asarray(labels), cfg, epochs=args.epochs,
                       fit_lw=args.fit_lw)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    save_pytree(args.out, out["variables"])
    # the learned GeM exponent is not a backbone variable: persist it in a
    # sidecar so build-index can reproduce the tuned model
    meta = {"gem_p": out["gem_p"], "backbone": cfg.backbone,
            "pooling": cfg.pooling, "image_size": cfg.image_size}
    if "whitening" in out:
        # Lw discriminative whitening fit on the training pairs: persisted
        # next to the checkpoint; build-index --weights picks it up
        w = out["whitening"]
        np.savez(args.out + ".whitening.npz", P=np.asarray(w.P),
                 mu=np.asarray(w.mu))
        meta["whitening"] = os.path.abspath(args.out + ".whitening.npz")
    with open(args.out + ".meta.json", "w") as fh:
        json.dump(meta, fh)
    print(json.dumps({"steps": len(out["losses"]),
                      "final_loss": out["losses"][-1],
                      "gem_p": out["gem_p"], "out": args.out,
                      "meta": args.out + ".meta.json"}))
    return 0


def cmd_workloads(args) -> int:
    from .workloads import run_all
    for res in run_all(args.data_root, args.dataset):
        print(json.dumps(res))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="instsearch")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-index", help="extract + index a directory of images")
    b.add_argument("--images", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--config", default=None)
    b.add_argument("--backbone", default=None)
    b.add_argument("--resumable", action="store_true",
                   help="flush per batch-group with a manifest; restart resumes")
    b.add_argument("--weights", default=None,
                   help="orbax checkpoint from `finetune` (reads the "
                        ".meta.json sidecar for gem_p/backbone)")
    b.add_argument("--dba-n", type=int, default=0,
                   help="database-side augmentation: aggregate each row's "
                        "top-n neighbors offline (0 = off)")
    b.add_argument("--dba-alpha", type=float, default=3.0,
                   help="αDBA similarity weighting exponent")
    b.add_argument("--ivf", action="store_true",
                   help="attach an IVF ANN view (k-means coarse quantizer; "
                        "query/serve then scan ~nprobe/clusters of the rows)")
    b.add_argument("--ivf-clusters", type=int, default=0,
                   help="IVF cluster count (default: ~sqrt(N))")
    b.add_argument("--nprobe", type=int, default=32,
                   help="IVF probes per query (with --ivf)")
    b.set_defaults(fn=cmd_build_index)

    u = sub.add_parser("update-index", help="add/remove images on a "
                       "saved index (offline counterpart of serve's "
                       "add/remove requests)")
    u.add_argument("--index", required=True, help="saved index directory")
    u.add_argument("--add", nargs="*", default=[],
                   help="image files or directories to index")
    u.add_argument("--remove", nargs="*", default=[],
                   help="image names (no extension) to remove")
    u.add_argument("--out", default=None,
                   help="write the updated index here (default: in place)")
    u.set_defaults(fn=cmd_update_index)

    q = sub.add_parser("query", help="query an index with an image")
    q.add_argument("--index", required=True)
    q.add_argument("--image", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--nprobe", type=int, default=None,
                   help="IVF probes (indexes built with --ivf; 0 = exact)")
    q.add_argument("--diffusion", action="store_true",
                   help="diffusion re-ranking over the top candidates' "
                        "similarity graph (search/diffusion.py; depth etc. "
                        "from the index's SearchConfig)")
    q.set_defaults(fn=cmd_query)

    e = sub.add_parser("evaluate", help="protocol evaluation on a dataset")
    e.add_argument("--dataset", default="mini")
    e.add_argument("--data-root", default="data")
    e.add_argument("--protocol", default="medium",
                   choices=["easy", "medium", "hard", "classic"])
    e.add_argument("--config", default=None)
    e.add_argument("--backbone", default=None)
    e.add_argument("--distractors", default=None,
                   help="directory of distractor images (Oxford105k-style)")
    e.add_argument("--sharded", action="store_true",
                   help="rank through the row-sharded distributed index "
                        "(cfg.index.num_shards devices)")
    e.set_defaults(fn=cmd_evaluate)

    sv = sub.add_parser("serve", help="JSON-lines serving loop over a "
                        "saved index (one request per stdin line)")
    sv.add_argument("--index", required=True)
    sv.add_argument("--sharded", action="store_true",
                    help="serve through the row-sharded index over all "
                         "devices (multi-chip path)")
    sv.set_defaults(fn=cmd_serve)

    be = sub.add_parser("bench", help="run benchmark harness")
    be.add_argument("--what", default="all",
                    choices=["extraction", "query", "all", "extended"])
    be.add_argument("--trace", default=None, metavar="DIR",
                    help="write a TensorBoard profiler trace to DIR")
    be.add_argument("--tensorboard", default=None, metavar="DIR",
                    help="emit counters + bench scalars via tensorboardX")
    be.set_defaults(fn=cmd_bench)

    f = sub.add_parser("finetune",
                       help="contrastive fine-tuning on a labeled image tree")
    f.add_argument("--images", required=True,
                   help="directory with one subdirectory per instance/class")
    f.add_argument("--out", required=True, help="orbax checkpoint path")
    f.add_argument("--backbone", default=None)
    f.add_argument("--image-size", type=int, default=224)
    f.add_argument("--epochs", type=int, default=1)
    f.add_argument("--learn-p", action="store_true")
    f.add_argument("--batch-size", type=int, default=8)
    f.add_argument("--num-negatives", type=int, default=5)
    f.add_argument("--lr", type=float, default=1e-4)
    f.add_argument("--fit-lw", action="store_true",
                   help="fit Lw discriminative whitening on the training "
                        "pairs after tuning (arXiv:1711.02512 §3.4)")
    f.set_defaults(fn=cmd_finetune)

    w = sub.add_parser("workloads",
                       help="run all BASELINE workload presets end-to-end")
    w.add_argument("--data-root", default="data")
    w.add_argument("--dataset", default="mini")
    w.set_defaults(fn=cmd_workloads)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
