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
    if args.lw:
        lw = idx.fit_local_whitening(n_clusters=args.lw_clusters or None)
        out["lw"] = {"clusters": lw.n_clusters, "dim": lw.dim}
    if args.pq:
        if args.ivf:
            # both views would arm both candidate tiers in the saved
            # config — Index.search rejects that combination per query
            print("error: --ivf and --pq are mutually exclusive candidate "
                  "tiers; pick one", file=sys.stderr)
            return 2
        pq = idx.build_pq(m=args.pq_m or None, depth=args.pq_depth,
                          opq_iters=args.opq_iters,
                          anisotropic_t=args.apq_t or None)
        out["pq"] = {"m": pq.m, "bytes_per_row": pq.bytes_per_row,
                     "depth": pq.depth, "opq": pq.rotation is not None,
                     "anisotropic_t": pq.anisotropic_t}
    if getattr(args, "ivfpq", False):
        if args.ivf or args.pq:
            print("error: --ivfpq is mutually exclusive with --ivf/--pq "
                  "(one candidate-selection tier per index)",
                  file=sys.stderr)
            return 2
        v = idx.build_ivfpq(n_clusters=args.ivf_clusters or None,
                            nprobe=args.nprobe, m=args.pq_m or None,
                            depth=args.pq_depth,
                            opq_iters=args.opq_iters,
                            anisotropic_t=args.apq_t or None)
        out["ivfpq"] = {"clusters": v.n_clusters, "nprobe": v.nprobe,
                        "m": v.m, "bytes_per_row": v.bytes_per_row,
                        "depth": v.depth, "opq": v.rotation is not None,
                        "anisotropic_t": v.anisotropic_t,
                        "scan_fraction": round(v.scan_fraction(), 4)}
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
    lw_clusters = idx.lw.n_clusters if idx.lw is not None else None
    pq_params = ((idx.pq.m, idx.pq.depth,
                  8 if idx.pq.rotation is not None else 0,
                  idx.pq.anisotropic_t)
                 if idx.pq is not None else None)
    ivfpq_params = ((idx.ivfpq.n_clusters, idx.ivfpq.nprobe,
                     idx.ivfpq.m, idx.ivfpq.depth,
                     8 if idx.ivfpq.rotation is not None else 0,
                     idx.ivfpq.anisotropic_t)
                    if idx.ivfpq is not None else None)
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
    # refit attached views over the mutated corpus unconditionally:
    # add() ABSORBS views in-process (spill/frozen-fit semantics,
    # Index._absorb_views) which is right for a live server, but this is
    # the offline maintenance path — a fresh fit over the final corpus
    # beats a frozen fit + spill, and remove() drops views anyway
    if ivf_params is not None and (added or removed):
        idx.build_ivf(n_clusters=min(ivf_params[0], idx.num_valid),
                      nprobe=ivf_params[1])
    if lw_clusters is not None and (added or removed):
        idx.fit_local_whitening(n_clusters=min(lw_clusters, idx.num_valid))
    if pq_params is not None and (added or removed):
        idx.build_pq(m=pq_params[0], depth=pq_params[1],
                     opq_iters=pq_params[2], anisotropic_t=pq_params[3])
    if ivfpq_params is not None and (added or removed):
        idx.build_ivfpq(n_clusters=min(ivfpq_params[0], idx.num_valid),
                        nprobe=ivfpq_params[1], m=ivfpq_params[2],
                        depth=ivfpq_params[3], opq_iters=ivfpq_params[4],
                        anisotropic_t=ivfpq_params[5])
    idx.save(args.out or args.index)
    print(json.dumps({"added": added, "removed": removed,
                      "rows": idx.num_valid,
                      "out": args.out or args.index}))
    return 0


def cmd_merge_index(args) -> int:
    """Offline union of independently-built indexes (Index.merge_from —
    the FAISS merge_from analog): per-machine or per-day builds combined
    into one serving index. All inputs must share the extraction
    pipeline (cfg.extract + extractor-weight fingerprints), descriptor
    dim, regional-store kind, and have disjoint names; the FIRST
    index's attached ANN/PQ/lw views are REFIT over the union (a fresh
    fit beats the in-process absorb semantics for an offline rebuild).
    The first index's storage dtype and capacity rules apply — donors
    re-enter through add()."""
    from .index import Index
    idx = Index.load(args.indexes[0])
    # remember the FIRST index's view sizing and refit over the union —
    # same policy as update-index (add() absorbs in-process, but this is
    # the offline path: refit unconditionally)
    ivf_params = ((idx.ivf.n_clusters, idx.ivf.nprobe)
                  if idx.ivf is not None else None)
    lw_clusters = idx.lw.n_clusters if idx.lw is not None else None
    pq_params = ((idx.pq.m, idx.pq.depth,
                  8 if idx.pq.rotation is not None else 0,
                  idx.pq.anisotropic_t)
                 if idx.pq is not None else None)
    ivfpq_params = ((idx.ivfpq.n_clusters, idx.ivfpq.nprobe,
                     idx.ivfpq.m, idx.ivfpq.depth,
                     8 if idx.ivfpq.rotation is not None else 0,
                     idx.ivfpq.anisotropic_t)
                    if idx.ivfpq is not None else None)
    merged = 0
    for path in args.indexes[1:]:
        merged += idx.merge_from(Index.load(path))
    if merged:
        if ivf_params is not None:
            idx.build_ivf(n_clusters=min(ivf_params[0], idx.num_valid),
                          nprobe=ivf_params[1])
        if lw_clusters is not None:
            idx.fit_local_whitening(
                n_clusters=min(lw_clusters, idx.num_valid))
        if pq_params is not None:
            idx.build_pq(m=pq_params[0], depth=pq_params[1],
                         opq_iters=pq_params[2],
                         anisotropic_t=pq_params[3])
        if ivfpq_params is not None:
            idx.build_ivfpq(n_clusters=min(ivfpq_params[0],
                                           idx.num_valid),
                            nprobe=ivfpq_params[1], m=ivfpq_params[2],
                            depth=ivfpq_params[3],
                            opq_iters=ivfpq_params[4],
                            anisotropic_t=ivfpq_params[5])
    idx.save(args.out)
    print(json.dumps({"indexes": len(args.indexes), "merged": merged,
                      "rows": idx.num_valid, "out": args.out,
                      "views_refit": [nm for nm, on in
                                      (("ivf", ivf_params), ("lw",
                                       lw_clusters), ("pq", pq_params),
                                       ("ivfpq", ivfpq_params))
                                      if on is not None]}))
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
    if getattr(args, "pq_depth", None) is not None:  # 0 = exact likewise
        scfg = scfg.replace(pq_depth=args.pq_depth)
    if getattr(args, "ivfpq_nprobe", None) is not None:  # 0 = exact
        scfg = scfg.replace(ivfpq_nprobe=args.ivfpq_nprobe)
    if getattr(args, "diffusion", False):
        scfg = scfg.replace(diffusion_enabled=True, rerank_enabled=False,
                            refine_enabled=False, lw_enabled=False)
    if getattr(args, "lw", None) is not None:
        scfg = scfg.replace(lw_enabled=bool(args.lw))
    if getattr(args, "spatial_weight", None) is not None:
        scfg = scfg.replace(spatial_weight=args.spatial_weight)
    subset = None
    if getattr(args, "subset", None):
        # "@file" = newline-separated member names; else comma-separated
        if args.subset.startswith("@"):
            with open(args.subset[1:]) as f:
                members = [ln.strip() for ln in f if ln.strip()]
        else:
            members = [s for s in args.subset.split(",") if s]
        subset = idx.make_subset(names=members)
    scores, ids = idx.query_images(img[None], scfg, subset=subset)
    # drop padded slots (id -1, score -inf): fewer valid rows than k —
    # -inf also serializes as the non-standard JSON token -Infinity
    results = [{"rank": r, "name": idx.name_of(i), "id": int(i),
                "score": float(s)}
               for r, (s, i) in enumerate(zip(scores[0], ids[0])) if i >= 0]
    print(json.dumps({"query": args.image, "results": results}))
    return 0


def cmd_info(args) -> int:
    """Operator introspection for a saved index: Index.stats() as one
    JSON object (rows/dim/dtype, device bytes per store, attached views
    with their scan economics)."""
    from .index import Index
    idx = Index.load(args.index)
    print(json.dumps(idx.stats()))
    return 0


def cmd_dedupe(args) -> int:
    """Near-duplicate sweep over a saved index (Index.find_duplicates):
    prints one JSON object with the score-sorted pair list and the
    transitive groups. Pure offline corpus analytics — no extractor
    needed, runs off the stored descriptors."""
    from .index import Index
    idx = Index.load(args.index)
    subset = None
    if args.subset:
        if args.subset.startswith("@"):
            with open(args.subset[1:]) as f:
                members = [ln.strip() for ln in f if ln.strip()]
        else:
            members = [s for s in args.subset.split(",") if s]
        subset = idx.make_subset(names=members)
    pairs, scores = idx.find_duplicates(tau=args.tau, k=args.k,
                                        subset=subset)
    groups = idx.find_duplicates(tau=args.tau, k=args.k, subset=subset,
                                 group=True)
    print(json.dumps({
        "tau": args.tau, "n_pairs": len(pairs), "n_groups": len(groups),
        "pairs": [{"a": idx.name_of(a), "b": idx.name_of(b),
                   "score": float(s)}
                  for (a, b), s in zip(pairs.tolist(), scores)],
        "groups": groups,
    }))
    return 0


# serving internals live in serve.py (ServeCore, TCP transport with
# cross-client micro-batching); re-exported here because serve_batch /
# serve_buckets started life in this module and tests/docs address them so
from .serve import ServeCore, serve_batch, serve_buckets, serve_tcp  # noqa: F401,E402


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
                                                [+ "subset": NAME]
                | {"add": [PATH, ...]} | {"remove": [NAME, ...]}
                | {"define_subset": {"name": N, "members": [NAME, ...]}}
                | {"drop_subset": N}
      response: {"results": [[{rank, name, id, score}, ...] per image],
                 "latency_ms": float}
                | {"added"|"removed": int, "rows": int, "latency_ms": float}
                | {"subset": N, "count": int, "subsets": [...]}
                | {"error": str}

    ``define_subset`` registers a named collection filter
    (Index.make_subset — search/subset.py); queries carrying
    ``"subset"`` return only members. The first definition warms the
    masked program variants (mask PRESENCE is the program identity, its
    VALUES are not — all collections share the warm programs, and
    defining more is device-transfer only). Mutations rebuild registered
    filters from their member names automatically; the TCP dispatcher
    co-batches only same-subset requests (one mask per device batch).

    ``add``/``remove`` mutate the live index between queries (dynamic
    corpus serving): both are in-place writes at the padded shapes, and
    attached IVF/PQ/IVF-PQ/lw views absorb them. A search program
    recompiles (~90-110 s through this environment's tunnel) only when a
    trace SHAPE changes: an ``add`` overflowing ``IndexConfig.capacity``
    (re-pad; size capacity to expected growth), or absorbed adds
    outgrowing an IVF/IVF-PQ view's spill arrays — serve startup
    pre-reserves 4096 spill slots and growth is power-of-two, so that
    costs one recompile per doubling past the reservation, never one
    per add. Absorb-side encode/assign programs are padded to
    power-of-two batch sizes too (~log₂ many compiles across all add
    sizes). Under ``--sharded`` the mesh view is re-placed after each
    mutation. Decode failures answer with "error" and keep serving; EOF
    exits 0.

    ``--port N`` serves the same protocol over TCP instead (N=0 binds an
    ephemeral port, printed in the ready line): many concurrent
    line-delimited JSON connections, with requests that arrive within
    ``--batch-wait-ms`` of each other micro-batched into ONE device pass
    through the warm buckets (responses carry ``batch_rows``). See
    instsearch_tpu/serve.py for the threading contract.

    ``--host-store DIR --ivfpq-view DIR`` switches to capacity-scale
    VECTOR serving (serve.VectorServeCore): requests carry
    ``{"vector": [...]}``/``{"vectors": [[...]]}`` descriptors, exact
    rows stay in the host memmap, only the 32 B/row codes sit on chip;
    ``--adc-only`` ranks straight from the pruned on-chip scan (no host
    gather — the latency mode). Same stdin/TCP transports; row mutations
    are rejected (offline-built store), but ``define_subset`` (by store
    ``ids`` or ``positions``) + per-query ``"subset"`` filtering work —
    each registered collection holds an N-byte on-chip mask.
    """
    from .index import Index
    from .utils import COUNTERS

    if args.host_store:
        # capacity-scale vector serving: HostRowStore + IVFPQView, raw
        # descriptor queries — no device-resident Index, no extractor
        # (see serve.VectorServeCore docstring for the protocol)
        from .search.ivfpq import HostRowStore, IVFPQView
        from .serve import VectorServeCore
        if not args.ivfpq_view:
            print("error: --host-store needs --ivfpq-view (a saved "
                  "IVFPQView directory; build with "
                  "IVFPQView.from_host_store(...).save(...))",
                  file=sys.stderr)
            return 2
        if args.sharded:
            print("error: --host-store serving is single-process "
                  "(shard by running one server per store slice)",
                  file=sys.stderr)
            return 2
        core = VectorServeCore(HostRowStore(args.host_store),
                               IVFPQView.load(args.ivfpq_view),
                               adc_only=args.adc_only)
    elif not args.index:
        print("error: serve needs --index (image queries) or "
              "--host-store + --ivfpq-view (vector queries)",
              file=sys.stderr)
        return 2
    else:
        idx = Index.load(args.index)
        if idx.extractor is None:
            print("error: index has no extractor weights; refusing to "
                  "serve with a random-init extractor (wrong retrieval)",
                  file=sys.stderr)
            return 2
        core = ServeCore(idx, sharded=args.sharded)

    if args.port is not None:              # TCP transport
        def ready_cb(port):
            ready = core.ready_info()
            ready["port"] = port
            print(json.dumps(ready), flush=True)

        try:
            return serve_tcp(core, host=args.host, port=args.port,
                             batch_wait_ms=args.batch_wait_ms,
                             ready_cb=ready_cb)
        finally:
            COUNTERS.dump()

    core.warmup()
    print(json.dumps(core.ready_info()), flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        print(json.dumps(core.handle_line(line)), flush=True)
    COUNTERS.dump()
    return 0


def load_backbone_variables(path: str, backbone: str) -> dict:
    """Load extractor weights for ``--weights``: either a raw torch(vision)
    ``state_dict`` checkpoint (``.pth``/``.pt`` — the format pretrained
    ImageNet weights ship in) converted via models/torch_import, or an
    orbax pytree written by ``finetune`` (anything else)."""
    if path.endswith((".pth", ".pt")):
        import torch

        from .models import torch_import
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        if backbone.startswith("resnet"):
            return torch_import.load_torch_resnet(sd)
        if backbone.startswith("vgg"):
            return torch_import.load_torch_vgg(sd)
        if backbone.startswith("vit"):
            return torch_import.load_torch_vit(sd)
        raise ValueError(f"no torch importer for backbone {backbone!r}")
    from .utils import load_pytree
    return load_pytree(path)


def cmd_evaluate(args) -> int:
    from .eval.datasets import load_dataset
    from .eval.evaluate import build_index_for_dataset, evaluate_index
    cfg = _load_cfg(args)
    # flags override the preset's eval block; unset flags fall back to it
    # so `evaluate --config configs/X.json` alone reproduces the workload
    # (docs/RUNBOOK.md anchor-reproduction commands rely on this)
    if args.config:
        dataset = args.dataset or cfg.eval.dataset
        data_root = args.data_root or cfg.eval.data_root
        protocol = args.protocol or cfg.eval.protocol
    else:   # no preset: the historical bare-invocation defaults
        dataset = args.dataset or "mini"
        data_root = args.data_root or "data"
        protocol = args.protocol or "medium"
    ds = load_dataset(dataset, data_root)
    if args.distractors:
        from .eval.datasets import with_distractors
        ds = with_distractors(ds, args.distractors)
    variables = None
    if args.weights:
        variables = load_backbone_variables(args.weights, cfg.extract.backbone)
    idx = build_index_for_dataset(ds, cfg, variables=variables)
    sidx = idx.to_sharded() if args.sharded else None
    res = evaluate_index(idx, ds, protocol, sharded_index=sidx)
    res.pop("per_query_ap", None)
    if args.sharded:
        res["sharded"] = True
        res["num_shards"] = int(sidx.mesh.shape[sidx.axis])
    # measured-vs-anchor parity report (eval/anchors.py) whenever a
    # literature anchor matches this config+dataset+protocol
    from .eval.anchors import compare, lookup_anchor
    anchor = lookup_anchor(cfg, dataset, protocol)
    if anchor is not None and "mAP" in res:
        res["anchor"] = compare(res["mAP"], anchor)
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
                      lr=args.lr, loss=args.loss,
                      smoothap_tau=args.smoothap_tau)
    init_vars = None
    if args.eval_dataset:
        # capture the frozen initialization so the post-training report can
        # compare tuned-vs-frozen mAP on the SAME weights the run started
        # from (Trainer deep-copies, so finetune cannot mutate these)
        from .train.trainer import Trainer
        init_vars = Trainer(cfg, seed=0).variables
    try:
        out = finetune(paths, np.asarray(labels), cfg, epochs=args.epochs,
                       fit_lw=args.fit_lw, variables=init_vars)
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
    report = {"steps": len(out["losses"]),
              "final_loss": out["losses"][-1],
              "gem_p": out["gem_p"], "out": args.out,
              "meta": args.out + ".meta.json"}
    if args.eval_dataset:
        # tuned-vs-frozen retrieval lift on a held-out dataset: the number
        # that says whether the run was worth it (C17 quality, not flow)
        from .config import ExtractConfig, PipelineConfig
        from .eval.datasets import load_dataset
        from .eval.evaluate import build_index_for_dataset, evaluate_index
        ds = load_dataset(args.eval_dataset, args.eval_data_root)

        def _map(variables, gem_p):
            pcfg = PipelineConfig(extract=ExtractConfig(
                backbone=cfg.backbone, pooling=cfg.pooling, gem_p=gem_p,
                image_size=cfg.image_size, batch_size=cfg.batch_size * 4,
                dtype="float32"))
            idx = build_index_for_dataset(ds, pcfg, variables=variables)
            return evaluate_index(idx, ds, args.eval_protocol)["mAP"]

        frozen = _map(init_vars, cfg.gem_p)
        tuned = _map(out["variables"], out["gem_p"])
        report.update(eval_dataset=args.eval_dataset,
                      eval_protocol=args.eval_protocol,
                      frozen_mAP=round(frozen, 2), tuned_mAP=round(tuned, 2),
                      lift=round(tuned - frozen, 2))
    print(json.dumps(report))
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
    b.add_argument("--lw", action="store_true",
                   help="fit a local-whitening re-ranking view (per-"
                        "cluster metric re-scoring of the top candidates; "
                        "enables lw_enabled in the saved SearchConfig)")
    b.add_argument("--lw-clusters", type=int, default=0,
                   help="local-whitening expert count (default: ~sqrt(N))")
    b.add_argument("--pq", action="store_true",
                   help="attach a product-quantization cascade view (4-bit "
                        "ADC coarse scan + exact re-score of the top "
                        "candidates; search/pq_view.py)")
    b.add_argument("--pq-m", type=int, default=0,
                   help="PQ subquantizer count (default: D/8)")
    b.add_argument("--pq-depth", type=int, default=100,
                   help="PQ cascade candidate depth (with --pq)")
    b.add_argument("--opq-iters", type=int, default=0,
                   help="OPQ rotation alternations for --pq / --ivfpq "
                        "(0 = plain PQ; ~8 typical — better candidate "
                        "recall at the same 32 B/row; for --ivfpq the "
                        "rotation is learned in residual space)")
    b.add_argument("--apq-t", type=float, default=0.0,
                   help="anisotropic (score-aware, ScaNN) threshold for "
                        "--pq / --ivfpq codebooks (0 = plain MSE fit; "
                        "~0.2 typical — raw-ADC ranking quality for "
                        "ADC-only serving; mutually exclusive with "
                        "--opq-iters)")
    b.add_argument("--ivfpq", action="store_true",
                   help="attach an IVF-PQ cascade view (k-means-bucketed "
                        "4-bit residual codes: the PQ store's 32 B/row "
                        "with the ADC scan pruned to ~nprobe/clusters; "
                        "search/ivfpq.py). Mutually exclusive with "
                        "--ivf/--pq; uses --ivf-clusters/--nprobe/--pq-m/"
                        "--pq-depth for its sizing")
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

    mg = sub.add_parser("merge-index", help="combine independently-built "
                        "indexes into one (same extraction pipeline, "
                        "disjoint names; FAISS merge_from analog)")
    mg.add_argument("indexes", nargs="+",
                    help="saved index directories; the first one's "
                         "storage dtype/capacity rules apply")
    mg.add_argument("--out", required=True,
                    help="write the merged index here")
    mg.set_defaults(fn=cmd_merge_index)

    q = sub.add_parser("query", help="query an index with an image")
    q.add_argument("--index", required=True)
    q.add_argument("--image", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--nprobe", type=int, default=None,
                   help="IVF probes (indexes built with --ivf; 0 = exact)")
    q.add_argument("--pq-depth", type=int, default=None,
                   help="PQ cascade depth (indexes built with --pq; "
                        "0 = exact)")
    q.add_argument("--ivfpq-nprobe", type=int, default=None,
                   help="IVF-PQ probes (indexes built with --ivfpq; "
                        "0 = exact)")
    q.add_argument("--diffusion", action="store_true",
                   help="diffusion re-ranking over the top candidates' "
                        "similarity graph (search/diffusion.py; depth etc. "
                        "from the index's SearchConfig)")
    q.add_argument("--lw", type=int, choices=(0, 1), default=None,
                   help="force local-whitening re-scoring on (1) or off "
                        "(0); default: the index's SearchConfig")
    q.add_argument("--subset", default=None, metavar="NAMES|@FILE",
                   help="restrict results to these image names "
                        "(comma-separated, or @file with one name per "
                        "line) — filtered search, search/subset.py")
    q.add_argument("--spatial-weight", type=float, default=None,
                   help="fuse Hough-vote spatial verification into the "
                        "regional re-rank at this weight (needs a "
                        "rerank-enabled index built by this version)")
    q.set_defaults(fn=cmd_query)

    nf = sub.add_parser("info", help="print a saved index's stats "
                        "(rows, dtype, bytes, attached views) as JSON")
    nf.add_argument("--index", required=True)
    nf.set_defaults(fn=cmd_info)

    dd = sub.add_parser("dedupe", help="near-duplicate sweep over an "
                        "index (pairs >= tau + transitive groups; "
                        "Index.find_duplicates)")
    dd.add_argument("--index", required=True)
    dd.add_argument("--tau", type=float, default=0.97,
                    help="cosine threshold for a duplicate pair")
    dd.add_argument("-k", type=int, default=16,
                    help="kNN-graph degree: max pairs contributed per "
                         "image (groups are transitive regardless)")
    dd.add_argument("--subset", default=None, metavar="NAMES|@FILE",
                    help="restrict the neighbor side to these image names")
    dd.set_defaults(fn=cmd_dedupe)

    e = sub.add_parser("evaluate", help="protocol evaluation on a dataset")
    # None defaults fall back to the preset's eval block (see cmd_evaluate)
    # so `evaluate --config configs/X.json` reproduces a workload verbatim;
    # without a preset the old mini/data/medium defaults apply
    e.add_argument("--dataset", default=None)
    e.add_argument("--data-root", default=None)
    e.add_argument("--protocol", default=None,
                   choices=["easy", "medium", "hard", "classic"])
    e.add_argument("--config", default=None)
    e.add_argument("--backbone", default=None)
    e.add_argument("--weights", default=None,
                   help="extractor weights: a torchvision .pth state_dict "
                        "(converted on load) or an orbax pytree written by "
                        "`finetune` — see docs/RUNBOOK.md")
    e.add_argument("--distractors", default=None,
                   help="directory of distractor images (Oxford105k-style)")
    e.add_argument("--sharded", action="store_true",
                   help="rank through the row-sharded distributed index "
                        "(cfg.index.num_shards devices)")
    e.set_defaults(fn=cmd_evaluate)

    sv = sub.add_parser("serve", help="JSON-lines serving loop over a "
                        "saved index (one request per stdin line)")
    sv.add_argument("--index", default=None,
                    help="saved index directory (image-query serving); "
                         "omit when serving a --host-store")
    sv.add_argument("--host-store", default=None, metavar="DIR",
                    help="capacity-scale VECTOR serving: a HostRowStore "
                         "directory (exact rows in a host memmap, codes "
                         "on chip); requests carry {\"vector\": [...]} "
                         "instead of image paths; needs --ivfpq-view")
    sv.add_argument("--ivfpq-view", default=None, metavar="DIR",
                    help="saved IVFPQView directory for --host-store "
                         "(IVFPQView.from_host_store(...).save(...))")
    sv.add_argument("--adc-only", action="store_true",
                    help="with --host-store: rank straight from the "
                         "pruned on-chip ADC scan, no host gather / "
                         "re-score (latency mode; fit the view with "
                         "--apq-t-style anisotropic codes for raw-ADC "
                         "quality)")
    sv.add_argument("--sharded", action="store_true",
                    help="serve through the row-sharded index over all "
                         "devices (multi-chip path)")
    sv.add_argument("--port", type=int, default=None,
                    help="serve over TCP on this port instead of stdin "
                         "(0 = ephemeral, printed in the ready line); "
                         "concurrent clients' requests are micro-batched "
                         "into one device pass")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--batch-wait-ms", type=float, default=2.0,
                    help="how long the dispatcher holds a TCP query batch "
                         "open for stragglers from other connections")
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
    f.add_argument("--loss", default="contrastive",
                   choices=["contrastive", "triplet", "smoothap"],
                   help="smoothap = listwise sigmoid-relaxed AP "
                        "(arXiv:2007.12163)")
    f.add_argument("--smoothap-tau", type=float, default=0.01)
    f.add_argument("--fit-lw", action="store_true",
                   help="fit Lw discriminative whitening on the training "
                        "pairs after tuning (arXiv:1711.02512 §3.4)")
    f.add_argument("--eval-dataset", default=None,
                   help="held-out dataset name: report tuned-vs-frozen mAP "
                        "lift after training (same loader as `evaluate`)")
    f.add_argument("--eval-data-root", default="data")
    f.add_argument("--eval-protocol", default="medium",
                   choices=["classic", "easy", "medium", "hard"])
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
