"""Run every committed workload preset end-to-end (SURVEY.md §6): the five
BASELINE.json configurations plus the beyond-reference presets (flagship
million-scale int8, int4 capacity, quality ladder, compact-128) — every
``configs/*.json`` — build -> (whiten) -> query/QE/re-rank -> protocol
metrics.

``scale_down`` shrinks image size / batch so the suite runs in CI and on
the mini fixture; the config *structure* (backbone, pooling, whitening,
QE, sharding, re-ranking) is exercised unchanged. The sharded workload
routes through ``Index.to_sharded`` with as many shards as devices exist.
"""
from __future__ import annotations

import glob
import os
import time

import numpy as np

from .config import PipelineConfig
from .eval.datasets import RetrievalDataset, load_dataset
from .eval.evaluate import evaluate_index
from .index import Index

PRESET_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def list_presets() -> list[str]:
    return sorted(
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(PRESET_DIR, "*.json")))


def load_preset(name: str) -> PipelineConfig:
    return PipelineConfig.load(os.path.join(PRESET_DIR, name + ".json"))


def _scaled(cfg: PipelineConfig, image_size: int, batch: int) -> PipelineConfig:
    # NOTE: index.capacity is deliberately untouched — every preset ships
    # capacity=0 (size to the dataset), so CI runs exercise the same
    # padding/capacity code path at small row counts; the 1M-row sizing
    # itself is covered on-chip (bench_query / query_capacity_int8_4M).
    return PipelineConfig(
        extract=cfg.extract.replace(image_size=image_size, batch_size=batch),
        index=cfg.index, search=cfg.search, eval=cfg.eval)


def run_workload(name: str, dataset: RetrievalDataset,
                 scale_down: bool = True, seed: int = 0) -> dict:
    import jax

    cfg = load_preset(name)
    if scale_down:
        cfg = _scaled(cfg, image_size=64, batch=8)
    n_dev = len(jax.devices())
    shards = min(cfg.index.num_shards, n_dev)
    if shards != cfg.index.num_shards:
        cfg = PipelineConfig(extract=cfg.extract,
                             index=cfg.index.replace(num_shards=shards),
                             search=cfg.search, eval=cfg.eval)

    t0 = time.time()
    idx = Index.build(dataset.db_paths, cfg, seed=seed)
    if cfg.search.lw_enabled:
        # the local-whitening view is a post-build fit (same lifecycle as
        # the IVF view); expert count defaults to ~sqrt(N)
        idx.fit_local_whitening(seed=seed)
    if cfg.search.ivfpq_nprobe > 0:
        # candidate-tier lifecycle is a post-build fit too; sizing
        # defaults (~sqrt(N) clusters, D/8 subspaces). Protocol metrics
        # below always rank the FULL index exactly (AP consumes the
        # complete ranking), so the tier shows up in the serving-route
        # guard, not in mAP
        idx.build_ivfpq(nprobe=cfg.search.ivfpq_nprobe, seed=seed)
    build_s = time.time() - t0

    protocol = cfg.eval.protocol if dataset.name != "mini" else "medium"
    scfg = cfg.search
    rescoring_on = (scfg.rerank_enabled or scfg.refine_enabled
                    or scfg.diffusion_enabled or scfg.lw_enabled
                    or scfg.spatial_weight > 0)
    res = evaluate_index(idx, dataset, protocol, include_ranks=True)

    out = {
        "workload": name,
        "backbone": cfg.extract.backbone,
        "pooling": cfg.extract.pooling,
        "whiten": cfg.extract.whiten,
        "scales": list(cfg.extract.scales),
        "qe": cfg.search.qe_enabled,
        "rerank": cfg.search.rerank_enabled,
        "spatial": cfg.search.spatial_weight > 0,
        "lw": cfg.search.lw_enabled,
        "num_shards": shards,
        "num_images": idx.num_valid,
        "descriptor_dim": idx.dim,
        "build_sec": round(build_s, 2),
        "mAP": round(res["mAP"], 2),
    }
    if scfg.ivfpq_nprobe > 0:
        # routing guard for the candidate tier: the view must exist and
        # actually serve Index.search. Recall is measured on the
        # dataset's OWN query descriptors — out-of-sample w.r.t. the
        # indexed rows (VERDICT r4 weak 5: the old rows-0..8 guard was
        # in-sample, same-cluster by construction, exactly the pathology
        # the r4 measure_recall fix exists to avoid) — so CI catches a
        # recall collapse in the view fit, not just a routing break
        assert idx.ivfpq is not None
        import jax.numpy as jnp

        from .eval.evaluate import extract_queries
        qv = extract_queries(idx, dataset)
        qv = np.asarray(idx._match_query_dim(jnp.asarray(qv)), np.float32)
        rec = idx.ivfpq.measure_recall(idx, qv,
                                       k=min(10, idx.num_valid))
        out["ivfpq"] = True
        out["ivfpq_recall_at_10"] = round(float(rec), 3)
    for key in ("mP@1", "mP@5", "mP@10"):
        if key in res:
            out[key] = round(res[key], 2)

    # stage-dropout guard (the r3 lw wiring bug: evaluate silently
    # reported a plain-cosine mAP for an lw-enabled preset, and the old
    # isfinite-only checks couldn't see it). Two layers:
    #   * stages_missing — every stage the preset enables must appear in
    #     evaluate's execution record (catches a missing splice branch
    #     even for a stage that is order-preserving on this dataset);
    #   * rescoring_changed_ranking — the stage-on protocol ranking vs
    #     the all-stages-off one (diffusion on the tight near-duplicate
    #     mini clusters is legitimately order-preserving, so tests assert
    #     this only for rank-moving stages: rerank/spatial/lw/refine).
    enabled = [nm for nm, on in (("qe", scfg.qe_enabled),
                                 ("rerank", scfg.rerank_enabled),
                                 ("spatial", scfg.spatial_weight > 0),
                                 ("refine", scfg.refine_enabled),
                                 ("diffusion", scfg.diffusion_enabled),
                                 ("lw", scfg.lw_enabled)) if on]
    out["stages_missing"] = sorted(set(enabled)
                                   - set(res["stages_applied"]))
    if rescoring_on:
        off = scfg.replace(rerank_enabled=False, refine_enabled=False,
                           diffusion_enabled=False, lw_enabled=False,
                           spatial_weight=0.0)
        res_off = evaluate_index(idx, dataset, protocol, off,
                                 include_ranks=True)
        out["mAP_rescoring_off"] = round(res_off["mAP"], 2)
        out["rescoring_changed_ranking"] = bool(
            (res["ranks"] != res_off["ranks"]).any())

    if shards > 1:
        # the sharded workloads must compute their protocol metrics THROUGH
        # the distributed machinery and agree with the single-device path
        # exactly (SURVEY.md §4.4: sharded == single-device)
        sidx = idx.to_sharded()
        res_sharded = evaluate_index(idx, dataset, protocol,
                                     sharded_index=sidx,
                                     include_ranks=True)
        out["mAP_sharded"] = round(res_sharded["mAP"], 2)
        # rank-level equality, not just mAP: every re-scoring stage the
        # preset enables (rerank/spatial/diffusion/lw) must produce the
        # IDENTICAL protocol ranking through the distributed machinery
        out["sharded_matches_single"] = bool(
            abs(res_sharded["mAP"] - res["mAP"]) < 1e-6
            and (res_sharded["ranks"] == res["ranks"]).all())
    return out


def run_all(data_root: str = "data", dataset_name: str = "mini",
            scale_down: bool = True) -> list[dict]:
    dataset = load_dataset(dataset_name, data_root)
    return [run_workload(name, dataset, scale_down)
            for name in list_presets()]
