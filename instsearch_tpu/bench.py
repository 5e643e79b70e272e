"""Benchmark harness (SURVEY.md §3.5): the driver's metric source.

Measures on whatever backend is live (the real v5e chip in this
environment). Synthetic device-resident inputs: the metric is the compute
path's throughput, per BASELINE.json ("images/sec/chip extraction;
queries/sec over 1M index").
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import ExtractConfig, SearchConfig
from .extractor import build_extract_fn


def _timeit(fn, *args, iters: int = 10, warmup: int = 2) -> list[float]:
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return times


def bench_extraction(batch: int = 128, image_size: int = 224,
                     backbone: str = "resnet50", pooling: str = "gem",
                     iters: int = 10) -> dict:
    cfg = ExtractConfig(backbone=backbone, pooling=pooling,
                        image_size=image_size, batch_size=batch,
                        dtype="bfloat16")
    model, extract = build_extract_fn(cfg)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, np.zeros((1, image_size, image_size, 3), np.float32))
    fn = jax.jit(lambda v, x: extract(v, x))
    x = jnp.asarray(
        (np.random.default_rng(0).random((batch, image_size, image_size, 3)) * 255)
        .astype(np.uint8))
    times = _timeit(fn, variables, x, iters=iters)
    best = min(times)
    med = float(np.median(times))
    return {
        "images_per_sec": batch / med,
        "images_per_sec_best": batch / best,
        "batch": batch, "image_size": image_size, "backbone": backbone,
        "p50_ms": med * 1e3,
    }


def bench_query(n: int = 1_000_000, d: int = 512, k: int = 10,
                q_batch: int = 1, iters: int = 30, use_pallas: bool = True) -> dict:
    """Brute-force top-k over an HBM-resident [N, D] bf16 index."""
    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Xd = jnp.asarray(X, jnp.bfloat16)
    q = jnp.asarray(X[:q_batch] + 0.01)
    if use_pallas and jax.devices()[0].platform == "tpu":
        from .kernels.topk_matmul import topk_matmul
        fn = jax.jit(lambda X, q: topk_matmul(X, q, k=k))
    else:
        from .search.bruteforce import search_topk
        fn = jax.jit(lambda X, q: search_topk(X, q, k=k))
    times = _timeit(fn, Xd, q, iters=iters, warmup=3)
    p50 = float(np.percentile(times, 50))
    p99 = float(np.percentile(times, 99))
    return {
        "p50_ms": p50 * 1e3, "p99_ms": p99 * 1e3,
        "qps": q_batch / p50, "n": n, "d": d, "k": k,
    }


def run_bench(what: str = "all") -> dict:
    out: dict = {"platform": jax.devices()[0].platform,
                 "device": str(jax.devices()[0])}
    if what in ("extraction", "all"):
        out["extraction"] = bench_extraction()
    if what in ("query", "all"):
        try:
            out["query"] = bench_query()
        except Exception as e:  # pallas path may not exist yet
            out["query"] = bench_query(use_pallas=False)
            out["query"]["note"] = f"oracle path ({type(e).__name__})"
    return out
