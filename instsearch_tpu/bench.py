"""Benchmark harness (SURVEY.md §3.5): the driver's metric source.

Timing methodology: this environment reaches the TPU through a tunnel with
~25 ms fixed dispatch overhead per fenced call, so naive per-call timing
measures the tunnel, not the chip. Every benchmark therefore runs the op
n1 and n2 times *inside one jitted program* (chained with a tiny data
dependency so XLA cannot CSE or reorder them) and reports the marginal
cost ``(t(n2) - t(n1)) / (n2 - n1)`` — the true device time per call.
Verified against the HBM roofline: a 1M x 512 bf16 scan measures ~1.45 ms
vs 1.34 ms theoretical at 819 GB/s.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import ExtractConfig
from .extractor import build_extract_fn


def _median_time(fn, *args, reps: int = 5) -> float:
    """Readback-fenced wall time (np.asarray forces completion).

    IMPORTANT: ``fn`` must take its big operands as *arguments* — a jitted
    closure over a device array embeds it as a constant, and constant
    processing for GB-sized arrays hangs the compile in this environment.
    """
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


def dispatch_overhead(reps: int = 10) -> float:
    """Fixed per-call host<->device round-trip cost (~25 ms through the
    axon tunnel): time a trivial jitted program with readback."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    return _median_time(f, x, reps=reps)


def marginal_time(make_chained, args, n: int = 11, reps: int = 5) -> float:
    """``make_chained(n)`` returns a jitted fn running the op n times with a
    serial data dependency. One compile: per-op cost is
    ``(t(chain_n) - dispatch_overhead) / n``."""
    overhead = dispatch_overhead()
    t = _median_time(make_chained(n), *args, reps=reps)
    return max((t - overhead) / n, 1e-9)


def bench_extraction(batch: int = 128, image_size: int = 224,
                     backbone: str = "resnet50", pooling: str = "gem",
                     scales: tuple = (1.0,)) -> dict:
    cfg = ExtractConfig(backbone=backbone, pooling=pooling,
                        image_size=image_size, batch_size=batch,
                        scales=scales, dtype="bfloat16")
    model, extract = build_extract_fn(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, image_size, image_size, 3), np.float32))
    x = jnp.asarray(np.random.default_rng(0).random(
        (batch, image_size, image_size, 3), dtype=np.float32))

    def make_chained(n):
        # lax.scan: the body compiles ONCE per program regardless of n
        def run(variables, x):
            def body(acc, _):
                d = extract(variables, x + acc * 1e-30)
                return acc + d[0, 0].astype(jnp.float32), None
            return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                None, length=n)[0]
        return jax.jit(run)

    # long chain: tunnel jitter (~±3 ms) must be small vs n * per_call
    per_call = marginal_time(make_chained, (variables, x), n=16)
    return {
        "images_per_sec": batch / per_call,
        "ms_per_batch": per_call * 1e3,
        "batch": batch, "image_size": image_size, "backbone": backbone,
        "pooling": pooling, "scales": list(scales),
    }


def bench_query(n: int = 1_048_576, d: int = 512, k: int = 10,
                q_batch: int = 1, use_pallas: bool = True,
                dtype: str = "bfloat16") -> dict:
    """Brute-force top-k over an HBM-resident [N, D] index (bf16 or int8)."""
    # generate the index ON DEVICE: pushing GBs through the tunnel takes
    # minutes, and the content doesn't matter for a scan benchmark
    @jax.jit
    def make_index():
        X = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
        X = X / jnp.linalg.norm(X, axis=1, keepdims=True)
        return X.astype(jnp.bfloat16), X[:q_batch].astype(jnp.bfloat16)

    Xd, q = make_index()
    Xd, q = jax.block_until_ready(Xd), jax.block_until_ready(q)
    on_tpu = jax.devices()[0].platform == "tpu"
    item_bytes = 2

    if dtype == "int8":
        from .ops.quantize import quantize_rows
        qr = quantize_rows(Xd.astype(jnp.float32))
        from .kernels.topk_matmul import topk_matmul_int8
        values, scales = jax.block_until_ready(qr.values), qr.scales
        op = lambda V, S, qq: topk_matmul_int8(V, S, qq, k=k)
        args = (values, scales, q.astype(jnp.float32))
        path = "pallas-int8"
        item_bytes = 1
    elif use_pallas and on_tpu:
        from .kernels.topk_matmul import topk_matmul
        op = lambda X, qq: topk_matmul(X, qq, k=k)
        args = (Xd, q)
        path = "pallas"
    else:
        from .search.bruteforce import search_topk
        op = lambda X, qq: search_topk(X, qq, k=k)
        args = (Xd, q)
        path = "xla"

    def make_chained(m):
        # unrolled, NOT lax.scan: compiling scan(pallas_call) takes minutes
        # in this environment while unrolled calls compile quickly
        def run(*a):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(m):
                s, _ = op(*a[:-1], a[-1] + acc * 1e-30)
                acc = acc + s[0, 0]
            return acc
        return jax.jit(run)

    per_call = marginal_time(make_chained, args, n=11)
    hbm_roofline_ms = n * d * item_bytes / 819e9 * 1e3
    return {
        "p50_ms": per_call * 1e3,
        "qps": q_batch / per_call,
        "n": n, "d": d, "k": k, "q_batch": q_batch, "path": path,
        "hbm_roofline_ms": hbm_roofline_ms,
        "frac_of_roofline": hbm_roofline_ms / (per_call * 1e3),
    }


def run_bench(what: str = "all") -> dict:
    out: dict = {"platform": jax.devices()[0].platform,
                 "device": str(jax.devices()[0])}
    if what in ("extraction", "all"):
        out["extraction"] = bench_extraction()
    if what in ("query", "all"):
        out["query"] = bench_query()
        out["query_b64"] = bench_query(q_batch=64)
        out["query_int8"] = bench_query(dtype="int8")
    return out
