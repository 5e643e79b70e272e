"""Smoke-run every bench stage the driver's bench.py invokes, at toy
shapes on the CPU rig.

The bench module otherwise executes ONLY on the real chip at the end of
a round — a shape/API regression there silently costs the whole round's
measured artifact (bench.py skips a crashed stage and the key vanishes
from BENCH_rN.json). These tests pin the contract instead: each stage
must run end-to-end on the CPU fallback path and emit the exact keys the
driver-side bench.py reads. Timings at toy scale are noise and are only
checked for finiteness.
"""
import numpy as np
import pytest

from instsearch_tpu import bench as B


def _finite(x):
    return np.isfinite(float(x))


def test_bench_query_smoke():
    out = B.bench_query(n=4096, d=64, k=5, q_batch=2)
    assert _finite(out["p50_ms"]) and out["p50_ms"] > 0
    assert _finite(out["qps"])
    # variance metadata contract (VERDICT r4 weak 3): driver bench.py
    # emits reps + p10/p90 spread for the headline latency keys
    assert out["reps"] > 0
    lo, hi = out["spread_ms"]
    assert _finite(lo) and _finite(hi) and lo <= hi


def test_bench_qe_smoke():
    out = B.bench_qe(n=4096, d=64, k=5, qe_n=3)
    assert _finite(out["p50_ms"]) and out["p50_ms"] > 0


def test_bench_rerank_smoke():
    out = B.bench_rerank(n=2048, d=64, r=4, k=5, depth=32)
    assert _finite(out["p50_ms"]) and out["p50_ms"] > 0


def test_bench_refine_smoke():
    out = B.bench_refine(n=4096, d=64, depth=32, k=5)
    assert _finite(out["p50_ms"]) and out["p50_ms"] > 0


def test_bench_diffusion_smoke():
    out = B.bench_diffusion(n=4096, d=64, k=5, depth=32, knn=4, iters=3)
    assert _finite(out["p50_ms"]) and out["p50_ms"] > 0


def test_bench_lw_smoke():
    out = B.bench_lw(n=4096, d=64, e=8, depth=32, k=5)
    assert _finite(out["p50_ms"]) and out["p50_ms"] > 0


def test_bench_ivf_smoke():
    # the honesty-curve contract (VERDICT r3 item 6): driver bench.py
    # reads recall_at_k_vs_nprobe / scan_fraction / p50_ms
    out = B.bench_ivf(n=4096, d=64, k=5, n_clusters=16, nprobe=4,
                      recall_nprobes=(1, 4, 16))
    assert _finite(out["p50_ms"]) and out["p50_ms"] > 0
    assert 0 < out["scan_fraction"] <= 1
    curve = out["recall_at_k_vs_nprobe"]
    assert set(curve) == {"1", "4", "16"}
    for v in curve.values():
        assert 0.0 <= v <= 1.0
    # full probe scans every cluster -> recall must be exact; nprobe=1 on
    # boundary queries must NOT report the vacuous 1.0 the r3 bug produced
    assert curve["16"] == pytest.approx(1.0)
    assert curve["1"] < 1.0
    assert out["recall_at_k"] == curve["4"]


def test_bench_pq_smoke():
    # driver bench.py reads p50_ms / recall_at_k / recall_at_k_vs_depth
    out = B.bench_pq(n=4096, d=64, k=5, depth=32, m=8, fit_rows=2048)
    assert _finite(out["p50_ms"]) and out["p50_ms"] > 0
    curve = out["recall_at_k_vs_depth"]
    assert "32" in curve and "1024" in curve
    assert out["recall_at_k"] == curve["32"]
    # the cascade re-scores exactly: deeper candidate sets can only help
    assert curve["1024"] >= curve["32"]


def test_bench_pq_capacity_smoke():
    # capacity regime (VERDICT r3 item 5): driver bench.py reads n /
    # codes_gb / p50_ms / effective_gbps and the per-batch qps entries
    out = B.bench_pq_capacity(n=8192, d=64, m=8, depth=16,
                              q_batches=(1, 4))
    assert out["n"] == 8192
    assert _finite(out["p50_ms"]) and out["p50_ms"] > 0
    assert _finite(out["effective_gbps"])
    assert set(out["per_batch"]) == {"1", "4"}
    for entry in out["per_batch"].values():
        assert _finite(entry["p50_ms"]) and entry["p50_ms"] > 0
        assert _finite(entry["qps"])
    assert out["q_batch"] == 1
    assert out["p50_ms"] == out["per_batch"]["1"]["p50_ms"]


def test_bench_protocol_eval_smoke():
    out = B.bench_protocol_eval(n=2048, n_queries=8, d=64)
    assert _finite(out["total_warm_sec"])


def test_bench_ivfpq_smoke():
    out = B.bench_ivfpq(n=4096, d=64, k=5, n_clusters=16, nprobe=4, m=8,
                        depth=32, recall_nprobes=(1, 4, 16),
                        recall_depths=(8,), host_quality=False)
    assert _finite(out["p50_ms"]) and out["p50_ms"] > 0
    assert 0 < out["scan_fraction"] <= 1
    curve = out["recall_at_k_vs_nprobe"]
    assert set(curve) == {"1", "4", "16"}
    assert curve["16"] >= curve["1"]
    # the recall headline is measured at the TIMED (nprobe, depth) point
    # (VERDICT r4 item 1: no speed claim without its recall)
    assert out["recall_at_k"] == curve["4"]
    assert out["depth"] == 32
    # contrast depths carry recall only; shallower can only hurt
    assert out["recall_at_k_depth8"] <= curve["4"]
    assert out["reps"] > 0 and len(out["spread_ms"]) == 2


def test_bench_ivfpq_capacity_smoke():
    out = B.bench_ivfpq_capacity(n=8192, d=64, m=8, n_clusters=32,
                                 nprobe=4, depth=16, q_batches=(1, 4))
    assert _finite(out["p50_ms"]) and out["p50_ms"] > 0
    assert set(out["per_batch"]) == {"1", "4"}
    assert out["scan_fraction"] == pytest.approx(4 / 32)


def test_bench_host_serve_smoke(tmp_path):
    # the capacity-serving deployment path (VERDICT r4 item 3): driver
    # bench.py reads p50_ms / host_gather_rescore_p50_ms / per_batch;
    # production_p50_ms composes the chained ADC p50 passed in
    out = B.bench_host_serve(n=8192, d=64, m=8, n_clusters=32, nprobe=4,
                             depth=16, q_batches=(1, 2), reps=3,
                             adc_chained_ms={"1": 0.5},
                             workdir=str(tmp_path))
    assert _finite(out["p50_ms"]) and out["p50_ms"] > 0
    assert _finite(out["host_gather_rescore_p50_ms"])
    assert out["production_p50_ms"] == pytest.approx(
        0.5 + out["host_gather_rescore_p50_ms"])
    assert set(out["per_batch"]) == {"1", "2"}
    for e in out["per_batch"].values():
        assert e["host_gather_rescore_p50_ms"] <= e["e2e_p50_ms"]


def test_bench_ivfpq_host_quality_smoke():
    # the host-store quality triple rides bench_ivfpq (where the fitted
    # view + exact ranking already live): driver bench.py reads
    # host_quality.{plain,anisotropic_t0.2}.recall_at_k_*
    out = B.bench_ivfpq(n=4096, d=64, k=5, n_clusters=16, nprobe=4, m=8,
                        depth=32, recall_nprobes=(4,), recall_depths=(),
                        host_quality=True)
    q = out["host_quality"]
    assert set(q) == {"plain", "anisotropic_t0.2"}
    for qd in q.values():
        for v in qd.values():
            assert 0.0 <= v <= 1.0
        # host cascade re-scores against the int8 store: allow only the
        # store-quantization delta vs the device cascade
        assert qd["recall_at_k_cascade_host"] == pytest.approx(
            qd["recall_at_k_cascade_device"], abs=0.1)
