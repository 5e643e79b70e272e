#!/usr/bin/env python
"""Driver bench entrypoint: prints ONE JSON line.

Headline metric (BASELINE.json): feature-extraction images/sec/chip,
target >= 10,000 on TPU v5e. ``vs_baseline`` is value/target.
"""
import json
import os
import sys


def main() -> int:
    # NOTE: do NOT enable jax_compilation_cache_dir here — the axon TPU
    # backend hangs when the persistent compilation cache is active.
    from instsearch_tpu.bench import bench_extraction, bench_query

    ext = bench_extraction()
    try:
        qry = bench_query()
    except Exception:
        qry = None
    try:
        qry8 = bench_query(dtype="int8")
    except Exception:
        qry8 = None
    value = round(ext["images_per_sec"], 1)
    line = {
        "metric": "extraction_images_per_sec_per_chip",
        "value": value,
        "unit": "images/sec",
        "vs_baseline": round(value / 10_000.0, 4),
    }
    if qry is not None:
        line["query_p50_ms_1M"] = round(qry["p50_ms"], 3)
        line["query_qps_1M"] = round(qry["qps"], 1)
    if qry8 is not None:
        line["query_int8_p50_ms_1M"] = round(qry8["p50_ms"], 3)
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
