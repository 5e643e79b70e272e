#!/usr/bin/env python
"""Driver bench entrypoint: prints ONE JSON line.

Headline metric (BASELINE.json): feature-extraction images/sec/chip,
target >= 10,000 on TPU v5e. ``vs_baseline`` is value/target. Extra keys:
disk->descriptor e2e throughput, 1M-index query p50/p99 (bf16 + int8,
single + batched-128) with fraction-of-roofline computed against a bf16
HBM-stream probe timed INTERLEAVED with each kernel (chip speed drifts
±15% run-to-run; a separately-timed probe makes the ratio dishonest),
and the full image->result single-query latency.
"""
import json
import sys


def main() -> int:
    # NOTE: do NOT enable jax_compilation_cache_dir here — the axon TPU
    # backend hangs when the persistent compilation cache is active.
    from instsearch_tpu.bench import (bench_diffusion, bench_extraction,
                                      bench_extraction_e2e,
                                      bench_filtered_query,
                                      bench_host_serve,
                                      bench_ivf, bench_ivfpq,
                                      bench_ivfpq_capacity,
                                      bench_protocol_eval, bench_qe,
                                      bench_lw, bench_pq, bench_pq_capacity,
                                      bench_query, bench_query_e2e,
                                      bench_refine, bench_rerank)

    import os
    import time
    t0 = time.monotonic()
    # soft budget: the stage list has grown (int4/diffusion/refine joined
    # in round 3, IVF/PQ honesty+capacity in round 4; ~25-30 min total
    # through the tunnel). The headline metric runs FIRST; once past the
    # budget the remaining optional stages are skipped so the driver
    # ALWAYS gets its one JSON line.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2700"))

    def _try(fn, *a, **kw):
        if time.monotonic() - t0 > budget_s:
            return None
        try:
            return fn(*a, **kw)
        except Exception:
            return None

    ext = bench_extraction()
    e2e = _try(bench_extraction_e2e)
    qry = _try(bench_query)
    qry8 = _try(bench_query, dtype="int8")
    qry8b = _try(bench_query, dtype="int8", q_batch=128)
    qe2e = _try(bench_query_e2e)
    qe = _try(bench_qe)
    rrk = _try(bench_rerank)
    qry4 = _try(bench_query, dtype="int4")
    filt = _try(bench_filtered_query)
    diff = _try(bench_diffusion)
    refine = _try(bench_refine)
    lw = _try(bench_lw)
    pqc = _try(bench_pq)
    peval = _try(bench_protocol_eval)
    # honesty curves + capacity regime (VERDICT r3 items 5-6) run LAST:
    # if the soft budget is hit, the long-standing headline keys above
    # still all emit
    ivf = _try(bench_ivf)
    pqcap = _try(bench_pq_capacity)
    # newest stages last: if the soft budget is hit, the r3/r4 keys
    # above still all emit
    ivfpq = _try(bench_ivfpq)
    ivfpqcap = _try(bench_ivfpq_capacity)
    # the capacity DEPLOYMENT path (host-store serving): reuses the
    # chained-marginal ADC p50 from ivfpq_capacity so its artifact can
    # state the production latency without the tunnel's fixed dispatch
    hsv = _try(bench_host_serve,
               adc_chained_ms=(
                   {b: e["p50_ms"] for b, e in
                    ivfpqcap["per_batch"].items()}
                   if ivfpqcap is not None else None))

    value = round(ext["images_per_sec"], 1)
    line = {
        "metric": "extraction_images_per_sec_per_chip",
        "value": value,
        "unit": "images/sec",
        "vs_baseline": round(value / 10_000.0, 4),
    }
    if e2e is not None:
        line["extraction_e2e_images_per_sec"] = round(
            e2e["images_per_sec_e2e"], 1)
        line["e2e_frac_of_transfer_bound"] = round(
            e2e["frac_of_transfer_bound"], 3)
        # vs the serial decode+transfer composition on this box's ONE
        # host core, bounds measured adjacent to the e2e loop
        line["e2e_pipeline_efficiency"] = round(
            e2e["pipeline_efficiency"], 3)
        # per-stage breakdown in the artifact (VERDICT r4 item 7): when
        # efficiency moves round-to-round, these localize which host
        # stage moved — decode, sustained h2d, or the overlap itself
        line["e2e_decode_img_s"] = round(
            e2e["decode_images_per_sec_insitu"], 1)
        line["e2e_h2d_mbps"] = round(
            e2e["host_to_device_mbps_sustained"], 1)
        line["e2e_serial_bound_img_s"] = round(
            e2e["serial_host_bound_images_per_sec"], 1)
        line["e2e_spread_img_s"] = e2e["e2e_spread_img_s"]
    if qry is not None:
        line["query_p50_ms_1M"] = round(qry["p50_ms"], 3)
        line["query_p99_ms_1M"] = round(qry["p99_ms"], 3)
        line["query_qps_1M"] = round(qry["qps"], 1)
        if "hbm_bw_gbps" in qry:
            line["hbm_bw_gbps"] = round(qry["hbm_bw_gbps"], 1)
        if "frac_of_roofline" in qry:
            line["query_frac_of_roofline"] = round(qry["frac_of_roofline"], 3)
        # rep count + p10/p90 spread of the per-rep marginals (VERDICT r4
        # weak 3): lets a reader tell chip drift from a real regression
        line["query_reps"] = qry["reps"]
        line["query_spread_ms"] = qry["spread_ms"]
    if qry8 is not None:
        line["query_int8_p50_ms_1M"] = round(qry8["p50_ms"], 3)
        if "frac_of_roofline" in qry8:
            # can exceed 1: the int8 kernel outruns the bf16 XLA reference
            # stream (see instsearch_tpu/bench.py) — effective_gbps is the
            # absolute statement
            line["query_int8_frac_of_roofline"] = round(
                qry8["frac_of_roofline"], 3)
        if "effective_gbps" in qry8:
            line["query_int8_effective_gbps"] = round(
                qry8["effective_gbps"], 1)
    if qry8b is not None:
        line["query_int8_qps_b128"] = round(qry8b["qps"], 1)
    if qe2e is not None:
        line["query_e2e_p50_ms_1M"] = round(qe2e["p50_ms"], 3)
    if qe is not None:
        line["qe_p50_ms_1M"] = round(qe["p50_ms"], 3)
        if "frac_of_roofline" in qe:
            # reference = TWO full scans (expansion + final)
            line["qe_frac_of_roofline"] = round(qe["frac_of_roofline"], 3)
    if rrk is not None:
        line["rerank_p50_ms_1M"] = round(rrk["p50_ms"], 3)
        if "frac_of_roofline" in rrk:
            line["rerank_frac_of_roofline"] = round(
                rrk["frac_of_roofline"], 3)
        line["rerank_spread_ms"] = rrk["spread_ms"]
    if qry4 is not None:
        line["query_int4_p50_ms_1M"] = round(qry4["p50_ms"], 3)
        if "effective_gbps" in qry4:
            line["query_int4_effective_gbps"] = round(
                qry4["effective_gbps"], 1)
        if "frac_of_roofline" in qry4:
            # the drift-immune paired ratio (VERDICT r4 weak 2): int4's
            # absolute numbers decayed 45% across r2-r4 with no way to
            # tell chip drift from regression — this ratio is interleaved
            # rep-for-rep with the bf16 stream probe, so drift cancels
            line["query_int4_frac_of_roofline"] = round(
                qry4["frac_of_roofline"], 3)
        line["query_int4_spread_ms"] = qry4["spread_ms"]
    if filt is not None:
        # subset-filtered scan (search/subset.py): the paired overhead
        # ratio is the claim — filtering costs ~nothing (1 byte/row of
        # extra stream); members_only is the on-chip correctness check
        line["query_filtered_p50_ms_1M"] = round(filt["p50_ms"], 3)
        if "overhead_ratio" in filt:
            line["query_filtered_overhead_ratio"] = round(
                filt["overhead_ratio"], 3)
        line["query_filtered_members_only"] = filt["members_only"]
    if diff is not None:
        line["diffusion_p50_ms_1M"] = round(diff["p50_ms"], 3)
        if "frac_of_roofline" in diff:
            line["diffusion_frac_of_roofline"] = round(
                diff["frac_of_roofline"], 3)
    if refine is not None:
        line["refine_p50_ms_1M"] = round(refine["p50_ms"], 3)
    if lw is not None:
        line["lw_p50_ms_1M"] = round(lw["p50_ms"], 3)
        if "frac_of_roofline" in lw:
            # reference = one scan + the full f32 bank read (amortizes
            # over the batch; B=1 pays both)
            line["lw_frac_of_roofline"] = round(lw["frac_of_roofline"], 3)
    if pqc is not None:
        line["pq_p50_ms_1M"] = round(pqc["p50_ms"], 3)
        line["pq_recall_at_10"] = round(pqc["recall_at_k"], 4)
        if "recall_at_k_vs_depth" in pqc:
            line["pq_recall_at_10_vs_depth"] = pqc["recall_at_k_vs_depth"]
        if "speedup_vs_full_stream" in pqc:
            line["pq_speedup_vs_full_stream"] = round(
                pqc["speedup_vs_full_stream"], 3)
    if peval is not None:
        line["eval105k_warm_sec"] = round(peval["total_warm_sec"], 3)
    if ivf is not None:
        line["ivf_p50_ms_1M"] = round(ivf["p50_ms"], 3)
        line["ivf_scan_fraction"] = ivf["scan_fraction"]
        # the honesty curve: out-of-sample recall@10 per nprobe, so the
        # latency headline always carries its real recall cost
        line["ivf_recall_at_10_vs_nprobe"] = ivf["recall_at_k_vs_nprobe"]
        if "speedup_vs_full_stream" in ivf:
            line["ivf_speedup_vs_full_stream"] = round(
                ivf["speedup_vs_full_stream"], 3)
    if ivfpq is not None:
        # the timed operating point is the production default depth=400
        # (>=0.95 recall@10); the recall curve below is measured AT that
        # depth, so latency and recall describe the same program
        line["ivfpq_p50_ms_1M"] = round(ivfpq["p50_ms"], 3)
        line["ivfpq_depth"] = ivfpq["depth"]
        line["ivfpq_recall_at_10"] = ivfpq["recall_at_k"]
        line["ivfpq_scan_fraction"] = ivfpq["scan_fraction"]
        line["ivfpq_recall_at_10_vs_nprobe"] = ivfpq["recall_at_k_vs_nprobe"]
        for key in ivfpq:
            if key.startswith("recall_at_k_depth"):
                line["ivfpq_" + key.replace("_at_k_", "_at_10_")] = \
                    ivfpq[key]
        if "speedup_vs_full_stream" in ivfpq:
            line["ivfpq_speedup_vs_full_stream"] = round(
                ivfpq["speedup_vs_full_stream"], 3)
        # host-store serving quality triple (computed here where the
        # fitted view + exact ranking already live; latency is
        # bench_host_serve's): _apq = anisotropic_t=0.2 score-aware fit
        for label, qd in ivfpq.get("host_quality", {}).items():
            suf = "_apq" if label.startswith("aniso") else ""
            line[f"hostq_recall_at_10_cascade{suf}"] = \
                qd["recall_at_k_cascade_host"]
            line[f"hostq_recall_at_10_adc_only{suf}"] = \
                qd["recall_at_k_adc_only"]
    if ivfpqcap is not None:
        line["ivfpq_capacity_rows"] = ivfpqcap["n"]
        line["ivfpq_capacity_depth"] = ivfpqcap["depth"]
        line["ivfpq_capacity_p50_ms"] = round(ivfpqcap["p50_ms"], 3)
        line["ivfpq_capacity_scan_fraction"] = ivfpqcap["scan_fraction"]
        for b, e in ivfpqcap.get("per_batch", {}).items():
            if b == str(ivfpqcap.get("q_batch")):
                continue
            line[f"ivfpq_capacity_p50_ms_b{b}"] = round(e["p50_ms"], 3)
            line[f"ivfpq_capacity_qps_b{b}"] = round(e["qps"], 1)
    if hsv is not None:
        # host-store serving (cli serve --host-store): e2e includes this
        # box's ~25 ms fixed tunnel dispatch on the one fenced ADC call;
        # production_p50 = chained-marginal ADC + measured host part
        line["host_serve_rows"] = hsv["n"]
        line["host_serve_e2e_p50_ms"] = round(hsv["p50_ms"], 3)
        line["host_serve_gather_rescore_p50_ms"] = round(
            hsv["host_gather_rescore_p50_ms"], 3)
        if "production_p50_ms" in hsv:
            line["host_serve_production_p50_ms"] = round(
                hsv["production_p50_ms"], 3)
        b1 = hsv["per_batch"].get("1", {})
        if "host_gather_cold_ms" in b1:
            line["host_serve_gather_cold_ms"] = round(
                b1["host_gather_cold_ms"], 3)
        for b, e in hsv["per_batch"].items():
            if b == "1":
                continue
            line[f"host_serve_e2e_p50_ms_b{b}"] = round(e["e2e_p50_ms"], 3)
            line[f"host_serve_gather_rescore_p50_ms_b{b}"] = round(
                e["host_gather_rescore_p50_ms"], 3)
    if pqcap is not None:
        # no roofline frac here: the interleaved probe misreads next to
        # ~100 ms kernels (read 131 GB/s vs 753 standalone); the honest
        # statement is the effective code-stream bandwidth per batch size
        line["pq_capacity_rows"] = pqcap["n"]
        line["pq_capacity_codes_gb"] = pqcap["codes_gb"]
        line["pq_capacity_p50_ms"] = round(pqcap["p50_ms"], 3)
        line["pq_capacity_effective_gbps"] = round(
            pqcap["effective_gbps"], 1)
        for b, e in pqcap.get("per_batch", {}).items():
            if b == str(pqcap.get("q_batch")):
                continue
            line[f"pq_capacity_p50_ms_b{b}"] = round(e["p50_ms"], 3)
            line[f"pq_capacity_qps_b{b}"] = round(e["qps"], 1)
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
