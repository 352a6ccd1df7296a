"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Timing protocol (BASELINE.md): JVM warmed by a throwaway run, then each query
executed to a noop sink (measures compute + shuffle, not driver collect),
best-of-2 to damp JIT noise. Scale-representative subset: the flagship
composite, the heavy joins/aggregations, and the EXT training-data operators.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # infer sf from the dir name for the report
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None

    from mini_project_big_data_analysis_spark.queries import all_queries
    from mini_project_big_data_analysis_spark.session import get_spark

    spark = get_spark(app_name="mpbda-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [
        "flagship_region_hourly_stats",
        "join_inner_equi",
        "agg_time_window",
        "agg_pivot",
        "agg_global_stats",
        "agg_describe",
        "sort_order_by",
        "ext_dedup_exact",
        "ext_dedup_ngram",
        "ext_dedup_fuzzy",
        "ext_sim_topk",
        "ext_text_stats",
        "ext_lang_quality",
        "ext_emb_neardup",
        "agg_session_window",
        "window_latest_per_key",
        "ext_vocab_topk",
        "ext_token_pack",
        "ext_split_hash",
        "join_range_band",
    ]
    registry = all_queries()

    def run_once(qid: str) -> float:
        # Per-query isolation: reclaim the previous query's dead blocks /
        # Arrow buffers BEFORE the clock starts. Without this, garbage from
        # a pandas-UDF-heavy query inflates the next 2-3 entries 3-7×
        # (measured; the number then charges query N with query N-1's GC).
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        df = registry[qid].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # JVM/codegen warm-up, results discarded: the cheapest query first, then
    # a throwaway run of the first measured id — flagship joins four tables
    # whose scans/codegen the cheap warm-up never touches, and BASELINE.md's
    # warm protocol discards exactly such a run (BENCH_r02's one >2× entry
    # was this cold-start charged to flagship).
    run_once("agg_global_stats")
    run_once(headline[0])

    timings: dict[str, float] = {}
    for qid in headline:
        if qid not in registry:
            continue
        best = min(run_once(qid) for _ in range(2))
        timings[qid] = round(best, 3)
        print(f"# {qid}: {timings[qid]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)

    # Second tier: the ENTIRE catalog, best-of-2 per query — cross-round
    # regression coverage for the writes/streaming tail the headline set
    # skips. Best-of-2 (not single-run) so the recorded number is the WARM
    # time comparable to BASELINE.md's warm-median rows: measured on this
    # runtime, a single mid-suite run can inflate 10x+ over the same
    # query's isolated warm time (pure-JVM ids included — ext_doc_winnow
    # 21 s in-suite vs 3.9 s warm), and a guard that compares cold-in-suite
    # to warm-median fails spuriously. Failures are recorded, not fatal,
    # so one bad query can't void the artifact.
    timings_full: dict[str, float] = {}
    full_errors: dict[str, str] = {}
    for qid in registry:
        try:
            timings_full[qid] = round(min(run_once(qid) for _ in range(2)), 3)
        except Exception as exc:  # pragma: no cover - defensive
            full_errors[qid] = f"{type(exc).__name__}: {exc}"[:200]
        print(f"## full {qid}: {timings_full.get(qid, 'ERR')}", file=sys.stderr)
        # A query may legitimately cache (agg_cached_dashboard's shared scan);
        # release it so pinned blocks don't distort the remaining ~100 timed
        # entries (periodicGC cannot reclaim referenced cache blocks).
        spark.catalog.clearCache()

    # Full-tier detail goes to a sidecar file, NOT stdout: the driver's tail
    # capture truncates long lines, and a truncated final line cost round 3
    # its bench record (BENCH_r03 parsed=null). Stdout's last line stays a
    # compact headline-only JSON that always parses.
    full_report = {
        "metric": "full_wall_sec",
        "value": round(sum(timings_full.values()), 3),
        "unit": "sec",
        "queries": timings_full,
        "errors": full_errors,
        "sf": sf_num,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"), "w") as f:
        json.dump(full_report, f, indent=1, sort_keys=True)

    report = {
        "metric": "suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
        "full_wall_sec": full_report["value"],
        "full_errors": len(full_errors),
        "full_detail": "BENCH_FULL.json",
    }
    spark.stop()
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
