"""Plan-diff audit: the TPC-H multi-join family, blind vs ANALYZEd (r16).

Round 15 proved the CBO mechanism on one id (sql_cbo_broadcast: the
SMJ→broadcast flip, join-graph reorder, histogram selectivity). This audit
runs the leverage case the round-15 verdict named: the EXISTING registered
TPC-H SQL texts planned twice — raw parquet temp views with CBO off (the
blind plan every fresh session gets) vs ANALYZEd catalog tables with
CBO + planStats + joinReorder on — AQE off in both, broadcast threshold
pinned to the stock 10 MB, so the diff is purely what table/column
statistics buy the STATIC planner.

    python scripts/audit_cbo_tpch.py [sf_dir] [qid ...]

Prints one row per id (join signatures blind vs informed, changed or not)
and writes CBO_TPCH_AUDIT.json with the full signatures + plan excerpts.
The structural claims the audit backs are pinned in tests/test_plans.py
(q17's aggregate-before-broadcast semi-reduction, family-wide signature
change, no degenerate joins in either mode).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    from mini_project_big_data_analysis_spark.queries.cbo_q import (
        _TPCH_CBO_CASES,
        join_signature,
        tpch_static_plan,
    )
    from mini_project_big_data_analysis_spark.session import get_spark

    ids = argv[1:] or sorted(_TPCH_CBO_CASES)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    report = {}
    for qid in ids:
        blind = tpch_static_plan(spark, qid, sf_dir, use_stats=False)
        informed = tpch_static_plan(spark, qid, sf_dir, use_stats=True)
        sig_b, sig_i = join_signature(blind), join_signature(informed)
        degenerate = [
            s
            for s in sig_b + sig_i
            if s.startswith(("BroadcastNestedLoopJoin", "CartesianProduct"))
        ]
        report[qid] = {
            "blind": sig_b,
            "informed": sig_i,
            "changed": sig_b != sig_i,
            "degenerate": degenerate,
        }
        print(f"== {qid}  ({'CHANGED' if sig_b != sig_i else 'same'})")
        print(f"   blind   : {sig_b}")
        print(f"   informed: {sig_i}")
        if degenerate:
            print(f"   !! degenerate joins: {degenerate}")

    out = {
        "sf_dir": sf_dir,
        "ids": report,
        "changed": sorted(q for q, r in report.items() if r["changed"]),
        "confs": {
            "spark.sql.adaptive.enabled": "false (both modes)",
            "spark.sql.autoBroadcastJoinThreshold": "10485760 (both modes)",
            "cbo/planStats/joinReorder": "off blind / on informed",
        },
    }
    path = os.path.join(ROOT, "CBO_TPCH_AUDIT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"# wrote {path}: {len(out['changed'])}/{len(report)} ids changed")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
