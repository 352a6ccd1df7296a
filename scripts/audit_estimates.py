"""Cost-estimate audit: Catalyst's STATIC estimates vs AQE's RUNTIME actuals
per pinned query (VERDICT r13 item 7 — harden the plan-audit tooling).

For each qid this measures the gap the optimizer's size/row estimates leave
between the plan Catalyst would pick with NO runtime feedback and the plan
AQE finalizes once real shuffle statistics exist:

- ``static_joins``:   join strategies chosen with AQE disabled (pure
  estimate-driven planning — what a 100 TB run would be stuck with if
  adaptive execution were off).
- ``final_joins``:    join strategies in the ``isFinalPlan=true`` adaptive
  plan after execution (actual-bytes-driven).
- ``join_flips``:     strategies AQE changed at runtime — each flip is a
  place the static estimate was wrong enough to matter.
- ``coalesced``:      whether AQEShuffleRead collapsed the static
  ``spark.sql.shuffle.partitions`` fan-out because actual partition bytes
  came in far under the planner's assumption.
- ``est_size_bytes``: the optimized logical plan root's propagated
  sizeInBytes estimate (without CBO this is the raw scan-size product —
  the number static planning actually used).
- ``est_rows`` :      the optimizer's rowCount estimate when one exists
  (None without CBO statistics — recorded so the report is honest about
  WHICH signal static planning had).
- ``actual_rows``:    true result cardinality.
- ``bloom_at_scale``: whether the plan gains a runtime bloom-filter
  ``might_contain`` guard once the fact-side scan crosses the 10 GB
  application-side gate (derived plan-only with the gate dropped; the
  creation-side gate stays at its production default) — i.e. which joins
  get row-level shuffle pruning for free at cluster scale.

Usage: python scripts/audit_estimates.py [sf_dir] [query_id ...]

Streaming ids are excluded (their runners execute multiple internal plans;
the adaptive-final-plan readback below assumes one root query execution).
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

from mini_project_big_data_analysis_spark.queries import all_queries  # noqa: E402
from mini_project_big_data_analysis_spark.session import get_spark  # noqa: E402

#: Default pinned set: the shuffle/join shapes where estimate-vs-actual
#: divergence changes the physical strategy. Deliberately small — this is
#: a plan audit, not a correctness sweep.
DEFAULT_IDS = [
    "join_inner_equi",
    "sql_tpch_q3",
    "sql_tpch_q9",
    "flagship_region_hourly_stats",
    "ext_dedup_exact",
    "agg_group_avg",
    # the ANALYZE/CBO id: the one catalog entry whose static plan HAS a
    # rowCount — the est_rows column's non-None witness (round 15)
    "sql_cbo_broadcast",
]

_JOIN_NODES = re.compile(
    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)\b"
)


def _join_counts(plan: str) -> dict[str, int]:
    # AdaptiveSparkPlan.toString prints the final plan followed by an
    # "== Initial Plan ==" section; count join nodes in the final part only
    # or every node would be double-counted against the static plan.
    plan = plan.split("== Initial Plan ==")[0]
    out: dict[str, int] = {}
    for m in _JOIN_NODES.findall(plan):
        out[m] = out.get(m, 0) + 1
    return out


def audit_one(spark, fn, sf_dir: str) -> dict:
    """Run one query twice — AQE off (static plan string only, NOT executed)
    and AQE on (executed, final adaptive plan read back) — and report the
    estimate/actual gap."""
    # Static pass: what estimates alone would run. Plan string only; the
    # execution below is the AQE pass.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        static_plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    df = fn(spark, sf_dir)
    qe = df._jdf.queryExecution()
    stats = qe.optimizedPlan().stats()
    # py4j hands scala BigInt back as a Python int already
    est_size = int(str(stats.sizeInBytes()))
    est_rows = int(str(stats.rowCount().get())) if stats.rowCount().isDefined() else None
    # collect() executes THIS DataFrame's queryExecution, so the adaptive
    # plan object below carries isFinalPlan=true with runtime stats baked
    # in (a .write/.count would execute a fresh, separate queryExecution).
    actual_rows = len(df.collect())
    final_plan = qe.executedPlan().toString()

    # Forward-looking: would this plan gain runtime bloom-filter row
    # pruning at cluster scale? The rewrite is size-gated to fact scans
    # ≥ 10 GB (applicationSideScanSizeThreshold), which no local fixture
    # crosses — dropping the gate for ONE plan derivation (never executed)
    # shows where `might_contain` guards land once the data is big enough
    # to qualify. The creation-side gate stays at its production default,
    # so "eligible" still requires a genuinely small, filtered build side.
    gate = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    saved_gate = spark.conf.get(gate)
    spark.conf.set(gate, "0")
    try:
        scale_opt = fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    finally:
        spark.conf.set(gate, saved_gate)
    bloom_at_scale = "might_contain" in scale_opt

    static_joins = _join_counts(static_plan)
    final_joins = _join_counts(final_plan)
    return {
        "bloom_at_scale": bloom_at_scale,
        "est_size_bytes": est_size,
        "est_rows": est_rows,
        "actual_rows": actual_rows,
        "static_joins": static_joins,
        "final_joins": final_joins,
        "join_flips": {
            k: final_joins.get(k, 0) - static_joins.get(k, 0)
            for k in set(static_joins) | set(final_joins)
            if final_joins.get(k, 0) != static_joins.get(k, 0)
        },
        "coalesced": "coalesced" in final_plan,
        "final_is_adaptive": "isFinalPlan=true" in final_plan,
    }


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:]) or set(DEFAULT_IDS)
    spark = get_spark(app_name="mpbda-estimate-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    report = {}
    for qid in sorted(only):
        rec = audit_one(spark, registry[qid].fn, sf_dir)
        report[qid] = rec
        flips = rec["join_flips"] or "none"
        print(
            f"# {qid}: est_size={rec['est_size_bytes']:,}B est_rows={rec['est_rows']} "
            f"actual_rows={rec['actual_rows']:,} flips={flips} "
            f"coalesced={rec['coalesced']} bloom_at_scale={rec['bloom_at_scale']}",
            file=sys.stderr,
        )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
