"""AQE estimate-vs-actual pins (VERDICT r13 item 7).

The 100 TB story leans on adaptive execution correcting Catalyst's static
size estimates with real shuffle statistics; these tests pin that the
correction machinery actually fires under this repo's session config —
that runtime actuals, not paper estimates, pick the physical strategy.

The pins:

1. A join whose static estimate forbids broadcast (threshold -1) but whose
   ACTUAL filtered build side is tiny flips SortMergeJoin →
   BroadcastHashJoin in the final adaptive plan — runtime row counts
   overruling the estimate.
2. A low-cardinality aggregate under the suite's static
   ``spark.sql.shuffle.partitions`` fan-out gets its post-shuffle reads
   coalesced (``AQEShuffleRead coalesced``) because actual partition bytes
   undershoot the planner's assumption.
3. ``scripts/audit_estimates.audit_one`` (the reporting tool the round-14
   plan audit uses) returns a coherent record on a catalog query: adaptive
   final plan confirmed, actuals positive, and the estimate column honest
   about CBO absence (``est_rows is None`` on parquet scans without
   ANALYZE).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_project_big_data_analysis_spark.queries.cbo_q import conf_is_set


@pytest.fixture()
def _aqe(spark):
    """Ensure AQE on for the test and restore every touched conf after."""
    touched = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": None,
        "spark.sql.adaptive.autoBroadcastJoinThreshold": None,
        "spark.sql.adaptive.coalescePartitions.enabled": None,
    }
    saved = {}
    for k, v in touched.items():
        # contains() = explicitly set on this session; a bare get() would
        # resolve defaults/fallbacks and the restore would pin them
        saved[k] = spark.conf.get(k) if conf_is_set(spark, k) else None
        if v is not None:
            spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _final_plan(df) -> str:
    qe = df._jdf.queryExecution()
    df.collect()  # executes THIS queryExecution → adaptive plan finalizes
    plan = qe.executedPlan().toString()
    assert "isFinalPlan=true" in plan, "adaptive plan did not finalize"
    return plan


def test_aqe_flips_smj_to_broadcast_when_actuals_undershoot_estimate(_aqe, sf_dir):
    """Static threshold -1 = 'estimates say never broadcast'; the adaptive
    threshold re-admits broadcast on ACTUAL runtime bytes. The filtered
    orders side is a few rows at sf0.01 (estimates can't see that without
    CBO — Filter keeps the child's sizeInBytes), so the final plan must
    carry the BroadcastHashJoin the static plan was forbidden to pick."""
    spark = _aqe
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "16m")

    def build():
        # fresh Dataset per pass: a Dataset's lazy executedPlan freezes
        # under whichever conf is active at FIRST access, so reusing one
        # frame across the AQE-off/AQE-on flip would read a stale plan
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        top = orders.orderBy(F.desc("o_totalprice")).limit(20)
        return lineitem.join(top, lineitem.l_orderkey == top.o_orderkey).select(
            "l_orderkey", "l_extendedprice", "o_totalprice"
        )

    # Static pass under the same confs: the estimate-driven choice.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        static_plan = build()._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "BroadcastHashJoin" not in static_plan, (
        "threshold -1 should forbid estimate-driven broadcast:\n" + static_plan
    )

    plan = _final_plan(build())
    assert "BroadcastHashJoin" in plan, (
        "AQE did not flip the join to broadcast on runtime actuals:\n" + plan
    )


def test_aqe_coalesces_overpartitioned_shuffle(_aqe, sf_dir):
    """A handful-of-groups aggregate under the static 32-partition shuffle
    assumption: actual partition bytes are tiny, so the final plan must
    read the shuffle through a coalesced AQEShuffleRead instead of paying
    32 near-empty reducers — at 100 TB the same mechanism right-sizes
    reducer counts the static conf can't know per-stage."""
    spark = _aqe
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    events = spark.read.parquet(f"{sf_dir}/orders.parquet")
    agg = events.groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("total"))
    plan = _final_plan(agg)
    assert "AQEShuffleRead" in plan and "coalesced" in plan, (
        "post-shuffle reads were not coalesced from runtime stats:\n" + plan
    )


def test_aqe_splits_skewed_join_partitions(_aqe):
    """The third runtime-stats correction AQE owes the 100 TB posture
    (after the broadcast flip and the coalesce): a hash-partitioned join
    whose key distribution concentrates most rows in one reducer must get
    that partition SPLIT across tasks from actual map-output sizes —
    ``SortMergeJoin(skew=true)`` over an ``AQEShuffleRead … skewed``.
    ``session.get_spark`` turns ``skewJoin.enabled`` on; this pins that
    the rule actually fires (thresholds scaled to the 1,000-row fixture —
    the detector compares actual partition bytes against
    max(factor×median, threshold), so production defaults would read this
    tiny fixture as uniform)."""
    spark = _aqe
    saved = {}
    for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ):
        # contains() = explicitly set; None → restore takes the unset path
        # so resolved defaults/fallbacks are never pinned (ADVICE r14 low)
        saved[k] = spark.conf.get(k) if conf_is_set(spark, k) else None
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.shuffle.partitions", "100")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "800"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "800")
        # a quarter of each side's keys collapse onto one value — the
        # shape of a hub key / null-like sentinel in a real join
        d1 = spark.range(0, 1000, 1, 10).select(
            F.when(F.col("id") < 250, F.lit(249))
            .when(F.col("id") >= 750, F.lit(1000))
            .otherwise(F.col("id"))
            .alias("key1"),
            F.col("id").alias("value1"),
        )
        d2 = spark.range(0, 1000, 1, 10).select(
            F.when(F.col("id") < 250, F.lit(249)).otherwise(F.col("id")).alias("key2"),
            F.col("id").alias("value2"),
        )
        j = d1.join(d2, F.col("key1") == F.col("key2")).select("key1", "value2")
        plan = _final_plan(j)
        assert "skew=true" in plan, (
            "AQE did not split the skewed join partition:\n" + plan
        )
        assert "skewed" in plan.split("== Initial Plan ==")[0], plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_side_rows(_aqe, sf_dir):
    """The fourth runtime-stats correction (after the broadcast flip, the
    coalesce, and the skew split): runtime row-level filtering. When a
    shuffle join's build side carries a selective filter, Spark injects a
    ``bloom_filter_agg`` over the build keys and a ``might_contain`` guard
    on the probe side, so fact rows that cannot match die BEFORE the
    shuffle instead of crossing the wire to be dropped by the join — at
    100 TB that is the difference between shuffling the full fact table
    and shuffling the ~matching fraction.

    The feature is size-gated to exactly cluster scale
    (``applicationSideScanSizeThreshold`` = 10 GB by default, so a
    sf0.01 fixture scan never qualifies); the pin first documents that
    gate, then lowers it to simulate the ≥10 GB fact scan and asserts
    (a) the injection appears in the optimized plan, (b) the plan still
    executes to completion adaptively, and (c) the result multiset is
    identical with the rewrite disabled — the filter is a pure pruning
    overlay, never a semantics change."""
    spark = _aqe
    # Save only keys EXPLICITLY set on the session (contains), not values
    # conf.get would resolve from defaults/fallbacks — restoring a resolved
    # default via set() would pin it and silently decouple e.g. the
    # adaptive threshold from its autoBroadcastJoinThreshold fallback for
    # the rest of the shared-session pytest run (ADVICE r14 low).
    saved = {}
    for k in (
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ):
        saved[k] = spark.conf.get(k) if conf_is_set(spark, k) else None

    def build():
        # fresh Dataset per pass (same staleness rule as the flip test)
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
        return lineitem.join(
            urgent, lineitem.l_orderkey == urgent.o_orderkey
        ).select("l_orderkey", "l_quantity", "o_orderpriority")

    try:
        # bloom filters only pay on shuffle joins — with a broadcast join
        # the probe side never shuffles, so force SMJ like a 100 TB × 1 TB
        # join where neither side broadcasts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        assert spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled"
        ) == "true", "runtime bloom filtering should be on in this session"

        # production gate: a fixture-sized fact scan is below the 10 GB
        # application-side threshold, so no injection — the feature is
        # reserved for scans big enough that pruning beats filter cost
        gated = build()._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" not in gated, (
            "bloom injection fired below the 10 GB scan gate:\n" + gated
        )

        # simulate the ≥10 GB fact scan: drop the gate, keep everything else
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold",
            "0",
        )
        injected = build()
        opt = injected._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt and "might_contain" in opt, (
            "runtime bloom filter was not injected:\n" + opt
        )
        plan = _final_plan(injected)
        assert "BroadcastHashJoin" not in plan  # stayed a shuffle join
        with_bloom = sorted(map(tuple, injected.collect()))

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        without = sorted(map(tuple, build().collect()))
        assert with_bloom == without, "bloom pruning changed the result set"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_estimate_audit_report_is_coherent(_aqe, sf_dir):
    """The audit tool's record on a registered catalog query: final plan
    adaptive, actual rows positive, estimate fields present — and honest:
    without CBO/ANALYZE the optimizer has NO rowCount for parquet-scan
    plans (est_rows None), which is exactly why the two pins above insist
    runtime actuals drive the strategy."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    from scripts.audit_estimates import audit_one

    from mini_project_big_data_analysis_spark.queries import all_queries

    rec = audit_one(_aqe, all_queries()["join_inner_equi"].fn, sf_dir)
    assert rec["final_is_adaptive"]
    assert isinstance(rec["bloom_at_scale"], bool)
    assert rec["actual_rows"] > 0
    assert rec["est_size_bytes"] > 0
    assert rec["est_rows"] is None  # no CBO stats on raw parquet reads
    # the registered query broadcasts its dims in BOTH plans (that choice
    # is estimate-visible: the dim scan itself is under the threshold), so
    # the audit must report no strategy flip for it
    assert not rec["join_flips"], rec["join_flips"]


def test_estimate_audit_sees_cbo_rowcount(_aqe, sf_dir):
    """The loop the round-14 audit opened, closed: on the ANALYZE/CBO id
    the same audit record that is honest about est_rows=None on raw
    parquet now carries a real optimizer rowCount — static planning has
    the signal AQE otherwise only learns after a shuffle."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    from scripts.audit_estimates import audit_one

    from mini_project_big_data_analysis_spark.queries import all_queries

    rec = audit_one(_aqe, all_queries()["sql_cbo_broadcast"].fn, sf_dir)
    assert rec["final_is_adaptive"]
    assert rec["actual_rows"] > 0
    assert rec["est_rows"] is not None and rec["est_rows"] > 0
