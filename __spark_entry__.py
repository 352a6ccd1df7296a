"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``mini_project_big_data_analysis_spark``; this file
is only the wiring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mini_project_big_data_analysis_spark.queries import all_queries
from mini_project_big_data_analysis_spark.queries.flagship import flagship
from mini_project_big_data_analysis_spark.session import configure_existing

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_existing(spark)
    return flagship(spark, SMOKE_SF_DIR)


def coverage_rotation() -> list[str]:
    """Driver correctness-coverage rotation for THIS round (round 16).

    The external driver hash-checks exactly the first 50 ids of ``queries()``
    iteration order each round, so with 244+ registered ids only a rotating
    window gets hard driver-recorded rows per round. This hook — separate
    from the public ``all_queries()`` registration order, which it does NOT
    affect — declares the round's window explicitly, executing the plan
    pre-written in COVERAGE_ROTATION.md at the end of round 15, plus the
    standing debut policy (any id registered this round, never
    driver-checked, heads the window and pushes the tail into round 17):

    0. The round-16 debut ``stream_tws_dedup`` (the
       transformWithStateInPandas dedup, registered this round after the
       protobuf mini runtime un-gated the API; zero driver rows).
    1. The 44 remaining round-11-stale ids, alphabetical (headed by
       ``ext_ab_srm_check``, displaced from round 15 by that round's
       ``sql_cbo_broadcast`` debut).
    2. The alphabetically-first round-12-stale ids to fill to 50
       (``agg_group_avg`` is pushed to round 17 by the debut).

    See COVERAGE_ROTATION.md's round-17 plan for the pre-written next
    window.
    """
    registry_ids = set(all_queries())
    debut = [qid for qid in ("stream_tws_dedup",) if qid in registry_ids]
    round11_stalest = [
        "ext_ab_srm_check",
        "ext_anomaly_mad",
        "ext_autocorr",
        "ext_burst_detect",
        "ext_compaction_bins",
        "ext_dedup_containment",
        "ext_dq_rules",
        "ext_funnel_steps",
        "ext_heavy_hitters",
        "ext_json_props",
        "ext_lang_quality",
        "ext_link_pagerank",
        "ext_multimodal_phash_dedup",
        "ext_perplexity_buckets",
        "ext_pii_scrub",
        "ext_pmi_collocations",
        "ext_retention_cohorts",
        "ext_sample_stratified",
        "ext_split_hash",
        "ext_text_stats",
        "ext_token_pack",
        "ext_token_regex_count",
        "ext_vocab_topk",
        "ext_zorder_cluster",
        "join_asof",
        "join_interval_overlap",
        "join_range_band",
        "join_salted_skew",
        "setop_except",
        "snk_upsert_write",
        "sql_recursive_cte",
        "sql_tpch_q1",
        "sql_tpch_q3",
        "sql_tpch_q5",
        "sql_tpch_q6",
        "src_csv_roundtrip",
        "src_jdbc_scan",
        "src_kafka_segment",
        "src_schema_evolution",
        "stream_late_filter",
        "window_lag_delta",
        "window_latest_per_key",
        "window_ntile",
        "window_rolling_avg",
    ]
    round12_stalest = [
        "agg_corr_stats",
        "agg_count",
        "agg_describe",
        "agg_distinct_sorted",
        "agg_global_stats",
        "agg_group_avg",
    ]
    window = debut + round11_stalest + round12_stalest
    return window[:50]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Iteration order = ``coverage_rotation()`` ids first (the round's driver
    correctness window, see that hook's docstring), then every remaining
    registered id in public registration order.
    """

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    registry = all_queries()
    ordered = {qid: registry[qid] for qid in coverage_rotation() if qid in registry}
    for qid, q in registry.items():
        ordered.setdefault(qid, q)
    return {qid: wrap(q.fn) for qid, q in ordered.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query id; ids absent here are rows-only."""
    return {qid: q.oracle for qid, q in all_queries().items() if q.oracle is not None}
