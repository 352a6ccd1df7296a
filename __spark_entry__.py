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
    """Driver correctness-coverage rotation for THIS round (round 10).

    The external driver hash-checks exactly the first 50 ids of ``queries()``
    iteration order each round, so with 241 registered ids only a rotating
    window gets hard driver-recorded rows per round. This hook — separate
    from the public ``all_queries()`` registration order, which it does NOT
    affect — declares the round's window explicitly, executing the plan
    pre-written in COVERAGE_ROTATION.md at the end of round 9:

    1. The 5 round-9 debuts (registered after the round-9 window executed;
       standing policy puts never-driver-checked ids at the head).
    2. The 32 remaining round-5-stale ids (last driver row round 5 — the
       oldest stale set).
    3. The alphabetically-first 13 round-6-stale ids.

    See COVERAGE_ROTATION.md's round-11 plan for the pre-written next
    window (the 5 displaced round-6 ids + the remaining 32 round-6 ids +
    the first 13 round-7 ids).
    """
    round9_debuts = [
        "ext_attribution_lasttouch",
        "ext_domain_cap",
        "ext_dup_cluster_stats",
        "ext_entity_match",
        "ext_token_budget_mix",
    ]
    round5_stalest = [
        "setop_intersect",
        "setop_union_all",
        "snk_append_write",
        "snk_compact_small_files",
        "snk_json_roundtrip",
        "snk_partitioned_write",
        "snk_time_travel",
        "sort_order_by",
        "sql_tpch_q2",
        "sql_tpch_q4",
        "sql_tpch_q7",
        "sql_tpch_q8",
        "sql_tpch_q9",
        "sql_tpch_q11",
        "sql_tpch_q12",
        "sql_tpch_q13",
        "sql_tpch_q14",
        "sql_tpch_q15",
        "sql_tpch_q16",
        "sql_tpch_q17",
        "sql_tpch_q19",
        "sql_tpch_q20",
        "sql_tpch_q22",
        "src_json_corrupt",
        "src_json_scan",
        "src_orc_roundtrip",
        "src_parquet_scan",
        "src_python_datasource",
        "src_table_scan",
        "stream_multibatch_agg",
        "stream_stream_join",
        "window_gap_islands",
    ]
    round6_stalest = [
        "agg_cube",
        "agg_quartiles_exact",
        "agg_rollup",
        "agg_session_window",
        "agg_sliding_window",
        "ext_ab_zscore",
        "ext_data_quality",
        "ext_dataset_mix",
        "ext_decontaminate",
        "ext_dedup_fuzzy",
        "ext_doc_len_histogram",
        "ext_doc_winnow",
        "ext_domain_stats",
    ]
    return round9_debuts + round5_stalest + round6_stalest


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
