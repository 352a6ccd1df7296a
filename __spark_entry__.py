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
    """Driver correctness-coverage rotation for THIS round (round 15).

    The external driver hash-checks exactly the first 50 ids of ``queries()``
    iteration order each round, so with 244 registered ids only a rotating
    window gets hard driver-recorded rows per round. This hook — separate
    from the public ``all_queries()`` registration order, which it does NOT
    affect — declares the round's window explicitly, executing the plan
    pre-written in COVERAGE_ROTATION.md at the end of round 14, plus the
    standing debut policy:

    0. The round-15 debut ``sql_cbo_broadcast`` (registered this round,
       zero driver rows; debuts always head the window).
    1. The 43 remaining round-10-stale ids, alphabetical (headed by
       ``ext_data_quality``, displaced from round 14 by that round's
       debut).
    2. The alphabetically-first 6 round-11-stale ids
       (``ext_ab_srm_check`` is pushed to round 16 by the debut).

    See COVERAGE_ROTATION.md's round-16 plan for the pre-written next
    window.
    """
    debut = ["sql_cbo_broadcast"]
    round10_stalest = [
        "ext_data_quality",
        "ext_dataset_mix",
        "ext_decontaminate",
        "ext_dedup_fuzzy",
        "ext_doc_len_histogram",
        "ext_doc_winnow",
        "ext_domain_cap",
        "ext_domain_stats",
        "ext_dup_cluster_stats",
        "ext_entity_match",
        "ext_token_budget_mix",
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
    round11_stalest = [
        "agg_bitmap_distinct",
        "agg_bool_aggregates",
        "agg_filter_clause",
        "agg_histogram_equiwidth",
        "agg_listagg",
        "agg_mode_deterministic",
    ]
    return debut + round10_stalest + round11_stalest


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
