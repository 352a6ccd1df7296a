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
    """Driver correctness-coverage rotation for THIS round (round 9).

    The external driver hash-checks exactly the first 50 ids of ``queries()``
    iteration order each round, so with 241 registered ids only a rotating
    window gets hard driver-recorded rows per round. This hook — separate
    from the public ``all_queries()`` registration order, which it does NOT
    affect — declares the round's window explicitly, executing the plan
    pre-written in COVERAGE_ROTATION.md at the end of round 8. After round 8
    every oracle-bearing id has at least one driver row, so the window is
    now pure stalest-first:

    1. The 32 remaining round-4-stale ids (last driver row round 4 — the
       oldest stale set).
    2. The alphabetically-first 18 round-5-stale ids.

    See COVERAGE_ROTATION.md's round-10 plan for the pre-written next
    window (the remaining 32 round-5 ids + the first 18 round-6 ids).
    """
    round4_stalest = [
        "ext_semdedup",
        "ext_tfidf_topterms",
        "filt_empty_guard",
        "filt_isin",
        "filt_not_null",
        "filt_ts_range",
        "flagship_region_hourly_stats",
        "fn_array_first_field",
        "fn_cast_round",
        "fn_dim_lookup",
        "fn_epoch_to_ts",
        "fn_json_parse_polymorphic",
        "fn_map_wordcounts",
        "fn_string_strip",
        "fn_try_cast",
        "fn_ts_add_offset",
        "fn_ts_format",
        "fn_ts_parse",
        "fn_url_extract",
        "join_broadcast_dim",
        "join_dpp_partitioned",
        "join_inner_equi",
        "join_left_anti",
        "sql_tpch_q10",
        "sql_tpch_q18",
        "sql_tpch_q21",
        "src_text_roundtrip",
        "stream_dedup",
        "stream_fanout_sinks",
        "stream_static_enrich",
        "window_cume_dist",
        "window_range_frame",
    ]
    round5_stalest = [
        "agg_cached_dashboard",
        "agg_udaf_geomean",
        "ext_bm25_search",
        "ext_cdc_merge",
        "ext_dedup_url",
        "ext_doc_chunk",
        "ext_paragraph_dedup",
        "ext_repetition_stats",
        "ext_scd2_dim",
        "ext_split_leakage",
        "ext_unigram_logprob",
        "join_left_semi",
        "join_outer",
        "limit_head",
        "proj_nested_extract",
        "proj_rename",
        "proj_select_cols",
        "proj_unpivot",
    ]
    return round4_stalest + round5_stalest


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
