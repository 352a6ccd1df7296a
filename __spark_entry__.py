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
    """Driver correctness-coverage rotation for THIS round (round 14).

    The external driver hash-checks exactly the first 50 ids of ``queries()``
    iteration order each round, so with 243 registered ids only a rotating
    window gets hard driver-recorded rows per round. This hook — separate
    from the public ``all_queries()`` registration order, which it does NOT
    affect — declares the round's window explicitly, executing the plan
    pre-written in COVERAGE_ROTATION.md at the end of round 13:

    0. The round-13 debut ``ext_graph_communities`` (the one registered id
       with zero driver rows; standing policy puts debuts at the head).
    1. The round-8 holdover ``window_nth_value`` (displaced from round 13
       by that round's debut — the stalest verified id in the catalog).
    2. The 41 remaining round-9-stale ids, alphabetical.
    3. The alphabetically-first 7 round-10-stale ids
       (``ext_data_quality`` is pushed to round 15 by the debut).

    See COVERAGE_ROTATION.md's round-15 plan for the pre-written next
    window.
    """
    debut = ["ext_graph_communities"]
    round8_holdover = ["window_nth_value"]
    round9_stalest = [
        "ext_semdedup",
        "ext_split_leakage",
        "ext_tfidf_topterms",
        "ext_unigram_logprob",
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
        "join_left_semi",
        "join_outer",
        "limit_head",
        "proj_nested_extract",
        "proj_rename",
        "proj_select_cols",
        "proj_unpivot",
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
    round10_stalest = [
        "agg_cube",
        "agg_quartiles_exact",
        "agg_rollup",
        "agg_session_window",
        "agg_sliding_window",
        "ext_ab_zscore",
        "ext_attribution_lasttouch",
    ]
    return debut + round8_holdover + round9_stalest + round10_stalest


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
