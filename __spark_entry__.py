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
    """Driver correctness-coverage rotation for THIS round (round 7).

    The external driver hash-checks exactly the first 50 ids of ``queries()``
    iteration order each round, so with 236 registered ids only a rotating
    window gets hard driver-recorded rows per round. This hook — separate
    from the public ``all_queries()`` registration order, which it does NOT
    affect — declares the round's window explicitly:

    1. NEVER driver-checked ids first, per the pre-written round-7 plan in
       COVERAGE_ROTATION.md: the 15 round-6 second-batch ids (added after
       the round-6 window filled), ``stream_tumbling_agg`` (upgraded
       rows-only → strong oracle mid-round-6), and 34 of the 52 round-6
       third-batch ids (§2.9i). This includes the three ADVICE-r6-fixed ids
       (``ext_span_dedup``, ``ext_gini_concentration``,
       ``fn_mapinarrow_norms``) so the fixes earn driver rows immediately.
    2. ids whose last driver check FAILED (none — round 6 was 50/50 green).
    3. Stalest re-verification: none this round — the never-checked set
       alone fills all 50 slots.

    The 18 never-checked overflow ids (batches 12–20 of §2.9i, each with
    both an oracle-differential pytest AND a quantitative behavioral pin in
    tests/test_timeseries_round6.py) queue FIRST for round 8, alongside the
    15 round-3-displaced ids; see COVERAGE_ROTATION.md's round-8 plan.
    """
    second_batch = [
        "sql_pivot",
        "sql_lateral_view",
        "setop_intersect_all",
        "ext_ngram_novelty",
        "stream_foreachbatch_upsert",
        "ext_dedup_containment",
        "fn_variant_json",
        "agg_listagg",
        "src_xml_roundtrip",
        "fn_udtf_sentences",
        "ext_multimodal_framesample",
        "ext_multimodal_resize",
        "join_null_safe",
        "agg_filter_clause",
        "window_running_distinct",
    ]
    upgraded = ["stream_tumbling_agg"]
    third_batch = [
        "ext_time_gapfill",
        "ext_ewma_smooth",
        "ext_anomaly_mad",
        "ext_sequence_match",
        "ext_compaction_bins",
        "ext_dq_rules",
        "join_skew_salt",
        "ext_triangle_count",
        "sql_groupby_all",
        "stream_sliding_agg",
        "stream_session_agg",
        "ext_incremental_view",
        "agg_bitmap_distinct",
        "window_topk_per_group",
        "agg_histogram_equiwidth",
        "fn_array_hof",
        "ext_ab_srm_check",
        "ext_skyline_pareto",
        "ext_markov_transitions",
        "ext_burst_detect",
        "ext_autocorr",
        "agg_bool_aggregates",
        "fn_collation_group",
        "fn_mapinarrow_norms",
        "ext_vector_quantize",
        "ext_span_dedup",
        "ext_token_drift",
        "window_rolling_corr",
        "ext_winsorize",
        "ext_ks_test",
        "ext_gini_concentration",
        "agg_mode_deterministic",
        "ext_sample_exact_k",
        "src_footer_stats",
    ]
    return second_batch + upgraded + third_batch


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
