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
    """Driver correctness-coverage rotation for THIS round (round 13).

    The external driver hash-checks exactly the first 50 ids of ``queries()``
    iteration order each round, so with 242 registered ids only a rotating
    window gets hard driver-recorded rows per round. This hook — separate
    from the public ``all_queries()`` registration order, which it does NOT
    affect — declares the round's window explicitly, executing the plan
    pre-written in COVERAGE_ROTATION.md at the end of round 12:

    1. The round-12 debut ``ext_graph_bfs_depth`` (never driver-checked;
       standing policy puts debuts at the head).
    2. The 4 rows-only-contract ids' ONE scheduled driver rows>0 slot
       (``agg_quartiles_approx ext_compression_ratio ext_sim_ann
       ext_sim_ivf`` — no oracle by declared contract, quantitative pins
       stay in pytest; after this round they return to never consuming a
       strong-check slot).
    3. The 36 alphabetically-first remaining round-8-stale ids
       (``window_nth_value`` is pushed to round 14 by the debut).
    4. The alphabetically-first 9 round-9-stale ids.

    See COVERAGE_ROTATION.md's round-14 plan for the pre-written next
    window.
    """
    debut = ["ext_graph_bfs_depth"]
    rows_only_slot = [
        "agg_quartiles_approx",
        "ext_compression_ratio",
        "ext_sim_ann",
        "ext_sim_ivf",
    ]
    round8_stalest = [
        "ext_ab_power",
        "ext_basket_lift",
        "ext_benford_audit",
        "ext_changepoint_meanshift",
        "ext_cohort_ltv",
        "ext_dedup_components",
        "ext_dedup_editdist",
        "ext_dedup_exact",
        "ext_dedup_fingerprint",
        "ext_dedup_incremental",
        "ext_dedup_keep_best",
        "ext_dedup_ngram",
        "ext_dedup_simhash",
        "ext_emb_neardup",
        "ext_embed_centroids",
        "ext_graph_degree_dist",
        "ext_lang_confusion",
        "ext_multimodal_chunks",
        "ext_multimodal_features",
        "ext_multimodal_meta",
        "ext_percentile_bands",
        "ext_pipeline_e2e",
        "ext_psi_stability",
        "ext_quality_gate",
        "ext_rank_normalize",
        "ext_sample_pps",
        "ext_seasonality_index",
        "ext_sim_topk",
        "ext_smoothed_rates",
        "ext_user_rfm",
        "ext_vocab_growth",
        "fn_regex_extract",
        "join_bucketed",
        "stream_clean_sink",
        "stream_stateful_stats",
        "stream_weather_pipeline",
    ]
    round9_stalest = [
        "agg_cached_dashboard",
        "agg_udaf_geomean",
        "ext_bm25_search",
        "ext_cdc_merge",
        "ext_dedup_url",
        "ext_doc_chunk",
        "ext_paragraph_dedup",
        "ext_repetition_stats",
        "ext_scd2_dim",
    ]
    return debut + rows_only_slot + round8_stalest + round9_stalest


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
