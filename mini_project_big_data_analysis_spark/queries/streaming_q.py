"""Streaming query registrations (SURVEY.md §2.8).

``stream_tumbling_agg`` executes the real Structured Streaming machinery
(file source → watermark → windowed state → memory sink, Trigger.AvailableNow)
— rows-only by the driver contract (DuckDB cannot mirror a stream), but its
batch twin ``agg_time_window`` (aggregates_q.py) IS oracle-checked on the
same data, which pins the window semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .base import register


@register("stream_tumbling_agg", None)  # rows-only: streams have no SQL oracle
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream (the dashboard's
    5-minute recompute loop, app.py:80-84,101, done incrementally).
    Runs to completion with Trigger.AvailableNow and returns the
    materialized memory-sink table."""
    from ..streaming.pipeline import run_tumbling_agg_availablenow

    return run_tumbling_agg_availablenow(spark, sf_dir)


@register(
    "stream_clean_sink",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE value IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
    """,
)
def stream_clean_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumer pipeline end-to-end THROUGH the streaming engine with an
    idempotent foreachBatch parquet sink — and a STRONG oracle: the sink's
    contents must equal the batch-cleaned table exactly (checkpointed
    offsets + per-batch appends ⇒ effectively-exactly-once; a duplicate or
    loss would break the hash)."""
    from ..streaming.pipeline import run_clean_to_parquet_availablenow

    return run_clean_to_parquet_availablenow(spark, sf_dir)


@register("stream_dedup", None)  # rows-only: streams have no SQL oracle
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming deduplication — dropDuplicates over a watermarked
    stream (the exactly-once upgrade of the reference's at-least-once
    consumer, SURVEY.md §2.8 delivery semantics: duplicates from replays
    are eliminated by keyed state instead of reaching the sink)."""
    from ..streaming.pipeline import run_stream_dedup_availablenow

    return run_stream_dedup_availablenow(spark, sf_dir)


@register(
    "stream_stateful_stats",
    """
    SELECT event_type,
           count(value) AS n_events,
           round(sum(value), 6) AS sum_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM events
    WHERE value IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def stream_stateful_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom user-defined stateful operator (applyInPandasWithState):
    per-key running stats carried in explicit keyed state across
    micro-batches. STRONG oracle: the final per-key emission must equal the
    batch global aggregate — wrong state merge, lost batch, or double
    processing all break the hash."""
    from ..streaming.pipeline import run_stateful_running_stats

    return run_stateful_running_stats(spark, sf_dir)
