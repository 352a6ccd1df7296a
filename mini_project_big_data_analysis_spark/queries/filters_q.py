"""Filter / predicate queries (SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register


@register(
    "filt_not_null",
    """
    SELECT event_id, value FROM events WHERE event_id % 5 <> 0
    """,
)
def filt_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness gate (consumer.py:55-57 drop null temp/humidity/ts):
    a NULL is injected for event_id%5==0, then filtered exactly as the
    consumer drops incomplete records."""
    ev = load(spark, sf_dir, "events")
    with_null = ev.select(
        "event_id",
        F.when(F.col("event_id") % 5 != 0, F.col("value")).alias("value"),
    )
    return with_null.filter(F.col("value").isNotNull())


TS_LO = "2024-01-08 00:00:00"
TS_HI = "2024-01-12 00:00:00"


@register(
    "filt_ts_range",
    f"""
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM events
    WHERE ts BETWEEN TIMESTAMP '{TS_LO}' AND TIMESTAMP '{TS_HI}'
    """,
)
def filt_ts_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusive timestamp-range predicate (app.py:108,110) — applied to the
    raw INT64 ns column so it reaches the parquet scan (row-group pruning;
    sources/events.py docstring)."""
    from ..sources.events import load_events

    ev = load_events(spark, sf_dir, ts_between=(TS_LO, TS_HI))
    return ev.select(
        "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str")
    )


@register(
    "filt_isin",
    """
    SELECT event_id, event_type, value FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
)
def filt_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership predicate (app.py:110 pulau.isin(selected)). An IN over a
    literal list compiles to a pushed-down In filter; at scale with a large
    dynamic list this becomes a left-semi join (join_left_semi)."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", "event_type", "value").filter(
        F.col("event_type").isin("click", "purchase")
    )


@register(
    "filt_empty_guard",
    """
    SELECT CASE WHEN count(*) = 0 THEN 'empty' ELSE 'non-empty' END AS status,
           count(*) AS n
    FROM events WHERE value > 1e12
    """,
)
def filt_empty_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-result guard (app.py:102-103,112-113 df.empty branching) —
    genuinely driver-side control flow: isEmpty() short-circuits (reads at
    most one partition) before the branch decides what to compute next."""
    sub = load(spark, sf_dir, "events").filter(F.col("value") > 1e12)
    if sub.isEmpty():
        status, n = "empty", 0
    else:
        status, n = "non-empty", sub.count()
    return spark.createDataFrame([(status, n)], "status string, n long")
