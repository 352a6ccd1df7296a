"""Shared-scan cached dashboard group (SURVEY.md §3.3).

The reference dashboard re-scans the ENTIRE Mongo collection on every
5-minute refresh and every filter change (app.py:101 ``load_data()`` inside
the callback), then fans out six independent pandas aggregations over the
same frame (app.py:116-156). The idiomatic Spark fix promised in SURVEY
§3.3: clean once, ``cache()`` the cleaned frame, and run the whole
aggregate fan-out off the in-memory columnar copy — ONE source scan per
refresh however many charts the dashboard adds.

``agg_cached_dashboard`` is that fix as a registered capability: the six
dashboard aggregates computed off one cached frame and unioned into a
single long-format (metric, key, value) result — the shape a chart layer
consumes. tests/test_plans.py pins the physical plan: every union branch
reads InMemoryTableScan, not a fresh file scan.

Cache lifecycle: Spark's CacheManager keys cached plans by canonicalized
logical plan, so repeated invocations reuse the same entry instead of
accumulating copies; the cache lives for the dashboard session (exactly the
retention the reference's refresh loop needs), sized for executor storage
memory by construction — it is the *cleaned, projected* frame, not the raw
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register

_DASHBOARD_ORACLE = """
    WITH cleaned AS (
        SELECT event_type, value, ts
        FROM events
        WHERE value IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
    )
    SELECT 'global_avg' AS metric, 'all' AS key,
           round(avg(value), 6) AS value FROM cleaned
    UNION ALL
    SELECT 'global_min', 'all', round(min(value), 6) FROM cleaned
    UNION ALL
    SELECT 'global_max', 'all', round(max(value), 6) FROM cleaned
    UNION ALL
    SELECT 'global_stddev', 'all', round(stddev_samp(value), 6) FROM cleaned
    UNION ALL
    SELECT 'type_count', event_type, count(*)::DOUBLE
    FROM cleaned GROUP BY event_type
    UNION ALL
    SELECT 'type_avg', event_type, round(avg(value), 6)
    FROM cleaned GROUP BY event_type
    UNION ALL
    SELECT 'hourly_avg',
           event_type || '|' || strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'),
           round(avg(value), 6)
    FROM cleaned GROUP BY 2, event_type
    UNION ALL
    SELECT 'ts_min_epoch', 'all', floor(epoch(min(ts)))::BIGINT::DOUBLE FROM cleaned
    UNION ALL
    SELECT 'ts_max_epoch', 'all', floor(epoch(max(ts)))::BIGINT::DOUBLE FROM cleaned
    UNION ALL
    SELECT 'type_distinct', 'all', count(DISTINCT event_type)::DOUBLE FROM cleaned
"""


def cached_dashboard_metrics(events: DataFrame) -> DataFrame:
    """The six dashboard aggregates (app.py:116-156) off ONE cached cleaned
    frame, as long-format (metric, key, value) rows.

    The fan-out: global stats (app.py:116-124), per-type frequency table
    (app.py:144-146), per-type mean (app.py:149), per-type hourly series
    (the line charts, app.py:133-141), timestamp bounds (app.py:54-55,156),
    and distinct-type count (app.py:56). Each branch scans the cached
    columnar copy — the source is read once, when the cache populates.
    """
    cleaned = (
        events.select("event_type", "value", "ts")
        .filter(
            F.col("value").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .cache()
    )

    def row(metric: str, key, value) -> DataFrame:
        return cleaned.agg(
            value.alias("value")
        ).select(F.lit(metric).alias("metric"), F.lit(key).alias("key"), "value")

    global_stats = [
        row("global_avg", "all", F.round(F.avg("value"), 6)),
        row("global_min", "all", F.round(F.min("value"), 6)),
        row("global_max", "all", F.round(F.max("value"), 6)),
        row("global_stddev", "all", F.round(F.stddev_samp("value"), 6)),
    ]
    type_count = (
        cleaned.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .select(F.lit("type_count").alias("metric"), F.col("event_type").alias("key"), "value")
    )
    type_avg = (
        cleaned.groupBy("event_type")
        .agg(F.round(F.avg("value"), 6).alias("value"))
        .select(F.lit("type_avg").alias("metric"), F.col("event_type").alias("key"), "value")
    )
    hourly_avg = (
        cleaned.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.round(F.avg("value"), 6).alias("value"))
        .select(
            F.lit("hourly_avg").alias("metric"),
            F.concat_ws(
                "|",
                "event_type",
                F.date_format("hour", "yyyy-MM-dd HH:mm:ss"),
            ).alias("key"),
            "value",
        )
    )
    bounds = [
        row("ts_min_epoch", "all", F.unix_timestamp(F.min("ts")).cast("double")),
        row("ts_max_epoch", "all", F.unix_timestamp(F.max("ts")).cast("double")),
    ]
    type_distinct = row(
        "type_distinct", "all", F.count_distinct("event_type").cast("double")
    )

    out = global_stats[0]
    for part in [*global_stats[1:], type_count, type_avg, hourly_avg, *bounds, type_distinct]:
        out = out.unionByName(part)
    return out


@register("agg_cached_dashboard", _DASHBOARD_ORACLE)
def agg_cached_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dashboard refresh (app.py:87-158) as one shared-scan query group:
    clean → cache → six-aggregate fan-out → long-format union. Replaces the
    reference's full-rescan-per-refresh (app.py:101) with one source scan
    per cache population; see module docstring for the plan guarantee."""
    return cached_dashboard_metrics(load(spark, sf_dir, "events"))
