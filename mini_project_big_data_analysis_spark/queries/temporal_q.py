"""Temporal operators: backward as-of join and per-key rolling aggregates.

Neither exists in the reference (it has no cross-record time logic at all);
both are core capabilities of a time-series / training-data pipeline and both
have exact SQL oracles — DuckDB's native ASOF JOIN for the as-of (an
independent implementation, which is exactly what a differential check
wants), a ROWS-frame window for the rolling mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import load, register

_ASOF_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       o.last_orderkey
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


@register("join_asof", _ASOF_ORACLE)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event annotated with the user's most recent
    order at or before the event time. Orders are pre-deduped to one row per
    (custkey, date) (max orderkey — both engines pin the same tie-break).
    One shuffle on the key; see operators/temporal.py for why this beats a
    range join at scale. Oracle: DuckDB's native ASOF LEFT JOIN."""
    from ..operators.temporal import asof_join_backward

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    joined = asof_join_backward(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_vals=["last_orderkey"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "last_orderkey",
    )


_ROLLING_ORACLE = """
SELECT user_id, event_id,
       round(avg(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
             6) AS roll_avg
FROM events
"""


@register("window_rolling_avg", _ROLLING_ORACLE)
def window_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling mean over the trailing 7 events (ROWS frame, exact
    row-count semantics — order pinned by (ts, event_id)). One shuffle on
    user_id; the frame is computed in a single sorted pass per partition."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("roll_avg"),
    )


_RANGE_BAND_ORACLE = """
SELECT a.event_id AS id_a, b.event_id AS id_b,
       (floor(epoch(b.ts)) - floor(epoch(a.ts)))::BIGINT AS dt_sec
FROM events a, events b
WHERE a.event_id < b.event_id
  AND abs(floor(epoch(a.ts)) - floor(epoch(b.ts))) <= 30
"""


@register("join_range_band", _RANGE_BAND_ORACLE)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): every pair of events within ±30 s of
    each other. Banded execution (operators/temporal.py:range_band_join):
    bin time at band width, explode one side to bin±1, equi-join on bin id,
    exact filter — one shuffle on the bin key, never a cross product. The
    oracle is DuckDB's native inequality join (its IEJoin), an independent
    algorithm — exactly what a differential check wants."""
    from ..operators.temporal import range_band_join

    ev = load(spark, sf_dir, "events").select("event_id", "ts")
    a = ev.select(
        F.col("event_id").alias("id_a"), F.unix_timestamp("ts").alias("sec_a")
    )
    b = ev.select(
        F.col("event_id").alias("id_b"), F.unix_timestamp("ts").alias("sec_b")
    )
    return (
        range_band_join(a, b, "sec_a", "sec_b", band=30)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (F.col("sec_b") - F.col("sec_a")).cast("bigint").alias("dt_sec"),
        )
    )


_OVERLAP_ORACLE = """
WITH a AS (
    SELECT user_id,
           (floor(epoch(ts))::BIGINT // 3600) AS hr,
           min(floor(epoch(ts)))::BIGINT AS a_start,
           max(floor(epoch(ts)))::BIGINT AS a_end
    FROM events GROUP BY user_id, hr
), b AS (
    SELECT event_type,
           (floor(epoch(ts))::BIGINT // 86400) AS day,
           min(floor(epoch(ts)))::BIGINT       AS b_start,
           min(floor(epoch(ts)))::BIGINT + 14400 AS b_end
    FROM events GROUP BY event_type, day
)
SELECT a.user_id, b.event_type,
       count(*)::BIGINT        AS n_windows,
       min(b.day)::BIGINT      AS first_day
FROM a JOIN b ON a.a_start <= b.b_end AND b.b_start <= a.a_end
GROUP BY a.user_id, b.event_type
"""


@register("join_interval_overlap", _OVERLAP_ORACLE)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join, bucketed: per-user hourly activity
    intervals against each event type's first-4-hours-of-the-day window —
    "which users were active while window X was open", the shape behind
    campaign/incident attribution and session-vs-outage analysis.

    The oracle is DuckDB's native inequality join (IEJoin — an independent
    algorithm); the Spark side is
    ``operators.temporal.interval_overlap_join``: both interval sets
    explode to the 4h time buckets they cover, the join runs as an EQUI
    join on bucket id + exact overlap filter, and each pair is emitted
    only in its overlap-start bucket — one shuffle, no cross product, no
    post-hoc distinct. Both input interval sets are themselves one hash
    agg each off the same scan."""
    from ..operators.temporal import interval_overlap_join

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )
    a = ev.groupBy(
        "user_id", F.floor(F.col("sec") / 3600).alias("hr")
    ).agg(F.min("sec").alias("a_start"), F.max("sec").alias("a_end"))
    b = (
        ev.groupBy(
            "event_type", F.floor(F.col("sec") / 86400).alias("day")
        )
        .agg(F.min("sec").alias("b_start"))
        .withColumn("b_end", F.col("b_start") + 14400)
    )
    pairs = interval_overlap_join(
        a, b, ("a_start", "a_end"), ("b_start", "b_end"), bucket_sec=14400
    )
    return pairs.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.min("day").cast("bigint").alias("first_day"),
    )
