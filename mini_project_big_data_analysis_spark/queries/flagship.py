"""Flagship query (SURVEY.md §7 step 1).

The reference dashboard's core question — "average temperature per island
per time bucket over a date range" (app.py:105-141) — generalized onto the
driver tables: events (≙ observations) enriched through the
customer→nation→region dimension chain (≙ city→island, app.py:15-29),
filtered to a timestamp range (app.py:108-110), aggregated per (region,
hour bucket) with the dashboard's stat set (app.py:116-124), ordered.

Scale shape: nation⋈region broadcast (truly tiny); the customer leg shuffles
(customer grows with the dataset — broadcasting it would OOM at scale; AQE may
still choose broadcast at small SF). The ts-range filter is pushed to the
parquet scan; the final hash aggregate on (region, bucket) is the one
unavoidable shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register

TS_LO = "2024-01-05 00:00:00"
TS_HI = "2024-01-20 00:00:00"


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.events import load_events

    # time-range pushed to the parquet scan on the raw ns column
    events = load_events(spark, sf_dir, ts_between=(TS_LO, TS_HI))
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    # Broadcast only the genuinely tiny dims (nation⋈region: ≤ a few hundred
    # rows at any SF). customer scales with the dataset, so the events⋈dim
    # leg is left to shuffle / AQE — broadcasting a customer-grain relation
    # OOMs executors at 100×.
    nr = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", F.col("r_name").alias("region"))
    dim = customer.join(
        F.broadcast(nr), customer.c_nationkey == nr.n_nationkey
    ).select(F.col("c_custkey").alias("user_id"), "region")

    return (
        events.join(dim, "user_id", "left")
        .withColumn("region", F.coalesce("region", F.lit("OTHER")))
        .groupBy(
            F.col("region"),
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket"
            ),
        )
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            F.round(F.stddev_samp("value"), 6).alias("std_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("region", "bucket")
    )


FLAGSHIP_ORACLE = f"""
SELECT
  coalesce(r.r_name, 'OTHER')                          AS region,
  strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS bucket,
  round(avg(e.value), 6)                               AS avg_value,
  round(min(e.value), 6)                               AS min_value,
  round(max(e.value), 6)                               AS max_value,
  round(stddev_samp(e.value), 6)                       AS std_value,
  count(*)                                             AS n_events
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
LEFT JOIN nation   n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region   r ON n.n_regionkey = r.r_regionkey
WHERE e.ts BETWEEN TIMESTAMP '{TS_LO}' AND TIMESTAMP '{TS_HI}'
GROUP BY 1, 2
ORDER BY 1, 2
"""

register("flagship_region_hourly_stats", FLAGSHIP_ORACLE)(flagship)
