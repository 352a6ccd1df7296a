"""Advanced relational coverage beyond the reference's surface: window
functions, grouping-set rollups, exact quantiles — the OLAP capabilities a
user migrating from the reference's pandas dashboard would reach for next.

ts-ordering note: events.ts is ns on disk, µs in Spark (sources/events.py).
Window ORDER BY therefore uses date_trunc('microseconds', ts) on the DuckDB
side so sub-µs differences can't produce different-but-both-valid rankings;
event_id breaks remaining ties in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import load, register


@register(
    "agg_rollup",
    """
    SELECT event_type,
           CAST(strftime(ts, '%w') AS INT) AS dow,
           count(*) AS n,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY ROLLUP(event_type, CAST(strftime(ts, '%w') AS INT))
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals (event_type → day-of-week → grand total) in one
    pass — ROLLUP grouping sets, the scalable form of the dashboard's
    nested-subtotal views."""
    ev = load(spark, sf_dir, "events").withColumn("dow", F.dayofweek("ts") - 1)
    return ev.rollup("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value")
    )


@register(
    "agg_cube",
    """
    SELECT event_type,
           CAST(strftime(ts, '%w') AS INT) AS dow,
           count(*) AS n
    FROM events
    GROUP BY CUBE(event_type, CAST(strftime(ts, '%w') AS INT))
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-set combinations (type×dow, type, dow, total) in one
    pass — CUBE; like rollup, a single Expand + hash aggregate, not four
    scans."""
    ev = load(spark, sf_dir, "events").withColumn("dow", F.dayofweek("ts") - 1)
    return ev.cube("event_type", "dow").agg(F.count(F.lit(1)).alias("n"))


@register(
    "window_latest_per_key",
    """
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY date_trunc('microseconds', ts) DESC,
                                         event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user (the dashboard's "last update" per entity,
    app.py:156, generalized): row_number window, deterministic tiebreak.
    Shuffles once on user_id — the partition key IS the window key."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        )
    )


@register(
    "window_lag_delta",
    """
    SELECT event_id,
           round(value - lag(value) OVER (PARTITION BY user_id
                                          ORDER BY date_trunc('microseconds', ts),
                                                   event_id), 6) AS delta
    FROM events
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value delta vs previous event (lag) — NULL on each user's
    first event."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    )


@register(
    "agg_quartiles_exact",
    """
    SELECT round(q[1], 6) AS q25, round(q[2], 6) AS q50, round(q[3], 6) AS q75
    FROM (SELECT quantile_cont(value, [0.25, 0.5, 0.75]) AS q FROM events)
    """,
)
def agg_quartiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation quartiles (pandas describe() semantics,
    analysis.ipynb:cell2:2). Exact percentile needs a per-group sort — fine
    here; the 100 TB path is agg_quartiles_approx's sketch."""
    ev = load(spark, sf_dir, "events")
    q = F.percentile("value", F.lit([0.25, 0.5, 0.75]))
    return ev.agg(
        F.round(q[0], 6).alias("q25"),
        F.round(q[1], 6).alias("q50"),
        F.round(q[2], 6).alias("q75"),
    )


@register("agg_quartiles_approx", None)  # rows-only: sketch ≠ exact by design
def agg_quartiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quartiles via percentile_approx (KLL-style sketch): the
    mergeable, single-pass form that replaces the exact sort at 100 TB."""
    from ..operators.relational import approx_quartiles

    return approx_quartiles(load(spark, sf_dir, "events"), "value")


@register(
    "fn_regex_extract",
    r"""
    SELECT doc_id,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           len(regexp_extract_all(text, '[0-9]+'))  AS n_numbers
    FROM documents
    """,
)
def fn_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex field extraction + match counting — codegen'd JVM regex, the
    text-wrangling primitive the reference does in Python per-row."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.regexp_count("text", F.lit(r"[0-9]+")).alias("n_numbers"),
    )


_GSETS_SQL = """
SELECT event_type,
       user_mod,
       grouping(event_type) AS g_type,
       grouping(user_mod)   AS g_user,
       count(*)             AS n,
       round(avg(value), 6) AS avg_value
FROM events_gs
GROUP BY GROUPING SETS ((event_type), (user_mod), ())
"""


@register(
    "agg_grouping_sets",
    """
    SELECT event_type,
           user_mod,
           grouping(event_type) AS g_type,
           grouping(user_mod)   AS g_user,
           count(*)             AS n,
           round(avg(value), 6) AS avg_value
    FROM (SELECT event_type, user_id % 10 AS user_mod, value FROM events) events_gs
    GROUP BY GROUPING SETS ((event_type), (user_mod), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — arbitrary (non-hierarchical) grouping
    combinations in ONE Expand + hash-aggregate pass instead of N scans,
    with grouping() flags disambiguating which set produced each row (the
    NULL-vs-aggregated distinction CUBE/ROLLUP consumers need). Completes
    the grouping-sets family next to agg_rollup/agg_cube."""
    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", (F.col("user_id") % 10).alias("user_mod"), "value")
    )
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(_GSETS_SQL)


_SKYLINE_ORACLE = """
WITH cust AS (
    SELECT o_custkey,
           round(sum(o_totalprice), 6) AS spend,
           count(*)::BIGINT AS n_orders
    FROM orders GROUP BY o_custkey
), ranked AS (
    SELECT o_custkey, spend, n_orders,
           max(n_orders) OVER (
               ORDER BY spend DESC, n_orders DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_n
    FROM cust
)
SELECT o_custkey, spend, n_orders
FROM ranked
WHERE best_n IS NULL OR n_orders > best_n
"""


@register("ext_skyline_pareto", _SKYLINE_ORACLE)
def ext_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of customers over (total spend, order
    count): keep each customer no other strictly beats on one dimension
    while matching the other — the multi-criteria 'best customers' query.

    The naive spelling is the O(n²) dominance anti-join; for two dimensions
    the classic sort-filter algorithm replaces it with a sort by the first
    dimension and a running-max filter on the second. An UNPARTITIONED
    window would drag every row to one task, so this runs the distributive
    two-phase form: phase 1 computes a LOCAL skyline inside each of 16
    hash buckets (partitioned window — parallel, and the running-max
    filter discards almost everything), phase 2 re-runs the same
    sort-filter globally over only the surviving candidates (≤ per-bucket
    frontier sizes, tiny). Correct because skyline(S) = skyline(∪ local
    skylines) — dominance is transitive, so a row dominated globally is
    dominated by some local survivor. Ties on both dimensions canonicalize
    to the first customer key, identically in both engines (the strict >
    sees the earlier twin as already-seen max). Spend is rounded BEFORE
    ranking so both engines sort the identical doubles; the oracle states
    the single-pass form, which the two-phase plan must reproduce
    exactly."""
    orders = load(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 6).alias("spend"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    order_cols = [
        F.col("spend").desc(),
        F.col("n_orders").desc(),
        F.col("o_custkey"),
    ]

    def sort_filter(df: DataFrame, w: Window) -> DataFrame:
        ranked = df.withColumn(
            "best_n", F.max("n_orders").over(w.rowsBetween(Window.unboundedPreceding, -1))
        )
        return ranked.filter(
            F.col("best_n").isNull() | (F.col("n_orders") > F.col("best_n"))
        ).drop("best_n")

    local = sort_filter(
        cust.withColumn("bucket", F.pmod(F.hash("o_custkey"), F.lit(16))),
        Window.partitionBy("bucket").orderBy(*order_cols),
    ).drop("bucket")
    return sort_filter(local, Window.orderBy(*order_cols)).select(
        "o_custkey", "spend", "n_orders"
    )
