"""Pure-SQL entry point (SURVEY.md §3.4: ``spark.sql(...)`` strings are a
first-class query path). The SAME SQL text runs on Spark (over temp views)
and on DuckDB (over the pre-registered parquet views) — dialect-shared ANSI.

Money arithmetic is done in DECIMAL(18,2): decimal sums are exact and
order-independent, so the cross-engine comparison is bit-stable without any
rounding games (the double-sum boundary-flip problem documented in
windows_q.py cannot occur). Cast to DOUBLE only at the very end for a
stable comparison type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register

_Q1 = """
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("sql_tpch_q1", _Q1)
def sql_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary) executed as a raw SQL string — proves the
    ANSI-SQL entry point end-to-end: same text, both engines, decimal-exact.
    One scan, one hash aggregate; the date predicate pushes to parquet."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q1)


_Q5 = """
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""


@register("sql_tpch_q5", _Q5)
def sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): the 6-way join benchmark query as
    raw SQL. Catalyst broadcasts region/nation, reorders the join chain, and
    pushes both the region-name and date-range predicates to the scans."""
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q5)


# o_shippriority is absent from the driver's orders table; o_orderpriority
# stands in — the plan shape (join + agg + top-k) is the point.
_Q3 = """
SELECT l.l_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
"""


@register("sql_tpch_q3", _Q3)
def sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): segment-filtered 3-way join, grouped
    revenue, total-order top-10. The segment and both date predicates push
    to their scans; the final ORDER BY + LIMIT compiles to
    TakeOrderedAndProject — only 10 rows per partition ever reach the
    driver-side merge. DECIMAL revenue keeps the sort key bit-stable across
    engines (doubles could flip equal-revenue rank order)."""
    for t in ("customer", "orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q3)


_Q6 = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("sql_tpch_q6", _Q6)
def sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): pure scan-filter-aggregate — the
    predicate-pushdown benchmark. All four range predicates reach the
    parquet scan as DataFilters (row-group stats prune whole chunks); what
    survives feeds a single partial+final agg with no grouping key."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q6)


_Q10 = """
SELECT c.c_custkey,
       c.c_name,
       n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("sql_tpch_q10", _Q10)
def sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): who returned the most revenue
    last quarter — 4-way join with BOTH fact-side predicates (date range on
    orders, returnflag on lineitem) pushed to their scans before the join,
    nation broadcast, decimal-stable top-20."""
    for t in ("customer", "orders", "lineitem", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q10)


# Threshold 240 sits between the p90 (180) and p99 (262) of per-order
# quantity sums in the driver's data — a few hundred qualifying orders at
# sf0.01, same selectivity role as the canonical 300.
_Q18 = """
SELECT c.c_name,
       c.c_custkey,
       o.o_orderkey,
       o.o_orderdate,
       o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 240
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register("sql_tpch_q18", _Q18)
def sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): the large group-by + HAVING
    semi-join shape. The IN subquery is itself a full lineitem aggregation;
    Catalyst plans it as an aggregate feeding a LeftSemi hash join against
    the fact join — lineitem is scanned twice but shuffled on the same
    l_orderkey key both times, and only qualifying orders reach the outer
    3-way join's group-by. DECIMAL quantity sums keep the HAVING boundary
    bit-stable across engines; top-100 by unique o_orderkey tiebreak."""
    for t in ("customer", "orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q18)


# The driver's lineitem has no l_receiptdate/l_commitdate, so the canonical
# "received after committed" late predicate is stood in by the row-local
# l_returnflag = 'R' marker — the plan shape (two correlated subqueries on
# the same fact table → semi + anti self-joins) is identical.
_Q21 = """
SELECT s.s_name,
       count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n.n_name = 'NATION_7'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""


@register("sql_tpch_q21", _Q21)
def sql_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept waiting): multi-self-join on lineitem —
    the sole supplier whose items were returned on a finished order while
    every other supplier's items were not. The correlated EXISTS compiles to
    a LeftSemi and the NOT EXISTS to a LeftAnti hash join, both equi-keyed
    on l_orderkey (plan-pinned in tests/test_plans.py: no cartesian /
    nested-loop degeneration); nation is a broadcast filter on the supplier
    side. All three lineitem scans shuffle on the same key."""
    for t in ("supplier", "lineitem", "orders", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q21)


# Dialect split for integer division only: Spark spells it `div`, DuckDB
# spells it `//` — everything else in the recursive text is shared ANSI.
_RCTE_BODY = """
WITH RECURSIVE walk AS (
    SELECT doc_id, 0 AS level FROM documents WHERE doc_id = 0
    UNION ALL
    SELECT d.doc_id, w.level + 1
    FROM documents d
    JOIN walk w ON ((d.doc_id - 1) {intdiv} 2) = w.doc_id
    WHERE d.doc_id > 0
)
SELECT level, count(*)::BIGINT AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM walk GROUP BY level
"""


@register("sql_recursive_cte", _RCTE_BODY.format(intdiv="//"))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new in Spark 4): breadth-first walk of
    the implicit binary-heap hierarchy over doc ids (parent(i) = (i-1) div 2
    — cycle-free, depth ⌈log2 N⌉), counting documents per depth level. The
    iterative-SQL surface (org charts, BOM explosions, graph reachability)
    expressed in the engine's own dialect rather than a hand-rolled driver
    loop.

    Scale shape: each recursion step is one equi join of the frontier
    against the table (Catalyst plans every step; the frontier here grows
    2× per level and terminates at the leaves). DuckDB's independent
    WITH RECURSIVE implementation is the oracle; the only dialect split is
    integer division (`div` vs `//`)."""
    docs = load(spark, sf_dir, "documents")
    docs.select("doc_id").createOrReplaceTempView("documents")
    sql = _RCTE_BODY.format(intdiv="div").replace("::BIGINT", "")
    out = spark.sql(sql)
    from pyspark.sql import functions as F

    return out.select(
        "level",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "min_doc",
        "max_doc",
    )


_SQL_PIVOT_ORACLE = """
SELECT event_type,
       round(avg(CASE WHEN CAST(strftime(ts, '%w') AS INT) = 0 THEN value END), 6) AS d0,
       round(avg(CASE WHEN CAST(strftime(ts, '%w') AS INT) = 1 THEN value END), 6) AS d1,
       round(avg(CASE WHEN CAST(strftime(ts, '%w') AS INT) = 2 THEN value END), 6) AS d2,
       round(avg(CASE WHEN CAST(strftime(ts, '%w') AS INT) = 3 THEN value END), 6) AS d3,
       round(avg(CASE WHEN CAST(strftime(ts, '%w') AS INT) = 4 THEN value END), 6) AS d4,
       round(avg(CASE WHEN CAST(strftime(ts, '%w') AS INT) = 5 THEN value END), 6) AS d5,
       round(avg(CASE WHEN CAST(strftime(ts, '%w') AS INT) = 6 THEN value END), 6) AS d6
FROM events
GROUP BY event_type
"""


@register("sql_pivot", _SQL_PIVOT_ORACLE)
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (the declarative twin of agg_pivot's DataFrame
    ``.pivot()``, app.py:153 pivot_table): event_type × day-of-week mean
    value with the pivot column list stated inline — no distinct-scan
    planning job, exact output column order. Compiles to the same single
    partial→final hash aggregate as the DataFrame form (7 conditional aggs,
    one shuffle on event_type); the oracle states it as conditional
    aggregation, which is also what Catalyst lowers PIVOT to."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    pivoted = spark.sql(
        """
        SELECT * FROM (
            SELECT event_type, dayofweek(ts) - 1 AS dow, value FROM events
        )
        PIVOT (avg(value) FOR dow IN (0, 1, 2, 3, 4, 5, 6))
        """
    )
    return pivoted.select(
        "event_type",
        *[F.round(F.col(f"`{d}`"), 6).alias(f"d{d}") for d in range(7)],
    )


_LATERAL_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), pos AS (
    SELECT doc_id, t[i] AS token, i - 1 AS p
    FROM toks, unnest(generate_series(1, len(t))) u(i)
)
SELECT token,
       count(*)::BIGINT   AS n_occ,
       round(avg(p), 4)   AS avg_pos,
       min(doc_id)        AS first_doc
FROM pos
GROUP BY token
HAVING count(*) >= 50
"""


@register("sql_lateral_view", _LATERAL_ORACLE)
def sql_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode — the SQL table-generating-function surface
    (the declarative twin of DataFrame ``explode``): fan each doc out to
    (position, token) pairs and profile where in documents each frequent
    token tends to sit (avg position — boilerplate headers skew low,
    signature lines skew high). The generator runs inside the scan stage
    (no extra shuffle for the fan-out); the single shuffle is the token
    hash-agg, Zipf skew left to AQE. Oracle unnests with an index to
    mirror positions exactly."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        r"""
        SELECT token,
               count(*)            AS n_occ,
               round(avg(pos), 4)  AS avg_pos,
               min(doc_id)         AS first_doc
        FROM documents
        LATERAL VIEW posexplode(split(trim(text), '\\s+')) t AS pos, token
        GROUP BY token
        HAVING count(*) >= 50
        """
    )


_GBA_ORACLE = """
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_s,
       count(*)::BIGINT AS n,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
"""


@register("sql_groupby_all", _GBA_ORACLE)
def sql_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (ANSI-adopted convenience, in Spark since 3.4): every
    non-aggregate select item becomes a grouping key — the ad-hoc analytics
    dialect surface that kills the duplicate-expression drift between the
    SELECT list and the GROUP BY list. Resolution happens entirely at
    analysis time: the plan is the identical partial→final hash aggregate
    (one shuffle on (type, day)) as the spelled-out form, which is exactly
    how the oracle states it."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day_s,
               count(*) AS n,
               round(sum(value), 6) AS sum_value
        FROM events
        GROUP BY ALL
        """
    )
