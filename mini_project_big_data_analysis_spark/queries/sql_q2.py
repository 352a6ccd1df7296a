"""TPC-H breadth, part 2 (SURVEY.md §2.9d): the remaining 15 of the 22
canonical TPC-H query shapes, adapted to the driver's reduced schema.

The driver's tables omit ``partsupp`` and several canonical columns
(``l_shipmode``, ``l_commitdate``/``l_receiptdate``, ``p_container``,
``c_phone``); where a query depends on one, a documented stand-in keeps the
PLAN SHAPE — the point of each query — intact:

- ``partsupp`` links → ``lineitem`` as the part↔supplier bridge (q2, q11,
  q16, q20);
- "received late" → ``l_returnflag = 'R'`` (q4, q12 — same trick q21 uses);
- ``l_shipmode`` group → ``l_linestatus`` (q12);
- ``p_container`` filter → ``p_size`` bound (q17, q19);
- ``c_phone`` country-code prefix → ``c_nationkey`` (q22); and since every
  driver customer has orders, q22's anti-join excludes customers with
  *urgent* orders rather than any orders (keeps the NOT EXISTS non-empty).

Same dialect-shared ANSI discipline as sql_q.py: one SQL text, both
engines; money math in DECIMAL(18,2) (exact, order-independent) cast to
DOUBLE only at the end; ``year()`` cast to INTEGER (DuckDB's year() is
BIGINT, Spark's is INT — the driver compares Arrow types); conditional
counts via ``count(CASE WHEN ...)`` (DuckDB ``sum(int)`` widens to the
Arrow-unsafe HUGEINT); double-typed thresholds derived as exact-decimal
sums divided by counts so boundary rows cannot flip between engines.

Reference parity: the reference app (app.py:50-84) exposes only pandas
groupby dashboards; this module is part of the engine north star
(SURVEY.md §1) rather than a 1:1 reference feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .base import load, register


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# partsupp stand-in: lineitem links part->supplier; "supply cost" proxy is
# the minimum extended price any regional supplier charged for the part.
_Q2 = """
SELECT DISTINCT
       s.s_acctbal,
       s.s_name,
       n.n_name,
       p.p_partkey,
       p.p_name
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND p.p_size = 15
  AND CAST(l.l_extendedprice AS DECIMAL(18,2)) = (
      SELECT min(CAST(l2.l_extendedprice AS DECIMAL(18,2)))
      FROM lineitem l2
      JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
      WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
"""


@register("sql_tpch_q2", _Q2)
def sql_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): the correlated-scalar-subquery
    benchmark. Catalyst de-correlates the per-part regional min into an
    aggregate joined back on p_partkey — one extra shuffle keyed the same
    as the outer join, never a per-row re-scan. DECIMAL equality keeps the
    min-price match bit-stable; DISTINCT collapses the multiple lineitems
    a (part, supplier) pair ties at."""
    _views(spark, sf_dir, "part", "lineitem", "supplier", "nation", "region")
    return spark.sql(_Q2)


# "Received after committed" stand-in: l_returnflag = 'R' (same as q21).
_Q4 = """
SELECT o.o_orderpriority,
       count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o.o_orderpriority
"""


@register("sql_tpch_q4", _Q4)
def sql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking): EXISTS over the fact table →
    LeftSemi hash join on l_orderkey, so lineitem is never widened into the
    output — the quarter's date predicate pushes to the orders scan and only
    qualifying keys shuffle. count(*) stays BIGINT on both engines."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4)


_Q7 = """
SELECT supp_nation,
       cust_nation,
       l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(l.l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("sql_tpch_q7", _Q7)
def sql_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between two nations per
    ship year. The nation dimension joins twice under different aliases
    (supplier side and customer side) — both broadcast; the symmetric OR
    predicate filters after the broadcasts without blocking pushdown of the
    ship-date range to the fact scan."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    return spark.sql(_Q7)


_Q8 = """
SELECT o_year,
       round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(l.l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume,
           n2.n_name AS nation
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'AMERICA'
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
) all_nations
GROUP BY o_year
"""


@register("sql_tpch_q8", _Q8)
def sql_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): 8-table join where every dimension
    (part, supplier, customer, nation ×2, region) broadcasts and only the
    two facts shuffle. The share is a conditional-sum / total-sum ratio:
    both sums are exact decimals, cast to DOUBLE before the one division so
    the 6-digit round is deterministic across engines."""
    _views(
        spark, sf_dir,
        "part", "lineitem", "supplier", "orders", "customer", "nation", "region",
    )
    return spark.sql(_Q8)


# ps_supplycost stand-in: p_retailprice * l_quantity as the cost leg.
_Q9 = """
SELECT nation,
       o_year,
       CAST(sum(amount) AS DOUBLE) AS sum_profit
FROM (
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(l.l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l.l_discount AS DECIMAL(18,2))
             - CAST(p.p_retailprice AS DECIMAL(18,2))
               * CAST(l.l_quantity AS DECIMAL(18,2)) AS amount
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE 'small%'
) profit
GROUP BY nation, o_year
"""


@register("sql_tpch_q9", _Q9)
def sql_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): LIKE-prefixed part filter feeding a
    two-fact join, profit = revenue minus cost leg, grouped by supplier
    nation × order year. The p_name prefix predicate pushes to the part
    scan and prunes the join's build side; all money legs stay decimal
    until the final cast."""
    _views(spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation")
    return spark.sql(_Q9)


# partsupp value stand-in: shipped quantity × retail price per part from
# one nation's suppliers; HAVING keeps parts above a fraction of the total.
_Q11 = """
SELECT l.l_partkey AS ps_partkey,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))
                * CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_5'
GROUP BY l.l_partkey
HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))
           * CAST(p.p_retailprice AS DECIMAL(18,2))) > (
    SELECT sum(CAST(l2.l_quantity AS DECIMAL(18,2))
               * CAST(p2.p_retailprice AS DECIMAL(18,2))) * 0.001
    FROM lineitem l2
    JOIN part p2     ON p2.p_partkey = l2.l_partkey
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    WHERE n2.n_name = 'NATION_5'
)
"""


@register("sql_tpch_q11", _Q11)
def sql_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): group-by with a HAVING threshold that is
    itself an uncorrelated scalar subquery over the same join — Catalyst
    evaluates the subquery once and broadcasts the scalar into the filter.
    Both sides of the comparison derive from exact decimal sums (the 0.001
    fraction multiplies into DOUBLE identically on both engines)."""
    _views(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    return spark.sql(_Q11)


# l_shipmode stand-in: l_linestatus; late-line stand-in: l_returnflag='R'.
_Q12 = """
SELECT l.l_linestatus,
       count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_returnflag = 'R'
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
"""


@register("sql_tpch_q12", _Q12)
def sql_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-priority split): join + conditional aggregation.
    Both fact-side predicates push to the lineitem scan before the join;
    the priority split uses count(CASE ...) — not sum(int), which DuckDB
    widens to the Arrow-unsafe HUGEINT — so both engines emit BIGINT."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q12)


_Q13 = """
SELECT c_count,
       count(*) AS custdist
FROM (
    SELECT c.c_custkey,
           count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey
     AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@register("sql_tpch_q13", _Q13)
def sql_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): the filtered LEFT
    JOIN shape — the priority predicate lives in the join condition, not
    WHERE, so order-less customers survive as count 0. Two stacked
    aggregations: per-customer counts, then the histogram over counts."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13)


_Q14 = """
SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                   THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                        * CAST(1 - l.l_discount AS DECIMAL(18,2))
                                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE),
             6) AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@register("sql_tpch_q14", _Q14)
def sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): single-month fact filter → broadcast
    part join → one global conditional/total revenue ratio. The month
    predicate prunes lineitem row-groups at the scan; the ratio divides two
    exact decimal sums only after casting to DOUBLE."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q14)


_Q15 = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey,
       s.s_name,
       CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@register("sql_tpch_q15", _Q15)
def sql_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the CTE-referenced-twice shape — the
    quarterly revenue aggregate feeds both the join and the scalar max
    subquery. Decimal equality against the max is exact, so supplier ties
    (the canonical wrinkle) resolve identically on both engines."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q15)


# partsupp stand-in: distinct shipping suppliers per part from lineitem.
_Q16 = """
SELECT p.p_brand,
       p.p_type,
       p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 7, 10, 14, 19, 23, 45)
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("sql_tpch_q16", _Q16)
def sql_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (supplier-part relationship count): negated predicates, an
    IN-list size filter, a NOT IN anti-join against a filtered dimension,
    and count(DISTINCT) per group — the distinct forces a second keyed
    shuffle (expand + two-phase agg in Spark), which is the shape under
    test. NOT IN is safe here because s_suppkey is never NULL."""
    _views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql(_Q16)


# p_container stand-in: p_size bound. Threshold = half the per-part mean
# quantity; quantities are small integers so their double sum is exact and
# the correlated comparison cannot flip between engines.
_Q17 = """
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND p.p_size <= 5
  AND l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey
  )
"""


@register("sql_tpch_q17", _Q17)
def sql_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated scalar AVG over
    the same fact table the outer query scans. Catalyst de-correlates into
    a per-part aggregate joined back on l_partkey — two scans, one shared
    shuffle key, no per-row subquery execution."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17)


# l_shipinstruct/l_shipmode legs dropped (columns absent); the disjunction
# of brand × size-range × quantity-band conjunctions is the tested shape.
_Q19 = """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@register("sql_tpch_q19", _Q19)
def sql_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): OR-of-ANDs across both join sides.
    The optimizer factors the table-local legs of the disjunction out of
    the join predicate (CNF conversion), so the quantity bands reach the
    lineitem scan and the brand/size bands reach the part scan as
    DataFilters — the join itself stays a plain equi hash join."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q19)


# partsupp/availqty stand-in: suppliers who shipped > 50 units of LIKE-named
# parts in the year, expressed as the canonical nested-IN chain.
_Q20 = """
SELECT s.s_name,
       s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_4'
  AND s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
      )
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > 50
  )
ORDER BY s.s_name
"""


@register("sql_tpch_q20", _Q20)
def sql_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): IN nested inside IN — the
    inner part-name filter semi-joins the fact, the grouped HAVING reduces
    it to qualifying suppliers, and the outer IN semi-joins the supplier
    dimension. Both INs compile to LeftSemi hash joins; nothing widens."""
    _views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(_Q20)


# c_phone country code stand-in: c_nationkey. Every driver customer has
# orders, so the anti-join excludes customers with URGENT orders instead.
# The positive-balance mean is computed as exact-decimal sum / count so the
# boundary comparison is bit-identical across engines.
_Q22 = """
SELECT c.c_nationkey AS cntrycode,
       count(*) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c.c_acctbal > (
      SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*)
      FROM customer c2
      WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_nationkey
"""


@register("sql_tpch_q22", _Q22)
def sql_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): scalar-subquery threshold plus
    NOT EXISTS anti-join, then a one-level aggregate. The mean-balance
    scalar evaluates once and broadcasts into the filter; the anti-join
    keys on c_custkey against the pre-filtered urgent orders."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22)
