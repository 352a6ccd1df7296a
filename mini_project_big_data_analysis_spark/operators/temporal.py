"""Temporal joins (training-pipeline layer; not in the reference — its only
time handling is per-row offset arithmetic, consumer.py:59-61).

``asof_join_backward`` aligns each left row with the most recent right row at
or before its timestamp — the canonical "enrich events with the latest
snapshot/config/price as of event time" operator. Spark has no ASOF JOIN
builtin (DuckDB/Pandas do), but the semantics decompose into existing
operators with ONE shuffle:

    union(tagged left, tagged right)
      → window last(right_payload, ignorenulls) over
          (partition by key order by (time, side) rows unbounded preceding)
      → filter side = left

Both sides shuffle once on the join key and are sorted within partitions —
the same cost as a sort-merge join, with no range-explosion. A windowed
equi-range join (join on key AND time between t-Δ and t) would multiply rows;
this never does. Skewed keys hurt exactly like any keyed shuffle — salt the
key upstream if one entity dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_vals: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row keeps the ``right_vals`` of the
    latest ``right`` row with the same key and ``right_time <= left_time``
    (NULLs when no such row exists).

    ``right`` must be unique per (key, time) — pre-aggregate it otherwise
    (ties would be broken by sort instability, not semantics). At equal
    timestamps the right row wins (<= semantics): right rows sort before
    left rows at the same instant.
    """
    lstruct = F.struct(*[F.col(c) for c in left.columns])
    rstruct = F.struct(*[F.col(c) for c in right_vals])
    l_tagged = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        lstruct.alias("__l"),
        F.lit(None).cast(right.select(rstruct.alias("__r")).schema["__r"].dataType).alias("__r"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(lstruct.alias("__l")).schema["__l"].dataType).alias("__l"),
        rstruct.alias("__r"),
    )
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).withColumn(
        "__rlast", F.last("__r", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__rlast.{c}").alias(c) for c in right_vals
    ]
    return filled.filter(F.col("__side") == 1).select(*out_cols)


def range_band_join(
    left: DataFrame,
    right: DataFrame,
    left_sec: str,
    right_sec: str,
    band: int,
) -> DataFrame:
    """Pure range join (no equi key): all (left, right) pairs with
    ``|left_sec - right_sec| <= band`` seconds.

    A naive range join is a cross product with a theta filter —
    BroadcastNestedLoopJoin, O(n·m), dead at scale. This is the banded
    (bucketed) form: time is binned at ``band`` width, the right side keeps
    its bin, the left side explodes to its bin ±1, and the join becomes an
    *equi* join on bin id followed by the exact band filter. Every
    qualifying pair differs by at most one bin, and each pair meets exactly
    once (the right row's bin is unique). Cost: one shuffle on the bin key
    and a 3× expansion of the left side — independent of total data size,
    and skew-safe as long as no single band-width slice of time holds more
    rows than an executor handles (AQE skew-split covers the rest).

    Callers must pass distinct column names for ``left_sec``/``right_sec``
    (the join keeps both sides' columns).
    """
    bin_l = F.floor(F.col(left_sec) / band)
    lb = left.withColumn(
        "__band_bin", F.explode(F.array(bin_l - 1, bin_l, bin_l + 1))
    )
    rb = right.withColumn("__band_bin", F.floor(F.col(right_sec) / band))
    return (
        lb.join(rb, on="__band_bin")
        .filter(F.abs(F.col(left_sec) - F.col(right_sec)) <= band)
        .drop("__band_bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    bucket_sec: int,
) -> DataFrame:
    """Interval × interval overlap join: all (left, right) pairs whose
    [start, end] ranges intersect (``l_start <= r_end AND r_start <= l_end``,
    bounds inclusive, in epoch seconds).

    The naive plan is again a theta-only BroadcastNestedLoopJoin. Bucketed
    form: each side explodes to every ``bucket_sec``-wide time bucket its
    interval covers, the join becomes an equi join on bucket id + the exact
    overlap filter, and the pair is emitted ONLY in the bucket containing
    the overlap's start (``floor(max(l_start, r_start) / bucket_sec)``) —
    each qualifying pair meets exactly once, so no distinct/dedup shuffle
    is needed afterwards. Cost: one shuffle on the bucket key; expansion
    factor = interval length / bucket width (pick ``bucket_sec`` near the
    typical interval length; heavily skewed buckets fall to AQE
    skew-split). Column names must not collide across sides.
    """
    ls, le = left_bounds
    rs, re_ = right_bounds

    def spread(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__bk",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bucket_sec), F.floor(F.col(e) / bucket_sec)
                )
            ),
        )

    pairs = spread(left, ls, le).join(spread(right, rs, re_), on="__bk")
    overlap = (F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le))
    once = F.col("__bk") == F.floor(F.greatest(F.col(ls), F.col(rs)) / bucket_sec)
    return pairs.filter(overlap & once).drop("__bk")
