"""Events-table reader: ns-timestamp parquet handling + pushdown-preserving
time-range scans.

The driver's ``events.parquet`` stores ``ts`` as INT64 TIMESTAMP(NANOS),
which Spark's vectorized reader refuses natively (PARQUET_TYPE_ILLEGAL).
We read nanos as long (``spark.sql.legacy.parquet.nanosAsLong``) and
truncate to microseconds with integer ``div`` — the same truncation DuckDB
applies reading ns into its µs TIMESTAMP, so both engines see identical
values.

Pushdown: a predicate on the *converted* timestamp cannot reach the parquet
scan (it sits behind the div expression), so ``load_events`` takes the time
range as an argument and applies it to the raw ns column — comparing a long
against long literals — which pushes down and prunes row groups. At 100 TB,
with ts-sorted/partitioned files, that is the difference between reading a
day and reading a decade.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _ts_ns_literal(ts: str) -> int:
    dt = datetime.fromisoformat(ts).replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000


def load_events(
    spark: SparkSession,
    sf_dir: str,
    ts_between: tuple[str, str] | None = None,
) -> DataFrame:
    """Events with ``ts`` as a proper µs TimestampType.

    ``ts_between=(lo, hi)`` (inclusive, "YYYY-MM-DD HH:MM:SS" UTC) is applied
    to the raw INT64 column so it reaches the parquet scan as a pushed
    filter / row-group prune.
    """
    spark.conf.set(_NANOS_CONF, "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if ts_between is not None:
        lo, hi = ts_between
        # µs-truncated ts ≤ hi  ⟺  ns ts ≤ hi·10⁹ + 999 (whole-second bounds),
        # so the ns-side range is inclusive-equivalent to the µs-side BETWEEN.
        raw = raw.filter(
            F.col("ts").between(
                F.lit(_ts_ns_literal(lo)), F.lit(_ts_ns_literal(hi) + 999)
            )
        )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
