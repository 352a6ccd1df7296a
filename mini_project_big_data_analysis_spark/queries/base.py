"""Query-catalog registry (SURVEY.md §2).

Each declared query id binds a PySpark implementation (``(spark, sf_dir) →
DataFrame``) to an equivalent DuckDB oracle SQL string. The driver runs both
at sf=0.01 and compares row-count + schema + order-insensitive value hash —
so every implementation here:

- aliases every computed column identically to its oracle SQL;
- rounds floating aggregates to a fixed scale on BOTH sides (float sums
  differ in last ulps across engines; rounding removes the noise while
  keeping ~10 significant digits of check);
- formats timestamps as strings where sub-second precision could differ
  (parquet ns → Spark µs truncation vs DuckDB ns handling);
- orders/limits only with a deterministic total order.

Oracle SQL of None ⇒ the driver applies its weaker rows-only check (used
for streaming and hash-seeded ops whose exact values DuckDB cannot mirror).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    id: str
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def register(query_id: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if query_id in REGISTRY:
            raise ValueError(f"duplicate query id {query_id}")
        REGISTRY[query_id] = Query(query_id, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_table

    return read_table(spark, sf_dir, name)
