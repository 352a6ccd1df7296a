"""Data-quality constraint checking: a metrics suite evaluated in ONE pass.

The guard stage of a large-scale ingest pipeline (the reference's analog is
its defensive ``.get(..., default)`` consumer cleansing, consumer.py:32-53 —
here inverted into explicit, measurable constraints). Deequ-style shape:
declare metrics, evaluate them all in a single ``df.agg(...)`` — one scan,
one (partial-aggregated) reduce — never one job per metric, which at 100 TB
is the difference between a guard stage and a second pipeline.

All helpers return plain Columns, so metrics compose with any aggregate and
Catalyst folds the whole suite into one HashAggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_count(col: str) -> Column:
    """Rows where ``col`` IS NULL."""
    return F.sum(F.col(col).isNull().cast("long"))


def blank_count(col: str) -> Column:
    """Rows where ``col`` is empty/whitespace-only (NULL-safe: not counted)."""
    return F.sum((F.trim(F.col(col)) == "").cast("long"))


def domain_violations(col: str, allowed: list[str]) -> Column:
    """Rows whose value falls outside the allowed domain (NULLs count —
    a missing value violates a domain constraint)."""
    return F.sum((~F.col(col).isin(allowed)).cast("long")) + null_count(col)


def range_violations(col: str, lo: float, hi: float) -> Column:
    """Rows with ``col`` outside [lo, hi] (NULLs not counted — pair with
    null_count to police presence separately)."""
    return F.sum((~F.col(col).between(lo, hi)).cast("long"))


def quality_report(df: DataFrame, metrics: dict[str, Column]) -> DataFrame:
    """Evaluate all metrics in one aggregate pass; returns a 1-row frame.

    ``metrics`` values are aggregate Columns (the helpers above, or any
    ``F.*`` aggregate). Single ``df.agg(*)`` ⇒ single scan + map-side
    partial aggregation regardless of how many metrics are declared.
    """
    return df.agg(*[m.alias(name) for name, m in metrics.items()])
