"""Vector math over array<float|double> columns (similarity-search layer).

All pure Catalyst higher-order functions (``aggregate``/``zip_with``) — the
dot product of two 64-dim arrays is a tight codegen loop on the JVM, no
Python round-trip. Accumulation is in double regardless of input element
type so results are stable and match a double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ with double accumulation."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    """‖a‖₂."""
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe via nullif on zero norms."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def l2_normalize(a: Column | str) -> Column:
    """a / ‖a‖₂ as array<double>; pre-normalizing once turns every cosine in
    a top-k scan into a bare dot product (the 100 TB move: normalize at
    ingestion, not per query).

    Shape note: the reciprocal norm is materialized via ``array_repeat``
    (argument evaluated ONCE per row) and applied with ``zip_with`` — a
    norm expression captured directly inside a ``transform`` lambda would
    re-run the O(dim) fold per element, making this O(dim²) per row (the
    round-6 lambda-capture rule, BASELINE.md). Zero vectors normalize to
    NULL elements via the nullif guard rather than an ANSI divide error."""
    arr = _c(a)
    inv = F.lit(1.0) / F.nullif(norm(arr), F.lit(0.0))
    return F.zip_with(
        arr,
        F.array_repeat(inv, F.size(arr)),
        lambda v, i: v.cast("double") * i,
    )
