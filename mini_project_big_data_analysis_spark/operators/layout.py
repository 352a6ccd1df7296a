"""Storage-layout operators: multi-dimensional clustering for data skipping.

At 100 TB the scan you avoid is worth more than the scan you optimize.
Sorting a table by one key gives parquet row-group min/max pruning on that
key only; interleaving the bits of TWO keys (Morton / Z-order code) and
sorting by the code gives useful min/max locality on *both* — the standard
lakehouse `ZORDER BY` technique (public: Morton 1966; Delta/Iceberg docs).

The code is a pure column expression (a fixed unrolled loop of shift/mask
terms — whole-stage codegen, no UDF), so it costs one projection; the win
comes from ``df.repartitionByRange(code).sortWithinPartitions(code)`` before
the write, which needs one range-exchange — the same price as any global
sort-on-write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(col_a: Column | str, col_b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints: a's bit i
    lands at position 2i, b's at 2i+1. Callers bucket/clamp dimensions into
    the ``bits`` range first (e.g. ``% (1 << bits)``)."""
    # cast to long: shiftleft on an IntegerType column wraps at bit 31
    # (bit 15 of b would contribute -2^31), silently corrupting the code
    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("long")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("long")
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code + F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1)), 2 * i)
        code = code + F.shiftleft(
            F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return code


def zorder_by(df: DataFrame, code: Column, n_files: int = 32) -> DataFrame:
    """Cluster rows for writing: range-partition on the Z-code (balanced
    output files via range exchange), sort within each partition. The
    subsequent ``.write`` produces files whose per-column min/max stats are
    tight on BOTH interleaved dimensions — multi-dim row-group pruning."""
    zc = code.alias("__zorder")
    return (
        df.withColumn("__zorder", zc)
        .repartitionByRange(n_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
    )
