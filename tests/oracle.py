"""DuckDB differential-oracle harness mirroring the driver's comparison:
row-count + schema-insensitive value comparison (order-insensitive).

Used by tests and by the interactive dev loop: run the Spark query and the
oracle SQL on the same parquet, canonicalize both (sort columns by name,
round floats, stringify), and diff multisets of rows.
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / ulp noise left after query-side rounding
        return round(v, 9)
    if isinstance(v, (int, str)):
        return v
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    # None-tolerant sort key: Python can't compare None to float/str, so rows
    # equal up to a NULL column would otherwise crash the harness.
    return sorted(
        (tuple(_canon_value(r[i]) for i in order) for r in rows),
        key=lambda row: tuple(
            (v is None, str(type(v)), str(v)) for v in row
        ),
    )


_ARROW_UNSAFE_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "DECIMAL")


def _blunt_key(row: tuple) -> tuple:
    """Sort key that ignores sub-milli float noise so an eps-compare can
    re-align rows whose 6dp rounding flipped direction across engines."""
    return tuple(
        (v is None, str(type(v)), round(v, 3) if isinstance(v, float) else str(v))
        for v in row
    )


def _eps_equal(cs: list[tuple], cd: list[tuple], eps: float) -> bool:
    """Pairwise compare after re-sorting on noise-blunted keys: floats
    match within eps RELATIVE tolerance floored at eps absolute
    (|a-b| <= eps * max(1, |a|, |b|)), everything else exactly. Relative,
    because the knife-edge class spans magnitudes: a 6dp-rounded mean at
    ~50 flips by 1e-6 absolute, while a 5e8-magnitude float sum carries
    ~1e-13 RELATIVE ulp noise that is 7e-5 absolute. Used ONLY as an
    explicit fallback (never by the driver-shaped hash compare) to
    measure whether a hash mismatch is a rounding knife-edge or a
    semantic diff."""
    a = sorted(cs, key=_blunt_key)
    b = sorted(cd, key=_blunt_key)
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                # the max(1, ...) floor keeps small values on an absolute
                # eps; the 1e-12 addend absorbs binary-representation
                # overshoot (float(1e-6) ~ 1.00000000028e-6)
                tol = eps * max(1.0, abs(va), abs(vb)) + 1e-12
                if not (abs(va - vb) <= tol):
                    return False
            elif va != vb:
                return False
    return True


def compare(
    spark_df,
    con: duckdb.DuckDBPyConnection,
    sql: str,
    eps: float | None = None,
) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    # The driver compares via Arrow, where DuckDB HUGEINT/DECIMAL columns
    # surface as decimal128 and hash-mismatch a bit-identical Spark bigint.
    # fetchall() hides that (both become Python int), so gate on the declared
    # DuckDB type: oracles must cast integer sums to BIGINT explicitly.
    widened = [
        (c, str(t))
        for c, t in zip(d_cols, rel.types)
        if any(str(t).startswith(p) for p in _ARROW_UNSAFE_DUCK_TYPES)
    ]
    if widened:
        return False, (
            f"oracle emits arrow-unsafe DuckDB types (cast to BIGINT/DOUBLE): {widened}"
        )
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    if cs != cd:
        if eps is not None and _eps_equal(cs, cd, eps):
            return True, f"ok within eps={eps} ({len(s_rows)} rows)"
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        return False, f"value mismatch; first diffs (spark, duck): {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
