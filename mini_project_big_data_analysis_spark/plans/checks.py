"""Physical-plan inspection helpers.

Correctness tests say *what* a query returns; these helpers let tests pin
*how* it executes — that filters reached the parquet scan, that small dims
broadcast, that projections pruned columns. At 100 TB those properties are
the difference between minutes and days, so they are asserted, not hoped
(SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a PushedFilters list of the plan."""
    plan = explain_str(df)
    pushed_lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    blob = "\n".join(pushed_lines)
    for frag in fragments:
        assert frag in blob, f"filter {frag!r} not pushed; PushedFilters lines:\n{blob}\n\nplan:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def scan_read_schema(df: DataFrame, table_fragment: str) -> str:
    """Return the ReadSchema line for the scan whose location matches
    ``table_fragment`` — used to assert column pruning."""
    plan = explain_str(df)
    lines = plan.splitlines()
    schema = []
    for i, ln in enumerate(lines):
        if "ReadSchema" in ln:
            window = "\n".join(lines[max(0, i - 8) : i])
            if table_fragment in window or table_fragment in ln:
                schema.append(ln.strip())
    return "\n".join(schema)
