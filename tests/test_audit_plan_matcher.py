"""Unit pins for scripts/audit_plans.py's plan-tree matcher (ADVICE r8):
the substring matcher it replaced false-flagged SortMergeJoin/SortAggregate
('Sort' substring) and false-passed consumers more than two lines above an
Exchange SinglePartition. Pure string-level tests — no Spark session."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "audit_plans", Path(__file__).resolve().parent.parent / "scripts" / "audit_plans.py"
)
_mod = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("audit_plans", _mod)
_spec.loader.exec_module(_mod)


def _flag(tree: list[str]) -> bool:
    for i, line in enumerate(tree):
        if "Exchange SinglePartition" in line:
            parent = _mod._parent(tree, i)
            if parent is not None and _mod._BAD_CONSUMER.match(_mod._opname(parent)):
                return True
    return False


def test_sort_above_single_partition_is_flagged():
    assert _flag(
        [
            "Sort [x ASC NULLS FIRST], true, 0",
            "+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]",
            "   +- Scan parquet [x]",
        ]
    )


def test_codegen_star_and_window_are_flagged():
    assert _flag(
        [
            "*(3) Window [row_number() ...], [x ASC]",
            "+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]",
            "   +- *(2) Project [x]",
        ]
    )
    assert _flag(
        [
            "WindowGroupLimit [x], rank(), 3",
            "+- Exchange SinglePartition, REQUIRED_BY_STATEFUL_OPERATOR",
            "   +- Scan parquet []",
        ]
    )


def test_sort_merge_join_and_sort_aggregate_are_not_flagged():
    # 'Sort' as a substring of a different operator must NOT flag — the
    # pre-fix matcher false-flagged exactly these.
    assert not _flag(
        [
            "SortMergeJoin [a], [b], Inner",
            ":- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=2]",
            "+- Sort [b ASC], false, 0",
        ]
    )
    assert not _flag(
        [
            "SortAggregate(key=[k], functions=[collect_list(v)])",
            "+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=4]",
            "   +- Scan parquet [k, v]",
        ]
    )


def test_parent_found_across_intervening_sibling_subtree():
    # The true consumer is 4 lines above the Exchange, separated by a
    # sibling branch — the pre-fix 2-line lookback missed this shape.
    tree = [
        "Sort [x ASC], true, 0",
        "+- Union",
        "   :- Project [x]",
        "   :  +- Scan parquet [x]",
        "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=7]",
        "      +- Scan parquet [x]",
    ]
    # parent of the Exchange is Union (not flagged), but parent of Union is
    # the Sort — the walk must stop at the DIRECT parent only.
    assert not _flag(tree)
    tree2 = [
        "HashAggregate(keys=[], functions=[count(1)])",
        "+- Sort [x ASC], true, 0",
        "   +- Project [x]",  # direct child of Sort? no — sibling-level noise
        "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=8]",
        "      +- Scan parquet [x]",
    ]
    assert _flag(tree2), "Sort is the nearest shallower line — must flag"


def test_scalar_aggregate_over_single_partition_is_allowed():
    # The legitimate shape: a global aggregate's final exchange.
    assert not _flag(
        [
            "*(2) HashAggregate(keys=[], functions=[sum(v)])",
            "+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=3]",
            "   +- *(1) HashAggregate(keys=[], functions=[partial_sum(v)])",
        ]
    )
