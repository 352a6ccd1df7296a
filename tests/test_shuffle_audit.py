"""Shuffle-plane pins: the bytes each representative operator moves per
scanned row, measured (not argued from plan shape).

scripts/audit_shuffle.py runs each id to a noop sink in a UI-enabled
session and diffs completed-stage metrics from the status REST API. The
100 TB posture of the dedup/text/aggregate tiers is that the shuffle
carries fixed-width digests and partial aggregates — a small CONSTANT
number of bytes per scanned row, independent of document payload size —
so one subprocess audit at sf0.01 pins that constant with ~3× headroom
over the measured value (SCALING.md round-12 section records the
measured full-catalog table and the sf0.01→sf0.1 flatness check).

The audit needs its own UI-enabled JVM (the shared test session has
spark.ui.enabled=false, which is not runtime-mutable), hence the
subprocess.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"

# qid -> max shuffle bytes per scanned input row (≈3× the measured sf0.01
# value, see SCALING.md). A breach means payloads started crossing the
# wire — exactly the regression class that is invisible to row-count
# correctness checks and fatal at 100 TB.
BOUNDS = {
    "ext_dedup_exact": 120.0,  # md5 + ids through one hash-agg
    "ext_dedup_fingerprint": 120.0,
    "ext_dedup_fuzzy": 2000.0,  # banded minhash signatures, rep-collapse
    "ext_dedup_simhash": 800.0,
    "ext_vocab_topk": 15.0,  # partial hash-agg before the one exchange
    "ext_text_stats": 600.0,  # one stats row per doc
    "sql_tpch_q1": 2.0,  # classic map-side combine: 4 groups
    "agg_group_avg": 1.0,
}


@pytest.fixture(scope="module")
def audit_result() -> dict[str, dict[str, int]]:
    proc = subprocess.run(
        [sys.executable, "scripts/audit_shuffle.py", SF_DIR, *sorted(BOUNDS)],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # last stdout line is the JSON record
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_audit_covers_all_pinned_ids(audit_result):
    assert set(audit_result) == set(BOUNDS)
    for qid, rec in audit_result.items():
        assert rec["records"] > 0, f"{qid}: no scanned rows attributed"


def test_shuffle_bytes_per_row_bounds(audit_result):
    breaches = []
    for qid, bound in BOUNDS.items():
        rec = audit_result[qid]
        bpr = rec["shuffle"] / rec["records"]
        if bpr > bound:
            breaches.append(f"{qid}: {bpr:.1f} B/row > {bound}")
    assert not breaches, "; ".join(breaches)


def test_no_spill_at_gate_scale(audit_result):
    spilled = {q: r["spill"] for q, r in audit_result.items() if r["spill"]}
    assert not spilled, f"unexpected spill at sf0.01: {spilled}"
