"""Pin the make_sf1.py key-family stride convention (VERDICT r11 item 6).

The sf100 per-copy streaming pins (tests/test_sf100_invariants.py::
``_family_stride``) recover base keys as ``key % family_stride``, where
the stride is the next power of ten above the max over EVERY base column
in the key's family. That arithmetic only holds if

(a) the FAMILY grouping in scripts/make_sf1.py keeps cross-table
    references in ONE family — ``user_id`` shares 'cust' with
    ``c_custkey``/``o_custkey``, so an events→customer join still lines
    up inside every shifted copy; and
(b) the stride comes from the family max, not the column-local max —
    ``user_id``'s own max (1499 at sf0.1) would give stride 10⁴, but the
    family stride is 10⁵ (from ``c_custkey``); a column-local stride
    would make ``user_id % stride`` split one clone's users across two
    residue images and silently break every per-copy digest.

A fixture regeneration or FAMILY edit that changed either would break
the sf100 pins' math without failing THEM loudly (the digests would just
mismatch after hours of streaming), so this cheap non-gated test fails
first. No Spark needed — pyarrow over the driver's base fixture.
"""

from __future__ import annotations

import os
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from make_sf1 import FAMILY, KEYS, _stride  # noqa: E402

BASE_DIR = "/root/testdata/sf0.1"

#: The family membership the sf100 streaming pins hardcode in their
#: ``_family_stride`` table_cols arguments — keep in sync BY THIS TEST,
#: not by re-reading the other test module.
PINNED_FAMILIES = {
    "cust": {("customer", "c_custkey"), ("orders", "o_custkey"), ("events", "user_id")},
    "order": {("orders", "o_orderkey"), ("lineitem", "l_orderkey")},
    "supp": {("supplier", "s_suppkey"), ("lineitem", "l_suppkey")},
    "part": {("part", "p_partkey"), ("lineitem", "l_partkey")},
    "event": {("events", "event_id")},
    "doc": {("documents", "doc_id")},
    "vec": {("embeddings", "vec_id")},
}


def _members(fam: str) -> set[tuple[str, str]]:
    return {
        (table, col)
        for table, cols in KEYS.items()
        for col in cols
        if FAMILY[col] == fam
    }


def test_family_grouping_matches_sf100_pins():
    for fam, expected in PINNED_FAMILIES.items():
        assert _members(fam) == expected, (
            f"make_sf1.FAMILY's '{fam}' members changed — update the "
            "sf100 pins' _family_stride table_cols AND this pin together"
        )
    # no stray families beyond the pinned seven
    assert set(FAMILY.values()) == set(PINNED_FAMILIES)


def test_stride_is_next_power_of_ten():
    assert _stride(0) == 10
    assert _stride(9) == 10
    assert _stride(10) == 100
    assert _stride(1499) == 10000
    assert _stride(14999) == 100000
    assert _stride(99999) == 100000
    assert _stride(100000) == 1000000


@pytest.mark.skipif(
    not os.path.isdir(BASE_DIR), reason="driver base fixture not present"
)
def test_base_fixture_family_strides_pinned():
    """The exact stride each family gets on the CURRENT base fixture —
    a regeneration that moved a key range re-strides the derived tiers,
    and every committed sf100 digest expectation goes stale with it."""
    fam_max: dict[str, int] = {}
    for table, cols in KEYS.items():
        for col in cols:
            t = pq.read_table(
                os.path.join(BASE_DIR, f"{table}.parquet"), columns=[col]
            )
            fam = FAMILY[col]
            fam_max[fam] = max(fam_max.get(fam, 0), int(pc.max(t[col]).as_py()))
    strides = {fam: _stride(m) for fam, m in fam_max.items()}
    assert strides == {
        "cust": 100_000,
        "supp": 1_000,
        "part": 100_000,
        "order": 1_000_000,
        "event": 100_000,
        "doc": 10_000,
        "vec": 10_000,
    }
    # the documented trap: user_id's column-local stride is SMALLER than
    # its family stride — anyone "simplifying" _family_stride to one
    # column re-breaks the per-copy digests
    user_max = int(
        pc.max(
            pq.read_table(
                os.path.join(BASE_DIR, "events.parquet"), columns=["user_id"]
            )["user_id"]
        ).as_py()
    )
    assert _stride(user_max) < strides["cust"]
