"""Pins for the differential-compare harness itself (tests/oracle.py).

The exact hash compare is the driver-shaped primary verdict; the opt-in
eps fallback exists only to measure whether a hash mismatch is a 6dp
rounding knife-edge (passes at 1e-6) or a semantic diff (still fails).
These tests are pure-Python — no Spark session.
"""

from __future__ import annotations

from tests.oracle import _eps_equal, canon_rows


def test_canon_rows_sorts_columns_and_rounds():
    got = canon_rows(["b", "a"], [(1.0000000001, "x"), (2.0, "y")])
    # column order becomes (a, b) = ("x", 1.0) after 9dp rounding
    assert got == [("x", 1.0), ("y", 2.0)]


def test_eps_equal_accepts_knife_edge_flips():
    # the sf10 shape: 6dp rounding flipped in opposite directions
    a = [("k1", 53.659063), ("k2", 55.177188)]
    b = [("k1", 53.659062), ("k2", 55.177187)]
    assert _eps_equal(a, b, 1e-6)
    assert not _eps_equal(a, b, 1e-9)


def test_eps_equal_is_relative_at_large_magnitude():
    # join_skew_salt's sf10 shape: 5e8-magnitude float sums whose
    # cross-engine association noise is ~1e-13 relative = 7e-5 absolute
    a = [("click", 499231065.000008)]
    b = [("click", 499231064.999936)]
    assert _eps_equal(a, b, 1e-6)
    assert not _eps_equal(a, b, 1e-16)


def test_eps_equal_realigns_rows_the_exact_sort_misorders():
    # identical multisets up to eps, but the exact sort interleaves them
    # differently because the float is the leading sorted column
    a = [(1.0000004, "x"), (1.0000005, "y")]
    b = [(1.0000005, "x"), (1.0000004, "y")]
    assert _eps_equal(a, b, 1e-6)


def test_eps_equal_rejects_semantic_diffs():
    assert not _eps_equal([("k", 1.0)], [("k", 1.001)], 1e-6)
    # NULL vs value is never absorbed (the rolling-corr oracle-noise case)
    assert not _eps_equal([("k", None)], [("k", 0.978945)], 1e-6)
    # non-float columns stay exact
    assert not _eps_equal([("k1", 1.0)], [("k2", 1.0)], 1e-6)
