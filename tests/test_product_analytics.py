"""Product-analytics trio (§2.9g): the semantic edges the oracle diff can't
isolate — funnel ORDER sensitivity (a click before the signup must not
convert), cohort-offset arithmetic, and hash-arm stability."""

from __future__ import annotations

import datetime as dt


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, ts, u, t, 1.0, "{}")
            for i, (u, t, ts) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_counts_only_in_order_steps(spark, tmp_path):
    from mini_project_big_data_analysis_spark.queries.ext_product_q import (
        ext_funnel_steps,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: full ordered funnel
        (1, "signup", t0), (1, "click", t0 + s), (1, "purchase", t0 + 2 * s),
        # user 2: click BEFORE signup → signup only
        (2, "click", t0), (2, "signup", t0 + s),
        # user 3: purchase before click (click after signup) → stops at click
        (3, "signup", t0), (3, "purchase", t0 + s), (3, "click", t0 + 2 * s),
        # user 4: never signs up → not even step 1
        (4, "click", t0), (4, "purchase", t0 + s),
    ]
    d = str(tmp_path / "funnel")
    _ev(spark, rows).write.parquet(f"{d}/events.parquet")
    got = {r.step: (r.n_users, r.conv_from_prev) for r in ext_funnel_steps(spark, d).collect()}
    assert got["1_signup"] == (3, 1.0)
    assert got["2_click"] == (2, round(2 / 3, 6))
    assert got["3_purchase"] == (1, 0.5)


def test_retention_offsets(spark, tmp_path):
    from mini_project_big_data_analysis_spark.queries.ext_product_q import (
        ext_retention_cohorts,
    )

    day = lambda n, h=3: dt.datetime(2024, 1, 1 + n, h)  # noqa: E731
    rows = [
        (1, "click", day(0)), (1, "click", day(0, 9)),  # same day: one cell
        (1, "view", day(2)),
        (2, "click", day(1)), (2, "view", day(1)), (2, "click", day(3)),
    ]
    d = str(tmp_path / "ret")
    _ev(spark, rows).write.parquet(f"{d}/events.parquet")
    base = dt.date(2024, 1, 1).toordinal() - dt.date(1970, 1, 1).toordinal()
    got = {
        (r.cohort_day - base, r.day_offset): r.n_users
        for r in ext_retention_cohorts(spark, d).collect()
    }
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1, (1, 2): 1}


def test_ab_arm_assignment_is_stable_under_repartition(spark, sf_dir):
    from mini_project_big_data_analysis_spark.queries import all_queries

    fn = all_queries()["ext_ab_zscore"].fn
    a = {tuple(r) for r in fn(spark, sf_dir).collect()}
    # the hash arm must not depend on physical layout
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = {tuple(r) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
