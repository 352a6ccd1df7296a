"""JSON + datetime scalar-function tests, pinning the reference's defensive
semantics (consumer.py:36-45, 55-61) including the ANSI empty-array
regression (ADVICE.md item 2)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mini_project_big_data_analysis_spark.functions import datetime_fns, json_fns
from mini_project_big_data_analysis_spark.schemas import WEATHER_ARRAY


def test_polymorphic_parse_string_malformed_null(spark):
    df = spark.createDataFrame(
        [
            (1, '[{"description": "rain"}]'),
            (2, "not json at all"),
            (3, None),
            (4, "[]"),
        ],
        "id long, weather_raw string",
    )
    out = df.select(
        "id",
        json_fns.parse_polymorphic_array("weather_raw", WEATHER_ARRAY).alias("arr"),
    ).collect()
    by_id = {r.id: r.arr for r in out}
    assert by_id[1][0].description == "rain"
    assert by_id[2] == []  # malformed → empty, not a failed job
    assert by_id[3] == []
    assert by_id[4] == []


def test_first_element_field_empty_and_null_safe(spark):
    # regression: element_at(_, 1) threw under ANSI mode on empty arrays
    df = spark.createDataFrame(
        [(1, [("rain",)]), (2, []), (3, None)],
        "id long, weather array<struct<description:string>>",
    )
    out = {
        r.id: r.d
        for r in df.select(
            "id", json_fns.first_element_field("weather", "description").alias("d")
        ).collect()
    }
    assert out == {1: "rain", 2: "Unknown", 3: "Unknown"}


def test_epoch_offset_format_roundtrip(spark):
    # consumer.py:59-61: epoch → UTC → +offset → "yyyy-MM-dd HH:mm:ss"
    df = spark.createDataFrame([(1_700_000_000, 25_200)], "dt long, timezone long")
    out = df.select(
        datetime_fns.ts_format(
            datetime_fns.ts_add_offset_seconds(
                datetime_fns.epoch_to_ts("dt"), "timezone"
            )
        ).alias("local_time")
    ).collect()[0]
    # 2023-11-14 22:13:20 UTC + 7h = 2023-11-15 05:13:20
    assert out.local_time == "2023-11-15 05:13:20"


def test_ts_parse_inverts_format(spark):
    df = spark.createDataFrame([("2024-03-01 12:34:56",)], "s string")
    out = df.select(
        F.unix_timestamp(datetime_fns.ts_parse("s")).alias("epoch")
    ).collect()[0]
    assert out.epoch == 1709296496


def test_bround_bankers(spark):
    df = spark.createDataFrame([(0.5,), (1.5,), (2.5,), (-0.5,)], "v double")
    out = [r.b for r in df.select(datetime_fns.bround_like_pandas("v", 0).alias("b")).collect()]
    assert out == [0.0, 2.0, 2.0, -0.0]  # round-half-even, like pandas .round()
