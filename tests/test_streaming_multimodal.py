"""Streaming execution + multimodal plumbing tests."""

from __future__ import annotations

import math

from mini_project_big_data_analysis_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from mini_project_big_data_analysis_spark.sources.writers import json_roundtrip


def test_streaming_tumbling_agg_matches_batch(spark, sf_dir):
    """Batch/stream parity (SURVEY.md §5.2 item 4): the streaming tumbling
    window over the static events table must equal the batch date_trunc agg."""
    import pyspark.sql.functions as F

    from mini_project_big_data_analysis_spark.streaming.pipeline import (
        run_tumbling_agg_availablenow,
    )

    stream_out = run_tumbling_agg_availablenow(spark, sf_dir).collect()

    from mini_project_big_data_analysis_spark.sources.events import load_events

    ev = load_events(spark, sf_dir)
    batch = (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    assert sorted(map(tuple, stream_out)) == sorted(map(tuple, batch))


def test_json_roundtrip_lossless(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, -0.25)], "id long, s string, v double"
    )
    back = json_roundtrip(df, "id BIGINT, s STRING, v DOUBLE")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_extract_features_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd"), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in extract_features(attach_binary_payload(df)).collect()}
    assert out[1].n_bytes == 4
    assert out[1].byte_entropy == 0.0  # single symbol
    assert abs(out[2].byte_entropy - 2.0) < 1e-9  # 4 distinct bytes → log2(4)
    assert out[3].n_bytes == 0 and out[3].byte_entropy == 0.0
    assert out[2].head_hex == "61626364"
    assert math.isfinite(out[2].byte_entropy)


def test_weather_poll_stream_offsets(spark, tmp_path):
    from mini_project_big_data_analysis_spark.sources.weather_source import (
        _observe,
        register_weather_source,
    )

    register_weather_source(spark)
    q = (
        spark.readStream.format("weather_poll")
        .option("max_cycles", 3)
        .load()
        .writeStream.format("memory")
        .queryName("weather_poll_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("weather_poll_test").collect()
    # whole sweeps only: each micro-batch is one 16-city poll cycle
    assert len(rows) >= 16 and len(rows) % 16 == 0
    got = {(r.city, r.cycle): (r.temperature, r.humidity, r.pressure, r.dt) for r in rows}
    city, cycle, temp, hum, pres, dt = _observe(3, 0)
    assert got[(city, cycle)] == (temp, hum, pres, dt)
