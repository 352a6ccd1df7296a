"""Tests for window/rollup/chunking/stream-dedup coverage."""

from __future__ import annotations

import pyspark.sql.functions as F

from mini_project_big_data_analysis_spark.operators.multimodal import (
    attach_binary_payload,
    sample_chunks,
)


def test_sample_chunks_bytes_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "a" * 300), (2, "xy"), (3, "")], "doc_id long, text string"
    )
    out = sample_chunks(attach_binary_payload(df), chunk_bytes=256).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [c.chunk_len for c in sorted(by_doc[1], key=lambda c: c.chunk_idx)] == [256, 44]
    assert b"".join(
        bytes(c.chunk) for c in sorted(by_doc[1], key=lambda c: c.chunk_idx)
    ) == b"a" * 300
    assert by_doc[2][0].chunk_len == 2
    assert 3 not in by_doc  # empty payload → no chunks


def test_stream_dedup_drops_duplicate_delivery(spark, sf_dir):
    # Every file is delivered twice inside the pipeline; the sink must equal
    # the single-delivery cleaned table exactly (exactly-once proof).
    from mini_project_big_data_analysis_spark.streaming.pipeline import (
        run_stream_dedup_availablenow,
    )
    from mini_project_big_data_analysis_spark.sources.events import load_events

    streamed = run_stream_dedup_availablenow(spark, sf_dir)
    batch = (
        load_events(spark, sf_dir)
        .filter(
            F.col("value").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("event_id", "user_id", "event_type", "value")
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()


def test_rollup_includes_grand_total(spark, sf_dir):
    from mini_project_big_data_analysis_spark.queries.advanced_q import agg_rollup

    rows = agg_rollup(spark, sf_dir).collect()
    grand = [r for r in rows if r.event_type is None and r.dow is None]
    assert len(grand) == 1
    assert grand[0].n == sum(r.n for r in rows if r.event_type is not None and r.dow is not None)


def test_salted_join_matches_plain_join(spark, sf_dir):
    from mini_project_big_data_analysis_spark.operators.relational import (
        salted_equi_join,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    salted = salted_equi_join(c, n, "c_nationkey", "n_nationkey", salt=4)
    plain = c.join(n, c.c_nationkey == n.n_nationkey)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_lsh_bucketed_corpus_partition_prunes(spark, tmp_path):
    """The ANN scale claim: a corpus written partitioned by lsh_bucket lets a
    single-bucket query prune partitions at the scan."""
    import numpy as np
    import pyspark.sql.functions as F

    from mini_project_big_data_analysis_spark.operators.similarity import (
        add_lsh_bucket,
    )
    from mini_project_big_data_analysis_spark.plans.checks import explain_str

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(8).astype("float32").tolist()) for i in range(200)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "bucketed_corpus")
    add_lsh_bucket(vecs, dim=8, n_planes=3).write.partitionBy("lsh_bucket").parquet(path)

    corpus = spark.read.parquet(path)
    one_bucket = corpus.filter(F.col("lsh_bucket") == 3)
    plan = explain_str(one_bucket)
    assert "PartitionFilters" in plan
    partition_filters = plan.split("PartitionFilters")[1].split("]")[0]
    assert "lsh_bucket" in partition_filters  # pruned at the scan, not after
    n_read = one_bucket.count()
    total = corpus.count()
    assert 0 < n_read < total


def test_range_band_join_edges(spark):
    from mini_project_big_data_analysis_spark.operators.temporal import range_band_join

    a = spark.createDataFrame(
        [(1, 100), (2, 500)], "id_a int, sec_a long"
    )
    b = spark.createDataFrame(
        # 130 = exactly band away from 100 (kept; reached via the bin+1
        # explode leg: bin(100)=3, bin(130)=4), 131 = band+1 (dropped),
        # 159 = out of band for both lefts, 70 = band-distance below 100
        # (kept via the bin-1 leg), 500 = exact match for id_a=2
        [(10, 130), (11, 131), (12, 159), (13, 70), (14, 500)],
        "id_b int, sec_b long",
    )
    got = {
        (r.id_a, r.id_b)
        for r in range_band_join(a, b, "sec_a", "sec_b", band=30).collect()
    }
    assert got == {(1, 10), (1, 13), (2, 14)}
