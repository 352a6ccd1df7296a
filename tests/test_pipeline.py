"""Training-data pipeline operators (operators/pipeline.py): determinism,
fraction accuracy, and packing invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_project_big_data_analysis_spark.operators import pipeline


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        (F.col("id") % 37 + 1).cast("long").alias("n_tokens"),
    )


def test_hash_split_fractions_and_determinism(spark):
    docs = _docs(spark)
    out = pipeline.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.7 < counts["train"] / 400 < 0.9  # binomial(400, .8) ±5σ
    # determinism + partition-placement independence
    again = pipeline.hash_split(docs.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).isEmpty()


def test_hash_split_incremental_stability(spark):
    """Adding new rows must not move any existing row's assignment."""
    small = pipeline.hash_split(_docs(spark, 200), {"a": 0.5, "b": 0.5})
    big = pipeline.hash_split(_docs(spark, 400), {"a": 0.5, "b": 0.5})
    joined = small.alias("s").join(big.alias("b"), "doc_id").filter(
        F.col("s.split") != F.col("b.split")
    )
    assert joined.isEmpty()


def test_stratified_sample_rates(spark):
    docs = _docs(spark, 600)
    out = pipeline.stratified_sample_hash(
        docs, rates={"en": 0.1}, default_rate=0.9, strata_col="lang", id_col="doc_id"
    )
    n_en = out.filter(F.col("lang") == "en").count()
    n_de = out.filter(F.col("lang") == "de").count()
    assert n_en / 200 < 0.25 and n_de / 400 > 0.75  # 0.1 and 0.9 ±5σ
    assert out.count() == pipeline.stratified_sample_hash(
        docs.repartition(5), rates={"en": 0.1}, default_rate=0.9,
        strata_col="lang", id_col="doc_id",
    ).count()


def test_dataset_mix_provenance_and_weights(spark):
    docs = _docs(spark, 500)
    out = pipeline.dataset_mix(
        [("all", docs, 1.0), ("half", docs, 0.5)], id_col="doc_id", source_col="src"
    )
    counts = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts["all"] == 500  # weight 1.0 keeps everything
    assert 0.35 < counts["half"] / 500 < 0.65


def test_pack_sequences_invariants(spark):
    docs = _docs(spark, 300)
    cap = 64
    out = pipeline.pack_sequences(
        docs, capacity=cap, n_shards=4, token_col="n_tokens", id_col="doc_id"
    ).cache()
    rows = out.collect()
    assert len(rows) == 300  # every doc placed exactly once
    for r in rows:
        assert 0 <= r.pack_offset < cap
        # a doc either fits its pack or is flagged as straddling the cut
        assert (r.pack_offset + r.n_tokens <= cap) == (not r.spans_boundary)
    # contiguity: within a shard (doc_id order) placements tile with no gaps
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        start = by_shard.get(r.shard, 0)
        assert r.pack_id * cap + r.pack_offset == start
        by_shard[r.shard] = start + r.n_tokens
    out.unpersist()


def test_quality_report_null_semantics(spark):
    from mini_project_big_data_analysis_spark.operators import quality as Q

    df = spark.createDataFrame(
        [(1, "ok", "en", 5), (2, None, "en", -1), (3, "  ", None, 7), (4, "ok", "xx", 5)],
        "id long, text string, lang string, n long",
    )
    r = Q.quality_report(
        df,
        {
            "nulls": Q.null_count("text"),
            "blanks": Q.blank_count("text"),
            "dom": Q.domain_violations("lang", ["en"]),
            "rng": Q.range_violations("n", 0, 10),
        },
    ).collect()[0]
    assert r.nulls == 1
    assert r.blanks == 1          # NULL text is not "blank"
    assert r.dom == 2             # 'xx' + the NULL lang
    assert r.rng == 1             # only -1; NULL n would not count


def test_morton_code_reference(spark):
    from mini_project_big_data_analysis_spark.operators.layout import morton_code
    from pyspark.sql import functions as F

    def ref(a, b, bits=16):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    cases = [(0, 0), (1, 0), (0, 1), (65535, 0), (0, 65535), (12345, 54321)]
    df = spark.createDataFrame(cases, "a long, b long")
    got = {(r.a, r.b): r.z for r in df.select("a", "b", morton_code("a", "b").alias("z")).collect()}
    for a, b in cases:
        assert got[(a, b)] == ref(a, b), (a, b)


def test_zorder_write_improves_two_dim_locality(spark, tmp_path):
    """Per-file min/max spans on the SECOND dimension must tighten vs a
    first-dimension sort — the row-group pruning win zordering exists for.
    64×64 grid: sorting by b leaves every file spanning all of a (span 63);
    Z-order files cover compact squares, so per-file a-span shrinks."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from mini_project_big_data_analysis_spark.operators.layout import morton_code, zorder_by

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )

    def mean_a_span(path):
        spans = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.read_metadata(f)
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "a"
                )
                spans.append(col.statistics.max - col.statistics.min)
        return sum(spans) / len(spans)

    p_b, p_z = str(tmp_path / "by_b"), str(tmp_path / "by_z")
    grid.repartitionByRange(16, "b").sortWithinPartitions("b").write.parquet(p_b)
    zorder_by(grid, morton_code("a", "b"), n_files=16).write.parquet(p_z)
    assert mean_a_span(p_b) == 63.0
    assert mean_a_span(p_z) <= 32.0, mean_a_span(p_z)


def test_compact_files_reduces_file_count(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from mini_project_big_data_analysis_spark.sources.writers import compact_files

    frag = str(tmp_path / "frag")
    spark.range(10000).withColumn("v", F.col("id") * 2).repartition(32).write.parquet(frag)
    assert len(glob.glob(frag + "/*.parquet")) == 32
    out = compact_files(spark, frag, target_bytes=64 * 1024 * 1024)
    files = {r[0] for r in out.select(F.input_file_name()).distinct().collect()}
    assert len(files) == 1  # ~80KB of data, one target-size file
    assert out.count() == 10000
    assert out.agg(F.sum("v")).collect()[0][0] == 10000 * 9999
