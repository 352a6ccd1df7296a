"""Semantic-invariant tests for the round-5 corpus-pipeline queries
(queries/ext_corpus_q.py). Oracle equality is covered by the driver and
scripts/check_queries.py; these pin the properties the oracle can't state
(coverage/overlap laws, interval contiguity, idempotence-style counts).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_project_big_data_analysis_spark.queries.ext_corpus_q import (
    _BLOCK,
    _CHUNK,
    _STRIDE,
    ext_dedup_url,
    ext_doc_chunk,
    ext_paragraph_dedup,
    ext_scd2_dim,
    ext_split_leakage,
    ext_unigram_logprob,
)
from mini_project_big_data_analysis_spark.queries.base import load


def test_doc_chunk_coverage_and_overlap(spark, sf_dir):
    chunks = ext_doc_chunk(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: len(r["text"].strip().split())
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        n = docs[doc_id]
        rows.sort(key=lambda r: r["chunk_id"])
        # chunk j spans tokens [j*stride+1, j*stride+chunk]; spans must cover
        # every token and consecutive chunks overlap by chunk - stride
        assert rows[0]["chunk_id"] == 0
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        last = rows[-1]
        assert last["chunk_id"] * _STRIDE + last["n_tok"] == n  # full coverage
        for r in rows[:-1]:
            assert r["n_tok"] == _CHUNK  # only the final chunk may be short
        if len(rows) > 1:
            assert rows[-2]["chunk_id"] * _STRIDE + _CHUNK < n + _STRIDE


def test_paragraph_dedup_counts(spark, sf_dir):
    out = ext_paragraph_dedup(spark, sf_dir)
    agg = out.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_blocks").alias("blocks")
    ).first()
    # kept blocks corpus-wide == distinct block strings corpus-wide
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    n_distinct = (
        docs.select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), ((F.size(toks) - 1) / _BLOCK).cast("long")
                    ),
                    lambda i: F.array_join(F.slice(toks, i * _BLOCK + 1, _BLOCK), " "),
                )
            ).alias("blk")
        )
        .agg(F.countDistinct("blk"))
        .first()[0]
    )
    assert agg["kept"] == n_distinct
    assert agg["kept"] <= agg["blocks"]
    # reconstruction consistency: dedup_text token count == kept * block size
    # except for docs whose (kept) trailing block is short
    row = out.filter(F.col("n_kept") == F.col("n_blocks")).first()
    assert row is not None  # at least one doc is fully unique
    n_tok = len(row["dedup_text"].split())
    assert (row["n_blocks"] - 1) * _BLOCK < n_tok <= row["n_blocks"] * _BLOCK


def test_scd2_intervals_contiguous(spark, sf_dir):
    rows = ext_scd2_dim(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r["valid_from"])
        assert sum(r["is_current"] for r in hist) == 1
        assert hist[-1]["is_current"] and hist[-1]["valid_to"] is None
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to"] == b["valid_from"]  # contiguous, no gaps
            assert a["event_type"] != b["event_type"]  # real state changes


def test_dedup_url_partition(spark, sf_dir):
    out = ext_dedup_url(spark, sf_dir).collect()
    n_docs_total = load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_docs_total
    for r in out:
        u = r["canonical_url"]
        assert u == u.lower()
        assert "?" not in u and "#" not in u and not u.endswith("/")
        assert u.startswith("https://") or u.startswith("http://")


def test_unigram_logprob_bounds(spark, sf_dir):
    out = ext_unigram_logprob(spark, sf_dir)
    n_docs = load(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    bad = out.filter(~F.col("avg_logprob").between(-30.0, 0.0)).count()
    assert bad == 0  # every token occurs ≥1 time → ln(c/N) ∈ (−ln N, 0]


def test_split_leakage_partition(spark, sf_dir):
    rows = {r["split"]: r for r in ext_split_leakage(spark, sf_dir).collect()}
    assert set(rows) == {"train", "val", "test"}
    n_docs_total = load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows.values()) == n_docs_total
    for r in rows.values():
        assert r["n_fingerprints"] <= r["n_docs"]
        assert 0 <= r["n_leaked_docs"] <= r["n_docs"]


def test_cdc_merge_one_row_per_live_key(spark, sf_dir):
    from mini_project_big_data_analysis_spark.queries.ext_corpus_q import ext_cdc_merge

    out = ext_cdc_merge(spark, sf_dir).collect()
    assert len({r["user_id"] for r in out}) == len(out)  # one final state per key
    ev = load(spark, sf_dir, "events")
    n_keys = ev.select("user_id").distinct().count()
    # dropped keys are exactly those whose latest op is the delete marker
    assert len(out) <= n_keys
    assert all(r["last_type"] != "error" for r in out)
    assert all(r["n_changes"] >= 1 for r in out)


def test_bm25_scores_ranked_and_positive(spark, sf_dir):
    from mini_project_big_data_analysis_spark.queries.ext_corpus_q import (
        ext_bm25_search,
    )

    rows = ext_bm25_search(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert all(1 <= r["n_terms_hit"] <= 3 for r in rows)


def test_gap_islands_partition_events_and_respect_gap(spark, sf_dir):
    from mini_project_big_data_analysis_spark.queries.windows_q import (
        window_gap_islands,
    )

    rows = window_gap_islands(spark, sf_dir).collect()
    ev_n = load(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == ev_n  # islands partition the log
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    from datetime import datetime

    fmt = "%Y-%m-%d %H:%M:%S"
    for islands in by_user.values():
        islands.sort(key=lambda r: r["island_id"])
        assert [r["island_id"] for r in islands] == list(range(1, len(islands) + 1))
        for a, b in zip(islands, islands[1:]):
            gap = datetime.strptime(b["island_start"], fmt) - datetime.strptime(
                a["island_end"], fmt
            )
            assert gap.total_seconds() > 86400  # islands split only on real gaps


def test_stream_stream_join_matches_batch_band_join(spark, sf_dir):
    from mini_project_big_data_analysis_spark.queries.streaming_q import (
        stream_stream_join,
    )

    got = {tuple(r) for r in stream_stream_join(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    want = {
        tuple(r)
        for r in c.join(
            p,
            (c.user_id == p.pu)
            & (p.pts >= c.cts)
            & (p.pts <= c.cts + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.unix_timestamp("pts") - F.unix_timestamp("cts")).alias("gap_s"),
        )
        .collect()
    }
    assert got == want  # exactly-once: no dropped or duplicated join rows
