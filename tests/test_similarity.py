"""Similarity-search tests: exact top-k against a numpy oracle, LSH bucket
determinism, near-dup blocking."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from mini_project_big_data_analysis_spark.functions import vector_fns
from mini_project_big_data_analysis_spark.operators import similarity


def _vectors(spark, n=30, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype("float32")
    rows = [(i, vecs[i].tolist(), int(i % 3)) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int"),
        vecs,
    )


def test_vector_fns_against_numpy(spark):
    df, vecs = _vectors(spark, n=2)
    a, b = vecs[0].astype("float64"), vecs[1].astype("float64")
    row = (
        df.groupBy()
        .pivot("vec_id", [0, 1])
        .agg(F.first("embedding"))
        .select(
            vector_fns.dot(F.col("0"), F.col("1")).alias("dot"),
            vector_fns.cosine(F.col("0"), F.col("1")).alias("cos"),
        )
        .collect()[0]
    )
    assert abs(row.dot - float(a @ b)) < 1e-6
    expected_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(row.cos - expected_cos) < 1e-6


def test_cosine_topk_matches_numpy(spark):
    df, vecs = _vectors(spark)
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.cosine_topk(
        df, queries, k=5, exclude_self=True
    ).collect()
    v64 = vecs.astype("float64")
    norms = np.linalg.norm(v64, axis=1)
    for qid in (0, 1):
        sims = (v64 @ v64[qid]) / (norms * norms[qid])
        sims[qid] = -np.inf  # excluded self
        expect = list(np.argsort(-np.round(sims, 6), kind="stable")[:5])
        got = [r.vec_id for r in sorted(out, key=lambda r: r.rank) if r.query_id == qid]
        assert got == [int(i) for i in expect]


def test_lsh_bucket_deterministic_and_ann_subset(spark):
    df, _ = _vectors(spark)
    b1 = similarity.add_lsh_bucket(df, dim=8, n_planes=4).select("vec_id", "lsh_bucket")
    b2 = similarity.add_lsh_bucket(df, dim=8, n_planes=4).select("vec_id", "lsh_bucket")
    assert sorted(map(tuple, b1.collect())) == sorted(map(tuple, b2.collect()))
    buckets = {r.lsh_bucket for r in b1.collect()}
    assert all(0 <= b < 16 for b in buckets)

    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann = similarity.lsh_bucketed_topk(df, queries, dim=8, k=5, n_planes=4).collect()
    exact = similarity.cosine_topk(df, queries, k=30, exclude_self=True).collect()
    exact_sims = {(r.query_id, r.vec_id): r.cosine_sim for r in exact}
    # ANN results are true cosines of same-bucket candidates (recall < 1 ok)
    for r in ann:
        assert abs(exact_sims[(r.query_id, r.vec_id)] - r.cosine_sim) < 1e-9


def test_embedding_near_dup_within_blocks(spark):
    df, vecs = _vectors(spark)
    planted = spark.createDataFrame(
        [(100, vecs[0].tolist(), 0), (101, (vecs[0] * 2.0).tolist(), 0)],
        "vec_id long, embedding array<float>, label int",
    )
    pairs = similarity.embedding_near_dup_pairs(
        df.unionByName(planted), threshold=0.999, block_col="label"
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 100) in found and (0, 101) in found and (100, 101) in found
    # blocking respected: all pairs share a label (0 mod 3 == 100-group)
    assert all(a % 3 == 0 or a >= 100 for a, _ in found)


def test_ivf_topk_recall_and_exactness(spark):
    df, vecs = _vectors(spark, n=60)
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann = similarity.ivf_topk(
        df, queries, k=5, n_centroids=8, n_probe=3
    ).collect()
    exact = similarity.cosine_topk(df, queries, k=60, exclude_self=True).collect()
    exact_sims = {(r.query_id, r.vec_id): r.cosine_sim for r in exact}
    # every IVF hit carries the TRUE cosine (approximation is in candidate
    # generation only, never in the score)
    for r in ann:
        assert abs(exact_sims[(r.query_id, r.vec_id)] - r.cosine_sim) < 1e-9
    # deterministic centroids => stable recall; pin it
    top5 = {}
    for r in sorted(exact, key=lambda r: r.rank):
        top5.setdefault(r.query_id, []).append(r.vec_id)
    hits = total = 0
    for qid in (0, 1, 2):
        truth = set(top5[qid][:5])
        got = {r.vec_id for r in ann if r.query_id == qid}
        hits += len(truth & got)
        total += 5
    recall = hits / total
    assert recall >= 0.5, f"IVF recall {recall} collapsed"
    # probing 3/8 cells must not degenerate to a full scan: candidates seen
    # per query are bounded well below the corpus
    per_q = {qid: len([r for r in ann if r.query_id == qid]) for qid in (0, 1, 2)}
    assert all(v <= 5 for v in per_q.values())


def test_semantic_dedup_clustered_drops_planted_duplicates(spark):
    df, vecs = _vectors(spark, n=40)
    # plant two near-copies of vector 0 (scaled => cosine 1.0 with it)
    planted = spark.createDataFrame(
        [(200, (vecs[0] * 2.0).tolist(), 0), (201, (vecs[0] * 0.5).tolist(), 0)],
        "vec_id long, embedding array<float>, label int",
    )
    out = similarity.semantic_dedup(
        df.unionByName(planted), threshold=0.999, block_col=None, n_clusters=4
    )
    kept = {r.vec_id for r in out.select("vec_id").collect()}
    # the min-id representative (0) survives; the planted copies are dropped
    assert 0 in kept and 200 not in kept and 201 not in kept
    # nothing else shares cosine >= 0.999 in a random set: all others kept
    assert kept == set(range(40))


def test_near_dup_block_cap_matches_uncapped(spark):
    # ONE giant block (every row label 0): cap=16 splits it into 8 chunks /
    # 36 triangle tasks; the result set must be identical to the streaming
    # join strategy (ground truth) — the decomposition changes the physical
    # plan, never the pairs.
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((120, 8)).astype("float32")
    rows = [(i, vecs[i].tolist(), 0) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    capped = similarity.embedding_near_dup_pairs(
        df, threshold=0.5, block_col="label", block_cap=16
    )
    reference = similarity.embedding_near_dup_pairs(
        df, threshold=0.5, block_col="label", strategy="join"
    )
    got = sorted((r.id_a, r.id_b, r.cosine_sim) for r in capped.collect())
    want = sorted((r.id_a, r.id_b, r.cosine_sim) for r in reference.collect())
    assert got == want and len(got) > 0


def test_triangle_tasks_bound_per_task_rows(spark):
    from mini_project_big_data_analysis_spark.operators.relational import (
        triangle_tasks,
    )

    n, cap = 200, 16
    df = spark.range(n).select(
        F.lit(0).alias("block"), F.col("id").alias("vec_id")
    )
    tasks = triangle_tasks(df, "vec_id", cap)
    sizes = tasks.groupBy("block", "__ca", "__cb").count().collect()
    g = -(-n // cap)  # ceil
    assert len(sizes) == g * (g + 1) // 2  # full triangle incl. diagonal
    # every task holds at most two chunks' worth of rows (hash-split chunk
    # sizes fluctuate around n/g ≈ cap; 2× slack covers the fluctuation)
    assert max(r["count"] for r in sizes) <= 4 * cap
    # replication factor is exactly g: each row participates in g tasks
    assert sum(r["count"] for r in sizes) == n * g


def test_capped_self_join_matches_plain_blocked_join(spark):
    from mini_project_big_data_analysis_spark.operators.relational import (
        capped_self_join_pairs,
    )

    rows = [
        (i, f"lang{i % 2}", f"s{i % 3}", f"prefix_{i % 7:02d}") for i in range(90)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string, prefix string")
    capped = capped_self_join_pairs(
        df, ["lang", "source"], "doc_id", ["prefix"], block_cap=4
    )
    a, b = df.alias("a"), df.alias("b")
    plain = a.join(
        b,
        on=[
            F.col("a.lang") == F.col("b.lang"),
            F.col("a.source") == F.col("b.source"),
            F.col("a.doc_id") < F.col("b.doc_id"),
        ],
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.prefix").alias("a_prefix"),
        F.col("b.prefix").alias("b_prefix"),
    )
    got = sorted(map(tuple, capped.select("id_a", "id_b", "a_prefix", "b_prefix").collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want and len(got) > 0


def test_centroid_seeding_survives_sorted_clustered_corpus(spark):
    # Adversarial id layout: ids 0-49 are one tight semantic cluster, ids
    # 50-99 another (corpora arrive sorted by crawl order). Lowest-n-id
    # seeding would draw EVERY seed from cluster A and funnel cluster B
    # into one giant cell; hash-sampled + Lloyd-refined seeding must keep
    # the largest cell well under the whole corpus.
    rng = np.random.default_rng(3)
    base_a = rng.standard_normal(8)
    base_b = rng.standard_normal(8)
    base_b -= base_b @ base_a / (base_a @ base_a) * base_a  # orthogonalize
    rows = []
    for i in range(100):
        base = base_a if i < 50 else base_b
        v = base + rng.standard_normal(8) * 0.05
        rows.append((i, v.astype("float32").tolist(), 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cents = similarity._centroids_from_corpus(df, 8, "vec_id", "embedding")
    cmat = np.asarray([c for _, c in cents])
    cmat = cmat / np.linalg.norm(cmat, axis=1)[:, None]
    vmat = np.asarray([r[1] for r in rows], dtype="float64")
    vmat = vmat / np.linalg.norm(vmat, axis=1)[:, None]
    assign = np.argmax(vmat @ cmat.T, axis=1)
    _, counts = np.unique(assign, return_counts=True)
    assert counts.max() <= 60, f"degenerate cell balance: {sorted(counts)}"
    # both planted clusters must map to different cells
    assert set(assign[:50]) != set(assign[50:]) or len(set(assign)) > 1


def test_lsh_topk_exclude_self_configurable(spark):
    df, vecs = _vectors(spark, n=20)
    # disjoint-entity query that numerically collides with corpus id 5 and
    # carries the same embedding: with exclude_self=False, corpus vector 5
    # is a legitimate (perfect) neighbor and must not be dropped
    queries = spark.createDataFrame(
        [(5, vecs[5].tolist())], "query_id long, embedding array<float>"
    )
    kept = similarity.lsh_bucketed_topk(
        df, queries, dim=8, k=5, n_planes=4, exclude_self=False
    ).collect()
    dropped = similarity.lsh_bucketed_topk(
        df, queries, dim=8, k=5, n_planes=4, exclude_self=True
    ).collect()
    assert 5 in {r.vec_id for r in kept}
    assert 5 not in {r.vec_id for r in dropped}
