"""Similarity-search queries (SURVEY.md §2.9) over the embeddings table.

``ext_sim_topk`` is the exact brute-force baseline with a strong DuckDB
oracle (list_cosine_similarity — cast to DOUBLE[] on the oracle side because
DuckDB accumulates FLOAT[] in float32 while our `cosine` accumulates in
double). ``ext_sim_ann`` (LSH buckets from seeded random hyperplanes) and
its recall are pinned by unit tests instead — the hyperplane constants are
not reproducible in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register

_TOPK_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, v.vec_id,
         round(list_cosine_similarity(v.embedding::DOUBLE[], q.qvec), 6) AS cosine_sim
  FROM embeddings v, q
  WHERE v.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine_sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_sim DESC, vec_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine_sim, rank FROM ranked WHERE rank <= 10
"""


@register("ext_sim_topk", _TOPK_ORACLE)
def ext_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors drawn from the corpus:
    crossJoin(broadcast(queries)) → codegen'd double-accumulated cosine →
    per-query window rank. The corpus side never shuffles."""
    from ..operators.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(
        emb, queries, k=10, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", exclude_self=True,
    )


@register("ext_sim_ann", None)  # rows-only: seeded hyperplanes not in SQL
def ext_sim_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via multi-probe multi-table random-hyperplane LSH —
    the 100 TB path: equi-join on (table, bucket), partition-prunable when
    the corpus is written bucketed. Settings (6 planes, Hamming-2 probes, 6
    OR'd tables) pinned at recall ≥ 0.9 vs the exact ext_sim_topk answer in
    tests/test_similarity.py — the fixture's uniform-random vectors are the
    adversarial regime (top-k cosine ≈ 0.3); near-dup corpora reach the
    same recall with 1 table at a few percent scan fraction."""
    from ..operators.similarity import lsh_bucketed_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_bucketed_topk(
        emb, queries, dim=64, k=10, n_planes=6, id_col="vec_id",
        vec_col="embedding", query_id_col="query_id",
        probe_radius=2, n_tables=6,
    )


_NEARDUP_ORACLE = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
         AS cosine_sim
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
      >= 0.3
"""


@register("ext_emb_neardup", _NEARDUP_ORACLE)
def ext_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within an explicit block (label) —
    exact-within-block and SQL-mirrorable. With block_col=None the same
    operator blocks by LSH bucket (the scale default, tested in unit tests)."""
    from ..operators.similarity import embedding_near_dup_pairs

    emb = load(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb, threshold=0.3, block_col="label", id_col="vec_id", vec_col="embedding"
    )


@register("ext_sim_ivf", None)  # rows-only: data-dependent centroids not in SQL
def ext_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: corpus inverted-file-partitioned by nearest
    of 16 sampled centroids; 5 queries probe their 8 closest cells.

    Probe width is set for the fixture's ADVERSARIAL regime: the driver's
    embeddings are near-uniform on the sphere (within-label mean cosine
    0.02), where any sublinear ANN's recall ≈ its scan fraction — so 8/16
    cells buys the pinned recall floor honestly. (Before round 4's balanced
    centroid seeding, 4 probes appeared to achieve 0.8+ recall only because
    the degenerate seeding funneled most vectors into one giant cell that
    every query probed — inflated recall from accidentally scanning nearly
    everything.) On a real clustered corpus the same index needs far fewer
    probes for the same recall, and cells become partition-prune units.
    Recall vs exact brute force is pinned in tests (deterministic
    centroids => stable recall)."""
    from ..operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(
        emb, queries, k=10, n_centroids=16, n_probe=8,
        id_col="vec_id", vec_col="embedding", query_id_col="query_id",
    )


_CENTROID_ORACLE = """
    SELECT label,
           pos,
           round(avg(v), 6) AS centroid_v
    FROM (
        SELECT label,
               unnest(embedding)::DOUBLE AS v,
               (generate_subscripts(embedding, 1) - 1)::INT AS pos
        FROM embeddings
    ) t
    GROUP BY label, pos
"""


@register("ext_embed_centroids", _CENTROID_ORACLE)
def ext_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean-pooled embedding centroid (class prototypes — the
    build step for IVF cells, curriculum distance features, cluster
    labeling) in mergeable long format (label, pos, centroid_v):
    posexplode × dim feeds one hash-agg on (label, pos) with map-side
    partial sums — the dataflow form of a vector UDAF, no Python in the
    loop (operators/similarity.py label_centroids)."""
    from ..operators.similarity import label_centroids

    emb = load(spark, sf_dir, "embeddings")
    return label_centroids(emb, group_col="label", vec_col="embedding")


_SEMDEDUP_ORACLE = """
WITH RECURSIVE edges AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
        >= 0.3
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM edges
  UNION
  SELECT id_b AS a, id_a AS b FROM edges
),
reach(node, comp) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.a, r.comp FROM sym s JOIN reach r ON s.b = r.node
),
comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
SELECT e.vec_id, e.label
FROM embeddings e
WHERE e.vec_id NOT IN (SELECT node FROM comps WHERE node <> comp)
"""


@register("ext_semdedup", _SEMDEDUP_ORACLE)
def ext_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end: within-cluster cosine pairs → connected
    near-dup groups → keep the min-id representative, drop the rest. The
    registered form blocks by the explicit label column so the whole
    funnel (pairs, transitive closure, survivor anti-join) has a byte-exact
    recursive-CTE oracle; the centroid-clustered scale path (block_col=
    None) is pinned by unit test with planted duplicates. The 0.3
    threshold is fixture-tuned (uniform-random vectors); real embedding
    corpora run 0.9+."""
    from ..operators.similarity import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, threshold=0.3, block_col="label", id_col="vec_id", vec_col="embedding"
    ).select("vec_id", "label")
