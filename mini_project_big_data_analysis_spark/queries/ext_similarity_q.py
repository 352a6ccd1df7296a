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


_ARROW_NORM_ORACLE = """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6)
           AS l2_norm,
       len(embedding)::INTEGER AS dim
FROM embeddings
"""


@register("fn_mapinarrow_norms", _ARROW_NORM_ORACLE)
def fn_mapinarrow_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norms computed through ``mapInArrow`` — the zero-copy
    tier of the Python UDF ladder (row-udf → pandas_udf → mapInPandas →
    mapInArrow): batches arrive as raw ``pyarrow.RecordBatch``es with NO
    pandas materialization, the FixedSizeList/List values buffer feeds
    numpy directly, and the norms go back as an Arrow batch. This is the
    template for vector workloads where even the Arrow→pandas copy of
    mapInPandas is measurable (wide embedding columns dominate the
    payload).

    Scale shape: embarrassingly row-parallel in the scan stage — no
    shuffle; per-batch work is one vectorized numpy reduction over a
    (batch × dim) float32 matrix. The oracle accumulates in DOUBLE
    (`::DOUBLE[]`), matching numpy's float64 reduction over the float32
    values."""
    import pyarrow as pa

    def norms(batches):
        import numpy as np

        for batch in batches:
            vec_id = batch.column("vec_id")
            emb = batch.column("embedding")
            n = len(batch)
            dims = np.asarray(
                [len(emb[i]) for i in range(n)], dtype=np.int32
            )
            # flat values buffer → (n, dim) without per-row Python loops
            # (fixture vectors share one dim; ragged fall-back kept exact)
            flat = np.asarray(emb.flatten(), dtype=np.float64)
            if dims.min() == dims.max():
                mat = flat.reshape(n, dims[0]) if n else flat.reshape(0, 1)
                l2 = np.sqrt((mat * mat).sum(axis=1))
            else:  # pragma: no cover - fixture vectors are fixed-dim
                offs = np.concatenate([[0], np.cumsum(dims)])
                l2 = np.sqrt(
                    np.asarray(
                        [
                            (flat[offs[i] : offs[i + 1]] ** 2).sum()
                            for i in range(n)
                        ]
                    )
                )
            # unrounded float64 out of the batch; rounding happens in the
            # Spark plan below so BOTH engines apply the same half-away-
            # from-zero rule (np.round is banker's half-to-even — ADVICE r6)
            yield pa.RecordBatch.from_arrays(
                [
                    vec_id,
                    pa.array(l2, type=pa.float64()),
                    pa.array(dims, type=pa.int32()),
                ],
                names=["vec_id", "l2_norm", "dim"],
            )

    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", "embedding")
        .mapInArrow(norms, "vec_id BIGINT, l2_norm DOUBLE, dim INT")
        .withColumn("l2_norm", F.round("l2_norm", 6))
    )


_QUANT_ORACLE = """
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), s AS (
    SELECT vec_id, e,
           list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
    FROM v
)
SELECT vec_id,
       round(scale, 6) AS scale,
       round(sqrt(list_reduce(
                 list_prepend(0.0::DOUBLE, list_transform(e,
                     x -> (x - round(x / scale) * scale)
                          * (x - round(x / scale) * scale))),
                 (acc, x) -> acc + x) / len(e)), 6)
           AS rmse,
       list_max(list_transform(e,
             x -> abs(round(x / scale)))) <= 127.0 AS in_range
FROM s
"""


@register("ext_vector_quantize", _QUANT_ORACLE)
def ext_vector_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the 4×
    vector-store compression every large ANN deployment applies before
    indexing (scale = max|x|/127 per vector, q = round(x/scale)) — with
    per-vector reconstruction RMSE and a range proof as the audit output.

    Scale shape: entirely row-local higher-order-function arithmetic
    (transform/max/sum lambdas) — codegen in the scan stage, no UDF, no
    shuffle; only (id, scale, rmse, flag) rows leave, never vectors. Both
    engines accumulate in DOUBLE over the identical per-element expression
    tree, and the error sum is a LEFT FOLD on both sides (Spark
    ``aggregate``, DuckDB ``list_reduce`` seeded via list_prepend) so the
    double additions happen in the same order bit-for-bit — list_sum's
    different association was measured to move the 6dp-rounded RMSE across
    half-edges on a few of 500 vectors. The unrounded scale lives in an
    internal ``scale_raw`` column because Spark 4's lateral column alias
    resolution let the select-list alias ``scale`` SHADOW the input column
    inside sibling expressions — the rmse silently quantized against the
    6dp-rounded scale (measured: 0.000546 → 0.000552 on vec 443)."""
    emb = load(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    v = emb.select("vec_id", e.alias("e"))
    s = v.withColumn(
        "scale_raw",
        F.array_max(F.transform("e", lambda x: F.abs(x))) / F.lit(127.0),
    )
    resid = lambda x: x - F.round(x / F.col("scale_raw")) * F.col("scale_raw")  # noqa: E731
    err2 = F.aggregate(
        F.transform("e", lambda x: resid(x) * resid(x)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    q_max = F.array_max(
        F.transform("e", lambda x: F.abs(F.round(x / F.col("scale_raw"))))
    )
    return s.select(
        "vec_id",
        F.round("scale_raw", 6).alias("scale"),
        F.round(F.sqrt(err2 / F.size("e")), 6).alias("rmse"),
        (q_max <= 127.0).alias("in_range"),
    )
