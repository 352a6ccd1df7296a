r"""Training-data pipeline queries (SURVEY.md §2.9 extension family):
deterministic split / stratified sample / dataset mix / sequence packing
over the documents table (operators/pipeline.py).

Every assignment below is a pure function of ``md5(doc_id || salt)`` — no
RNG — so the DuckDB oracles reproduce each output byte-for-byte:
``conv(substring(md5(x),1,8),16,10)`` (Spark) ≡
``('0x' || substr(md5(x),1,8))::UBIGINT`` (DuckDB). Bucket cut points are
precomputed integer literals on BOTH sides (Python ``int()`` truncates,
DuckDB's double→BIGINT cast rounds — literals sidestep the difference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text_fns
from ..operators import pipeline
from .base import load, register

_B = "(('0x' || substr(md5(doc_id::VARCHAR || '{salt}'), 1, 8))::UBIGINT)::BIGINT"


_SPLIT_ORACLE = f"""
    SELECT doc_id,
           CASE WHEN {_B.format(salt='split-v1')} < 3435973836 THEN 'train'
                WHEN {_B.format(salt='split-v1')} < 3865470566 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
"""


@register("ext_split_hash", _SPLIT_ORACLE)
def ext_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content hash — row-
    local CASE over md5(doc_id||salt), no shuffle, no RNG; stable under
    re-partitioning and incremental re-runs (new rows never move old ones).
    The training-pipeline replacement for randomSplit, whose assignment
    changes with partition placement."""
    docs = load(spark, sf_dir, "documents")
    return pipeline.hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="doc_id"
    ).select("doc_id", "split")


_SAMPLE_ORACLE = f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_B.format(salt='sample-v1')}
          < CASE WHEN lang = 'en' THEN 429496729 ELSE 2147483648 END
"""


@register("ext_sample_stratified", _SAMPLE_ORACLE)
def ext_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: cap English at 10%, keep other
    languages at 50% — the corpus-rebalancing step, as a row-local hash
    filter that pipelines into the scan (no shuffle, pushdown intact)."""
    docs = load(spark, sf_dir, "documents")
    return pipeline.stratified_sample_hash(
        docs, rates={"en": 0.1}, default_rate=0.5, strata_col="lang", id_col="doc_id"
    ).select("doc_id", "lang")


_MIX_ORACLE = f"""
    SELECT doc_id, lang, 'web_en' AS mix_source
    FROM documents
    WHERE lang = 'en'
      AND {_B.format(salt='mix-v1web_en')} < 2147483648
    UNION ALL
    SELECT doc_id, lang, 'multi' AS mix_source
    FROM documents
    WHERE lang <> 'en'
      AND {_B.format(salt='mix-v1multi')} < 3865470566
"""


@register("ext_dataset_mix", _MIX_ORACLE)
def ext_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixture with provenance: 50% of the English slice +
    90% of the multilingual slice, tagged by source leg. Each leg is a
    row-local hash filter over its own scan; the union is plan-level
    concatenation — no shuffle anywhere."""
    docs = load(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en")
    multi = docs.filter(F.col("lang") != "en")
    return pipeline.dataset_mix(
        [("web_en", en, 0.5), ("multi", multi, 0.9)],
        id_col="doc_id",
        source_col="mix_source",
    ).select("doc_id", "lang", "mix_source")


_PACK_ORACLE = rf"""
    WITH toks AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens,
               {_B.format(salt='pack-v1')} % 8 AS shard
        FROM documents
    ), placed AS (
        SELECT doc_id, shard, n_tokens,
               coalesce(sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS pack_start
        FROM toks
    )
    SELECT doc_id, shard, n_tokens,
           (pack_start // 256)::BIGINT AS pack_id,
           (pack_start % 256)::BIGINT AS pack_offset,
           (pack_start // 256) <> ((pack_start + n_tokens - 1) // 256)
               AS spans_boundary
    FROM placed
"""


@register("ext_token_pack", _PACK_ORACLE)
def ext_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing ("concat then chunk" LM pretraining layout): docs
    hash-sharded 8 ways, each shard concatenated in doc_id order and cut at
    256-token boundaries; emits each doc's (shard, pack_id, pack_offset).
    One shuffle (shard key) + per-shard window prefix-sum — shards pack
    independently, so parallelism is n_shards regardless of corpus size."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "n_tokens", text_fns.token_count_ws("text")
    )
    return pipeline.pack_sequences(
        docs, capacity=256, n_shards=8, token_col="n_tokens", id_col="doc_id"
    )


_QUALITY_ORACLE = """
    SELECT count(*) AS n_rows,
           count(DISTINCT doc_id) AS n_distinct_ids,
           sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_text,
           sum(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END)::BIGINT AS blank_text,
           (sum(CASE WHEN lang NOT IN ('en','de','es','fr','zh') THEN 1 ELSE 0 END)
            + sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END))::BIGINT AS lang_violations,
           sum(CASE WHEN n_chars NOT BETWEEN 1 AND 100000 THEN 1 ELSE 0 END)::BIGINT
               AS len_violations,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           round(avg(n_chars), 6) AS avg_chars
    FROM documents
"""


@register("ext_data_quality", _QUALITY_ORACLE)
def ext_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-check suite over the corpus — uniqueness, presence,
    domain, range, and profile metrics — evaluated in ONE aggregate pass
    (operators/quality.py): the ingest guard stage, Deequ-shaped."""
    from ..operators import quality as Q

    docs = load(spark, sf_dir, "documents")
    return Q.quality_report(
        docs,
        {
            "n_rows": F.count(F.lit(1)),
            "n_distinct_ids": F.countDistinct("doc_id"),
            "null_text": Q.null_count("text"),
            "blank_text": Q.blank_count("text"),
            "lang_violations": Q.domain_violations(
                "lang", ["en", "de", "es", "fr", "zh"]
            ),
            "len_violations": Q.range_violations("n_chars", 1, 100000),
            "min_chars": F.min("n_chars"),
            "max_chars": F.max("n_chars"),
            "avg_chars": F.round(F.avg("n_chars"), 6),
        },
    )


_ZORDER_ORACLE = """
    WITH base AS (
        SELECT event_id,
               user_id % 65536 AS a,
               (floor(epoch(ts))::BIGINT // 60) % 65536 AS b
        FROM events
    )
    SELECT event_id,
           sum((((a >> i) & 1) << (2*i)) + (((b >> i) & 1) << (2*i+1)))::BIGINT
               AS zcode
    FROM base, LATERAL unnest(range(0, 16)) AS r(i)
    GROUP BY event_id, a, b
"""


@register("ext_zorder_cluster", _ZORDER_ORACLE)
def ext_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering code over (user_id, minute-bucket) —
    sort-on-write by this code gives parquet row-group min/max locality on
    BOTH dimensions (operators/layout.py). The code itself is a fixed
    unrolled shift/mask projection: whole-stage codegen, no UDF, no shuffle
    (the write-side range exchange lives in zorder_by, not here)."""
    from ..operators.layout import morton_code

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 65536).alias("a"),
        (F.expr("unix_timestamp(ts) div 60") % 65536).alias("b"),
    )
    return ev.select("event_id", morton_code("a", "b", 16).alias("zcode"))


_DECONTAM_ORACLE = r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, array_to_string(list_slice(t, i, i+4), ' ') AS g
        FROM (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 5),
             LATERAL unnest(range(1, n - 3)) AS r(i)
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 50)
    SELECT gr.doc_id, count(DISTINCT gr.g) AS n_shared_grams
    FROM grams gr JOIN bench b ON gr.g = b.g
    WHERE gr.doc_id >= 50
    GROUP BY gr.doc_id
"""


@register("ext_decontaminate", _DECONTAM_ORACLE)
def ext_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id ≥ 50) sharing any
    5-token gram with the benchmark slice (doc_id < 50) — the eval-leakage
    check before training. Benchmark gram set broadcasts (eval suites are
    small by construction); training grams stream through the broadcast
    join — zero shuffle of training data (operators/pipeline.py)."""
    from ..operators.pipeline import decontaminate

    docs = load(spark, sf_dir, "documents")
    return decontaminate(
        docs.filter(F.col("doc_id") >= 50),
        docs.filter(F.col("doc_id") < 50),
        k=5,
    )


_COMPACT_TARGET = 4096  # target compacted object size, in n_chars units

_COMPACT_ORACLE = f"""
WITH f AS (
    SELECT source, doc_id, n_chars,
           coalesce(sum(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
    FROM documents
)
SELECT source,
       (cum_before // {_COMPACT_TARGET})::BIGINT AS bin_id,
       count(*)::BIGINT AS n_files,
       sum(n_chars)::BIGINT AS bin_bytes
FROM f
GROUP BY source, (cum_before // {_COMPACT_TARGET})::BIGINT
"""


@register("ext_compaction_bins", _COMPACT_ORACLE)
def ext_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction planner: pack each source partition's files (docs stand
    in for data files, n_chars for bytes) into ~4 KiB output bins by
    running-size bin assignment — the OPTIMIZE/rewrite_data_files planning
    step that fixes the small-files problem before scans pay per-file open
    cost.

    The assignment is the streaming greedy rule (bin = floor(bytes-before /
    target) over a deterministic file order), which both engines express as
    one window cumsum — integer arithmetic, exactly mirrorable, no RNG bin
    packing. Scale shape: ONE shuffle on the partition key drives both the
    window and the final (source, bin) re-aggregation (same partitioning,
    no second exchange of the wide rows); planning output is bin manifests
    — file counts and sizes — never file contents. A real lakehouse table
    runs this per partition in parallel exactly like this, then hands each
    bin row to a rewrite task."""
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    f = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("cum_before"),
    )
    return (
        f.withColumn(
            "bin_id", F.floor(F.col("cum_before") / _COMPACT_TARGET).cast("long")
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_chars").alias("bin_bytes"),
        )
    )


_IMV_ORACLE = """
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_s,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value,
       round(sum(value) / count(*), 6) AS avg_value
FROM events
GROUP BY event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
"""


@register("ext_incremental_view", _IMV_ORACLE)
def ext_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the daily (type, day)
    metrics view is maintained as ALGEBRAIC PARTIALS — (sum, count), from
    which avg derives — so a new delta batch folds in by merging partials,
    never rescanning the base. Here the log is split at Jan 15 into a
    'yesterday's view state' leg and a 'today's delta' leg, each
    pre-aggregated independently, then merged by one partial-sum re-agg;
    the oracle is the full recompute, which the merge must equal exactly —
    the associativity contract that makes lambda/streaming view upkeep
    valid. Scale shape: both legs collapse map-side before their shuffle;
    the merge re-agg runs on view-grain rows (days × types), not events;
    at 100 TB the base leg is the stored view — only the delta is read at
    all, which is the entire point."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day_s"),
        "value",
        "ts",
    )
    cut = "2024-01-15"
    partial = lambda df: df.groupBy("event_type", "day_s").agg(  # noqa: E731
        F.count(F.lit(1)).alias("pn"), F.sum("value").alias("ps")
    )
    base = partial(ev.filter(F.col("ts") < cut))
    delta = partial(ev.filter(F.col("ts") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("event_type", "day_s")
        .agg(F.sum("pn").alias("n_events"), F.sum("ps").alias("s"))
        .select(
            "event_type",
            "day_s",
            "n_events",
            F.round("s", 6).alias("sum_value"),
            F.round(F.col("s") / F.col("n_events"), 6).alias("avg_value"),
        )
    )


_EXACTK_K = 20

_EXACTK_ORACLE = f"""
WITH h AS (
    SELECT doc_id, lang,
           {_B.format(salt='exactk-v1')} AS hk
    FROM documents
), r AS (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk
    FROM h
)
SELECT doc_id, lang FROM r WHERE rk <= {_EXACTK_K}
"""


@register("ext_sample_exact_k", _EXACTK_ORACLE)
def ext_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-k uniform sample per stratum (20 docs per language): rank rows
    by a salted content hash and keep the k smallest — the eval-set /
    human-review draw where a RATE-based sample (ext_sample_stratified)
    can't promise the exact count. Hash-ranking makes it deterministic,
    stable under re-partitioning, and near-uniform (md5 is a PRF on the
    id), with the usual incremental caveat stated: unlike rate sampling,
    adding corpus rows CAN evict a previously sampled row (a new smaller
    hash enters the top-k) — that's inherent to any exact-k draw.

    Scale shape: hash is row-local; rank()≤k lowers to WindowGroupLimit
    (k-row heap per map partition BEFORE the one stratum shuffle), so the
    exchange carries ≤k rows per (partition, stratum) — same plan family
    as window_topk_per_group, pinned there."""
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    hk = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("exactk-v1"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("lang").orderBy("hk", "doc_id")
    return (
        docs.select("doc_id", "lang", hk.alias("hk"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _EXACTK_K)
        .select("doc_id", "lang")
    )


_E2E_ORACLE = f"""
WITH gated AS (
    SELECT doc_id, text, lang, n_chars FROM documents
    WHERE n_chars BETWEEN 50 AND 5000 AND lang IN ('en','de','es','fr','zh')
), keyed AS (
    SELECT *, md5(text) AS content_key FROM gated
), deduped AS (
    SELECT * FROM keyed
    QUALIFY row_number() OVER (PARTITION BY content_key ORDER BY doc_id) = 1
), split AS (
    SELECT doc_id, lang, n_chars,
           CASE WHEN {_B.format(salt='split-v1')} < 3435973836 THEN 'train'
                WHEN {_B.format(salt='split-v1')} < 3865470566 THEN 'val'
                ELSE 'test' END AS split
    FROM deduped
)
SELECT split, lang,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars
FROM split
GROUP BY split, lang
"""


@register("ext_pipeline_e2e", _E2E_ORACLE)
def ext_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline END-TO-END as one composed plan — quality
    gate → exact content dedupe (keep lowest id) → deterministic 80/10/10
    split → per-(split, lang) dataset card — i.e. the workflow every other
    §2.9 id is a stage of, composed the way a real corpus build runs it.
    The oracle replays the identical chain as one CTE pipeline, so the
    hash check covers the COMPOSITION (stage ordering, column threading,
    dedupe-before-split) and not just each stage alone.

    Scale shape: the gate is a pushable scan filter; the dedupe is one
    hash shuffle on the content key with a rank-1 keeper (WindowGroupLimit
    heap per map partition); the split is row-local md5 (the ext_split_hash
    recipe — stable under re-partitioning, so reruns and incremental
    appends never move old rows between splits); the card is one tiny
    (split, lang) hash-agg. One real shuffle of document rows total — the
    composition adds NO exchange beyond its most expensive stage."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    gated = docs.filter(
        F.col("n_chars").between(50, 5000)
        & F.col("lang").isin("en", "de", "es", "fr", "zh")
    )
    keyed = gated.withColumn("content_key", F.md5("text"))
    w = Window.partitionBy("content_key").orderBy("doc_id")
    deduped = (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    split = pipeline.hash_split(
        deduped, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="doc_id"
    )
    return split.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


_RANKNORM_ORACLE = """
SELECT doc_id, lang,
       round(percent_rank() OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id), 6) AS len_pct
FROM documents
"""


@register("ext_rank_normalize", _RANKNORM_ORACLE)
def ext_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank normalization (quantile-uniform feature transform): map each
    doc's length to its within-language percentile — the scale-free
    feature encoding that survives heavy-tailed distributions where
    z-scores don't, and the first stage of quantile-gaussian transforms.

    Scale shape: percent_rank runs PARTITIONED by the stratum (one
    shuffle, every language sorts in parallel) — never as a global
    unpartitioned window; a global variant would use the distributed-rank
    recipe from ext_gini_concentration. The (n_chars, doc_id) tie-break
    makes ranks — and the 6dp-rounded output — deterministic across
    engines."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id", "lang", F.round(F.percent_rank().over(w), 6).alias("len_pct")
    )


_PPS_RATE = 0.2  # expected sample fraction at w == w_max

_PPS_ORACLE = f"""
WITH wmax AS (
    SELECT max(n_chars)::DOUBLE AS m FROM documents
)
SELECT doc_id, n_chars
FROM documents CROSS JOIN wmax
WHERE {_B.format(salt='pps-v1')} / 4294967296.0
      < n_chars / m * {_PPS_RATE}
"""


@register("ext_sample_pps", _PPS_ORACLE)
def ext_sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size sampling: each doc is kept with
    probability ∝ its length (weight / w_max × base rate) decided by the
    deterministic md5 hash — the weighted corpus draw used to bias
    training mixes toward long/high-quality documents WITHOUT an RNG (same
    stability contract as ext_split_hash: re-runs and re-partitions never
    change the draw; only the salt does).

    Scale shape: the weight normalizer is a 1-row max broadcast into a
    row-local keep predicate — filter pipelines into the scan, no shuffle,
    no per-row state. Inclusion probabilities are exact by construction
    (hash/2³² is uniform), so downstream Horvitz-Thompson reweighting is
    1/(w/w_max·rate) — noted for estimator use."""
    docs = load(spark, sf_dir, "documents")
    wmax = docs.agg(F.max("n_chars").cast("double").alias("m"))
    hk = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("pps-v1"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        docs.join(F.broadcast(wmax))
        .filter(
            hk / F.lit(4294967296.0)
            < F.col("n_chars") / F.col("m") * F.lit(_PPS_RATE)
        )
        .select("doc_id", "n_chars")
    )


_DOMAIN_CAP_K = 10

_DOMAIN_CAP_ORACLE = f"""
    SELECT doc_id, source, grp_rank FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
               )::BIGINT AS grp_rank
        FROM documents
    ) ranked
    WHERE grp_rank <= {_DOMAIN_CAP_K}
"""


@register("ext_domain_cap", _DOMAIN_CAP_ORACLE)
def ext_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document quota: keep each source's 10 longest documents
    (n_chars desc, doc_id tiebreak) — the anti-domination cap web-corpus
    curation applies so an over-crawled domain can't swamp the mixture.
    rank ≤ k compiles to WindowGroupLimit: every map task forwards at most
    k rows per source into the shuffle, so shuffle volume is
    O(domains × k) regardless of corpus size (operators/pipeline.py
    cap_per_group; the same plan shape pinned for rank()≤k in
    tests/test_timeseries_round6.py)."""
    from ..operators.pipeline import cap_per_group

    docs = load(spark, sf_dir, "documents")
    return cap_per_group(
        docs,
        "source",
        [F.desc("n_chars"), F.asc("doc_id")],
        _DOMAIN_CAP_K,
    ).select("doc_id", "source", "grp_rank")


_BUDGET_ORACLE = rf"""
    WITH toks AS (
        SELECT doc_id, source,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents
    ), tot AS (
        SELECT source, sum(n_tokens)::BIGINT AS t FROM toks GROUP BY source
    ), m AS (
        SELECT min(t) AS mn FROM tot
    ), thr AS (
        SELECT source,
               floor(
                   CASE WHEN t = 0 THEN 1.0
                        ELSE round(least(1.0, mn::DOUBLE / t::DOUBLE), 6)
                   END * 4294967296
               )::BIGINT AS cut
        FROM tot CROSS JOIN m
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN thr USING (source)
    WHERE {_B.format(salt='budget-v1')} < thr.cut
"""


@register("ext_token_budget_mix", _BUDGET_ORACLE)
def ext_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-derived token-budget mixture: every source downsampled to the
    token count of the smallest source (rate_g = min_h T_h / T_g), rates
    computed FROM the corpus rather than hand-set (the ext_dataset_mix
    contract). Plan: one map-side-combined agg to ~|sources| rows, the
    kilobyte rate table broadcast back, then a row-local deterministic
    hash draw — the corpus is never shuffled (operators/pipeline.py
    token_budget_mix)."""
    from ..operators.pipeline import token_budget_mix

    docs = load(spark, sf_dir, "documents").withColumn(
        "n_tokens", text_fns.token_count_ws("text")
    )
    return token_budget_mix(
        docs, group_col="source", token_col="n_tokens", id_col="doc_id",
        salt="budget-v1",
    ).select("doc_id", "source")
