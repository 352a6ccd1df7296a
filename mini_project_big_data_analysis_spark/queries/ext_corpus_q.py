r"""Round-5 corpus-pipeline queries (SURVEY.md §2.9f): paragraph-level
dedup with order-preserving document reconstruction, RAG chunking,
canonical-URL dedup, SCD2 dimension build, unigram-LM scoring, and
train/test split-leakage detection.

Like the rest of the §2.9 family these model the operations a training-data
pipeline runs over a web-scale corpus (the reference itself stops at
city-level weather aggregation — `app.py:101-153` — so these derive from
the BASELINE.json north star, not from reference behavior). Every formula
is a pure column expression mirrored exactly in the DuckDB oracle; hashes
are md5 (identical lowercase hex on both engines), so even the
hash-partitioned intermediates agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import load, register

# ---------------------------------------------------------------------------
# ext_paragraph_dedup — corpus-wide duplicate-block removal, order-preserving
# ---------------------------------------------------------------------------

_BLOCK = 10  # tokens per block ("paragraph" stand-in: the fixture corpus is
# a single-line token stream, so fixed 10-token blocks play the role real
# paragraphs (split on \n\n) would play on a crawl corpus.

_PARA_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), blocks AS (
    SELECT doc_id, i,
           array_to_string(t[(i*{_BLOCK}+1):(i*{_BLOCK}+{_BLOCK})], ' ') AS blk
    FROM toks, unnest(generate_series(0, (len(t)-1)//{_BLOCK})) u(i)
), marked AS (
    SELECT doc_id, i, blk,
           row_number() OVER (PARTITION BY md5(blk) ORDER BY doc_id, i) AS rn
    FROM blocks
)
SELECT doc_id,
       count(*)::BIGINT                                   AS n_blocks,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT    AS n_kept,
       coalesce(string_agg(CASE WHEN rn = 1 THEN blk END, ' ' ORDER BY i), '')
                                                          AS dedup_text
FROM marked
GROUP BY doc_id
"""


@register("ext_paragraph_dedup", _PARA_ORACLE)
def ext_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicate-paragraph removal (the C4/Gopher repeated-span
    scrub): explode each doc into 10-token blocks, keep only the corpus-wide
    FIRST occurrence of every distinct block (min (doc_id, position) — one
    window over the block-hash shuffle key), and reassemble each document
    in original order from its surviving blocks.

    Scale shape: one explode (map-side), one shuffle keyed by block hash
    (uniformly distributed — md5), one shuffle back on doc_id for the
    ordered reassembly. No driver state, no all-pairs anything; block
    payloads travel the first shuffle only once."""
    docs = load(spark, sf_dir, "documents")
    # token array materialized as a COLUMN first: an inline split captured
    # by the transform lambda re-evaluates the regex per generated block
    # (the ext_span_dedup lesson, measured 5x at sf0.1)
    docs = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
    toks = F.col("t")
    n_blocks = (F.size(toks) - 1) / _BLOCK  # floor via cast below
    blocks = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_blocks.cast("long")),
                    lambda i: F.array_join(
                        F.slice(toks, i * _BLOCK + 1, _BLOCK), " "
                    ),
                )
            ).alias("i", "blk"),
        )
    )
    w = Window.partitionBy(F.md5("blk")).orderBy("doc_id", "i")
    marked = blocks.withColumn("rn", F.row_number().over(w))
    kept = F.when(F.col("rn") == 1, F.struct(F.col("i"), F.col("blk")))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s.getField("blk")
                ),
                " ",
            ).alias("dedup_text"),
        )
    )


# ---------------------------------------------------------------------------
# ext_doc_chunk — RAG chunking: overlapping token windows
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 32, 24  # 8-token overlap between consecutive chunks

_CHUNK_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), chunks AS (
    SELECT doc_id, j,
           t[(j*{_STRIDE}+1):(j*{_STRIDE}+{_CHUNK})] AS c
    FROM toks,
         unnest(generate_series(
             0, greatest((len(t) - {_CHUNK} + {_STRIDE} - 1) // {_STRIDE}, 0)
         )) u(j)
)
SELECT doc_id,
       j                                        AS chunk_id,
       len(c)::BIGINT                           AS n_tok,
       substr(md5(array_to_string(c, ' ')), 1, 16) AS chunk_hash
FROM chunks
"""


@register("ext_doc_chunk", _CHUNK_ORACLE)
def ext_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking: overlapping 32-token windows with stride
    24 (8-token overlap so no boundary context is lost). Emits (doc_id,
    chunk_id, token count, chunk content hash) — the id/hash pair is what a
    downstream embed-and-index stage keys on.

    Pure narrow ops: split once, generate chunk starts with ``sequence``,
    slice per start — all whole-stage-codegen, no shuffle at all. At 100 TB
    this pipelines into the scan and fans out ~n_tokens/stride rows per doc
    with no exchange until whatever consumes the chunks."""
    docs = load(spark, sf_dir, "documents")
    # same pre-materialization as the block dedup above (lambda capture)
    docs = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
    toks = F.col("t")
    last_start = F.greatest(
        F.floor((F.size(toks) - _CHUNK + _STRIDE - 1) / _STRIDE).cast("long"),
        F.lit(0).cast("long"),
    )
    chunk = lambda j: F.slice(toks, j * _STRIDE + 1, _CHUNK)  # noqa: E731
    return docs.select(
        "doc_id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), last_start), chunk)
        ).alias("chunk_id", "c"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("c").cast("long").alias("n_tok"),
        F.substring(F.md5(F.array_join("c", " ")), 1, 16).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# ext_dedup_url — canonical-URL dedup (crawl-frontier dedup)
# ---------------------------------------------------------------------------

_URL_MESSY = """
    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END)
    || '://' ||
    (CASE WHEN doc_id % 4 = 0 THEN upper(source) ELSE source END)
    || '.example.com/items/' || (doc_id % 50)
    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&utm_campaign=x' ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)
"""

_URL_DEDUP_ORACLE = f"""
WITH urls AS (
    SELECT doc_id, {_URL_MESSY} AS url FROM documents
), canon AS (
    SELECT doc_id,
           lower(regexp_extract(url, '^([a-zA-Z]+)://', 1)) || '://' ||
           lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1)) ||
           rtrim(regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1), '/')
               AS canonical_url
    FROM urls
)
SELECT canonical_url,
       count(*)::BIGINT AS n_docs,
       min(doc_id)      AS keeper_doc_id
FROM canon
GROUP BY canonical_url
"""


@register("ext_dedup_url", _URL_DEDUP_ORACLE)
def ext_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup — the crawl-frontier tier that runs before any
    content hashing: case-fold scheme+host, drop query string (tracking
    params) and fragment, strip the trailing slash, then keep one doc per
    canonical URL (min doc_id) with the duplicate multiplicity.

    The fixture corpus carries no URLs, so a deterministic messy URL is
    synthesized per doc (mixed-case scheme/host, utm params, trailing
    slashes, fragments — each controlled by doc_id arithmetic) and both
    engines normalize it independently: agreement proves the normalization,
    not the synthesis. Row-local regexes + one hash-agg — scale-safe."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(F.col("doc_id") % 4 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".example.com/items/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0, F.lit("?utm_source=feed&utm_campaign=x"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    canonical = F.concat(
        F.lower(F.regexp_extract(url, r"^([a-zA-Z]+)://", 1)),
        F.lit("://"),
        F.lower(F.regexp_extract(url, r"^[a-zA-Z]+://([^/?#]+)", 1)),
        F.regexp_replace(
            F.regexp_extract(url, r"^[a-zA-Z]+://[^/?#]+([^?#]*)", 1), "/+$", ""
        ),
    )
    return (
        docs.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# ext_scd2_dim — slowly-changing-dimension (type 2) build from an event log
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
), changes AS (
    SELECT user_id, event_type, ts, event_id
    FROM ordered
    WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S')     AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           AS is_current
FROM changes
"""


@register("ext_scd2_dim", _SCD2_ORACLE)
def ext_scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: collapse each user's event
    stream to its state *changes* (lag over (user, time)), then derive
    validity intervals [valid_from, valid_to) with lead; the open interval
    is the current row. The standard warehouse pattern for turning an
    append-only log into a point-in-time-joinable dimension.

    Both windows share the same partitioning (user_id), so Catalyst plans
    ONE exchange and two in-partition sorts — at 100 TB this is a single
    shuffle of the (already narrow) change rows."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w_full = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_full))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    # event_id tie-break in BOTH lead windows (matching w_full): two change
    # rows sharing an identical ts would otherwise chain nondeterministically
    # and the two engines could disagree.
    w_chg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w_chg)
    return changes.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# ext_unigram_logprob — corpus unigram-LM document scoring
# ---------------------------------------------------------------------------

_LM_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
    FROM documents
), vocab AS (
    SELECT token, count(*)::BIGINT AS c FROM toks GROUP BY token
), total AS (
    SELECT sum(c)::BIGINT AS n FROM vocab
)
SELECT t.doc_id,
       count(*)::BIGINT                                   AS n_tokens,
       round(avg(ln(v.c)) - any_value(ln(total.n)), 6)    AS avg_logprob
FROM toks t
JOIN vocab v USING (token)
CROSS JOIN total
GROUP BY t.doc_id
"""


@register("ext_unigram_logprob", _LM_ORACLE)
def ext_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram language-model scoring: every doc's mean token
    log-probability under the corpus's own unigram distribution — the
    cheap perplexity proxy used as a quality filter (low avg logprob =
    gibberish / OCR noise; suspiciously high = boilerplate). Uses
    avg(ln c) − ln N ≡ avg(ln(c/N)) so the corpus total joins as a 1-row
    broadcast instead of dividing inside the hot join.

    Scale shape: token-count agg (map-side partials collapse the Zipf head
    before the shuffle), then an exploded-tokens ⋈ vocab equi-join. The
    head tokens are heavily skewed — AQE's skew-join split handles the
    reducer imbalance (enabled in session defaults), which is the reason
    NOT to hand-salt here."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    return (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log("c")) - F.first(F.log("n")), 6).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# ext_split_leakage — cross-split contamination audit
# ---------------------------------------------------------------------------

_B = "(('0x' || substr(md5(doc_id::VARCHAR || 'split-v1'), 1, 8))::UBIGINT)::BIGINT"

_LEAK_ORACLE = rf"""
WITH assigned AS (
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', ' ', 'g'),
                                   '\s+', ' ', 'g'))) AS fingerprint,
           CASE WHEN {_B} < 3435973836 THEN 'train'
                WHEN {_B} < 3865470566 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
), marked AS (
    SELECT split, fingerprint,
           count(DISTINCT split) OVER (PARTITION BY fingerprint) AS fp_splits
    FROM assigned
)
SELECT split,
       count(*)::BIGINT                                  AS n_docs,
       count(DISTINCT fingerprint)::BIGINT               AS n_fingerprints,
       sum(CASE WHEN fp_splits > 1 THEN 1 ELSE 0 END)::BIGINT AS n_leaked_docs
FROM marked
GROUP BY split
"""


@register("ext_split_leakage", _LEAK_ORACLE)
def ext_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split-leakage audit: per split of the deterministic
    80/10/10 hash split (same salt as ext_split_hash), how many documents
    carry a content fingerprint (casefolded, punct-stripped md5 — same
    normalization as ext_dedup_fingerprint) that ALSO appears in a
    different split. Any n_leaked_docs > 0 in val/test is eval-set
    contamination reachable from train — the audit every training pipeline
    must run before publishing a benchmark number. (The sf0.1 fixture
    corpus plants such duplicates; smaller fixtures audit to zero, and the
    split-size/fingerprint columns keep the check non-vacuous there.)

    Scale shape: one shuffle keyed by fingerprint (window counting the
    distinct splits each fingerprint touches), then one 3-row hash-agg by
    split — no joins, no driver state."""
    from ..operators.pipeline import hash_split

    docs = load(spark, sf_dir, "documents")
    fingerprint = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), r"[^\w\s]", " "), r"\s+", " "
            )
        )
    )
    assigned = hash_split(
        docs.select("doc_id", fingerprint.alias("fingerprint")),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        id_col="doc_id",
    )
    w = Window.partitionBy("fingerprint")
    marked = assigned.withColumn("fp_splits", F.size(F.collect_set("split").over(w)))
    return marked.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_fingerprints"),
        F.sum((F.col("fp_splits") > 1).cast("long")).alias("n_leaked_docs"),
    )


# ---------------------------------------------------------------------------
# ext_cdc_merge — changelog compaction (CDC apply, latest-wins + deletes)
# ---------------------------------------------------------------------------

_CDC_ORACLE = """
WITH ranked AS (
    SELECT user_id, event_type, value, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn,
           count(*)     OVER (PARTITION BY user_id)            AS n_changes
    FROM events
)
SELECT user_id,
       event_type                     AS last_type,
       round(value, 6)                AS last_value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       n_changes::BIGINT              AS n_changes
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
"""


@register("ext_cdc_merge", _CDC_ORACLE)
def ext_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction: collapse an append-only change stream to
    final state per key — latest row wins (ts, then event_id as the
    deterministic LSN tie-break), keys whose last operation is a delete
    (modeled by event_type='error') drop out entirely. The companion to
    ext_scd2_dim (which keeps history) and snk_upsert_write (which merges
    into a table): this is the read-side compaction a lakehouse MOR table
    does on every query.

    One window shuffle keyed by user_id carrying both the rank and the
    change count — at 100 TB this is the standard log-compaction shuffle,
    partitioned by key with no skew beyond key cardinality."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(wc))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.round("value", 6).alias("last_value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.col("n_changes").cast("long").alias("n_changes"),
        )
    )


# ---------------------------------------------------------------------------
# ext_bm25_search — keyword retrieval over the corpus
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "data", "query")
_K1, _BB = 1.2, 0.75

_BM25_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
    FROM documents
), dl AS (
    SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id
), stats AS (
    SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl
), tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf
    FROM toks WHERE term IN ('spark', 'data', 'query')
    GROUP BY doc_id, term
), df AS (
    SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
)
SELECT doc_id,
       round(sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({_K1} + 1.0)
           / (tf.tf + {_K1} * (1.0 - {_BB} + {_BB} * dl.dl / stats.avgdl))
       ), 6) AS bm25,
       count(*)::BIGINT AS n_terms_hit
FROM tf
JOIN df USING (term)
JOIN dl USING (doc_id)
CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


@register("ext_bm25_search", _BM25_ORACLE)
def ext_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (k1=1.2, b=0.75, the Robertson/Sparck Jones
    formula with the +1 idf floor): score every document for a 3-term query
    and return the top-20. The retrieval companion to ext_tfidf_topterms —
    what a corpus-scale search/RAG-recall stage runs before reranking.

    Scale shape: term stats (df) and corpus stats (N, avgdl) are tiny —
    both broadcast; the per-doc tf table joins doc-length on doc_id (one
    keyed shuffle of ONLY the docs containing query terms — the term
    filter prunes before any join); TakeOrderedAndProject for the top-20,
    never a full sort."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w",
            F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
            * F.col("tf") * (_K1 + 1.0)
            / (F.col("tf") + _K1 * (1.0 - _BB + _BB * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.round(F.sum("w"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


_DRIFT_ORACLE = r"""
WITH toks AS (
    SELECT lang = 'en' AS is_en, unnest(string_split_regex(trim(text), '\s+')) AS tok
    FROM documents
), a AS (
    SELECT tok, count(*)::DOUBLE AS c FROM toks WHERE is_en GROUP BY tok
), b AS (
    SELECT tok, count(*)::DOUBLE AS c FROM toks WHERE NOT is_en GROUP BY tok
), tot AS (
    SELECT (SELECT sum(c) FROM a) AS na, (SELECT sum(c) FROM b) AS nb
), j AS (
    SELECT coalesce(a.c, 0.0) / tot.na AS p,
           coalesce(b.c, 0.0) / tot.nb AS q
    FROM a FULL OUTER JOIN b USING (tok) CROSS JOIN tot
)
SELECT (SELECT count(*) FROM a)::BIGINT AS vocab_en,
       (SELECT count(*) FROM b)::BIGINT AS vocab_other,
       (SELECT count(*) FROM j)::BIGINT AS vocab_union,
       round(sum(CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END)
             + sum(CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END),
             6) AS js_divergence
FROM j
"""


@register("ext_token_drift", _DRIFT_ORACLE)
def ext_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift between two corpus slices (en vs non-en)
    as Jensen-Shannon divergence — the distribution-shift monitor a
    training pipeline runs between crawl snapshots or data sources before
    mixing them (JS rather than KL because disjoint-support tokens
    contribute finite mass instead of blowing up, so no smoothing
    hyperparameter enters the number).

    Scale shape: token fan-out is a scan-stage explode; each slice
    collapses to its vocabulary by one hash-agg (map-side combine eats the
    Zipf head); the FULL OUTER join and the final sum run at VOCAB grain —
    thousands of rows however big the corpus — and the two slice totals
    broadcast as 1-row literals. The JS sum is a distributive aggregate;
    both engines reduce the identical per-token doubles, 6dp absorbs
    association order."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("lang") == "en").alias("is_en"),
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    )
    a = toks.filter("is_en").groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("ca")
    )
    b = toks.filter(~F.col("is_en")).groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("cb")
    )
    na = a.agg(F.sum("ca").alias("na"))
    nb = b.agg(F.sum("cb").alias("nb"))
    j = (
        a.join(b, "tok", "full_outer")
        .join(F.broadcast(na))
        .join(F.broadcast(nb))
        .select(
            (F.coalesce("ca", F.lit(0.0)) / F.col("na")).alias("p"),
            (F.coalesce("cb", F.lit(0.0)) / F.col("nb")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    js = F.sum(
        F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m)).otherwise(
            0.0
        )
    ) + F.sum(
        F.when(F.col("q") > 0, 0.5 * F.col("q") * F.log(F.col("q") / m)).otherwise(
            0.0
        )
    )
    stats = j.agg(
        F.count(F.lit(1)).alias("vocab_union"), F.round(js, 6).alias("js_divergence")
    )
    va = a.agg(F.count(F.lit(1)).alias("vocab_en"))
    vb = b.agg(F.count(F.lit(1)).alias("vocab_other"))
    return va.join(vb).join(stats).select(
        "vocab_en", "vocab_other", "vocab_union", "js_divergence"
    )
