r"""Round-6 corpus-audit queries (SURVEY.md §2.9h): domain-mix audit,
perplexity-tercile bucketing, BPE-style pre-tokenizer counting, and
binary-payload (multimodal) exact near-dup clustering.

These are the reporting/QA surface a training-data pipeline runs after the
cleaning tiers (§2.9a-2.9g): what domains feed the corpus, how the
LM-quality mass is distributed, what the token budget looks like under a
subword pre-tokenizer, and which media payloads are byte-identical copies.
The reference stops at city-level weather aggregation (app.py:101-153), so
this family derives from the north-star extension charter, not reference
behavior. Every formula is a pure column expression mirrored in the DuckDB
oracle; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import distributed_global_rank, exact_ntile
from .base import load, register

# ---------------------------------------------------------------------------
# ext_domain_stats — corpus mix by registered domain
# ---------------------------------------------------------------------------

# The fixture corpus carries no URLs (same situation as ext_dedup_url,
# ext_corpus_q.py): a deterministic messy host is synthesized per doc —
# rotating subdomain prefix, mixed-case label — and both engines reduce it
# to the registered domain independently, so agreement proves the
# extraction+aggregation, not the synthesis.
_HOST_MESSY = """
    (CASE WHEN doc_id % 3 = 0 THEN 'www.' WHEN doc_id % 3 = 1 THEN 'cdn.'
          ELSE '' END)
    || (CASE WHEN doc_id % 4 = 0 THEN upper(source) ELSE source END)
    || '.example.com'
"""

_DOMAIN_ORACLE = rf"""
WITH hosts AS (
    SELECT doc_id, lang, n_chars, lower({_HOST_MESSY}) AS host FROM documents
), reg AS (
    SELECT doc_id, lang, n_chars,
           regexp_extract(host, '([^.]+\.example\.com)$', 1) AS domain
    FROM hosts
), tot AS (
    SELECT count(*)::BIGINT AS n FROM reg
)
SELECT domain,
       count(*)::BIGINT                 AS n_docs,
       count(DISTINCT lang)::BIGINT     AS n_langs,
       round(avg(n_chars), 4)           AS avg_chars,
       round(100.0 * count(*) / any_value(tot.n), 4) AS share_pct
FROM reg CROSS JOIN tot
GROUP BY domain
"""


@register("ext_domain_stats", _DOMAIN_ORACLE)
def ext_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix audit: reduce each doc's (synthesized messy) host to its
    registered domain — case-fold, strip serving subdomains (www/cdn) by
    anchoring on the public suffix — then report per-domain doc count,
    language diversity, mean length, and corpus share. This is the first
    table a corpus datasheet shows, and the input to per-domain sampling
    weights (ext_dataset_mix).

    Scale shape: row-local lower/regexp, one hash-agg on domain, the
    corpus total as a broadcast 1-row cross join. Domain cardinality is
    tiny relative to docs, so map-side partials collapse almost
    everything before the shuffle."""
    docs = load(spark, sf_dir, "documents")
    host = F.lower(
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.lit("www."))
            .when(F.col("doc_id") % 3 == 1, F.lit("cdn."))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 4 == 0, F.upper("source")).otherwise(
                F.col("source")
            ),
            F.lit(".example.com"),
        )
    )
    reg = docs.select(
        F.regexp_extract(host, r"([^.]+\.example\.com)$", 1).alias("domain"),
        "lang",
        "n_chars",
    )
    total = reg.agg(F.count(F.lit(1)).alias("n"))
    return (
        reg.crossJoin(F.broadcast(total))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(100.0 * F.count(F.lit(1)) / F.first("n"), 4).alias("share_pct"),
        )
    )


# ---------------------------------------------------------------------------
# ext_perplexity_buckets — head/middle/tail quality terciles under the
# corpus's own unigram LM (the CCNet-style bucketing)
# ---------------------------------------------------------------------------

_PPL_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
    FROM documents
), vocab AS (
    SELECT token, count(*)::BIGINT AS c FROM toks GROUP BY token
), total AS (
    SELECT sum(c)::BIGINT AS n FROM vocab
), scored AS (
    SELECT t.doc_id,
           round(avg(ln(v.c)) - any_value(ln(total.n)), 6) AS avg_logprob
    FROM toks t JOIN vocab v USING (token) CROSS JOIN total
    GROUP BY t.doc_id
), bucketed AS (
    SELECT doc_id, avg_logprob,
           ntile(3) OVER (ORDER BY avg_logprob DESC, doc_id) AS bucket
    FROM scored
)
SELECT bucket,
       count(*)::BIGINT            AS n_docs,
       round(avg(avg_logprob), 6)  AS bucket_avg_lp,
       round(min(avg_logprob), 6)  AS bucket_min_lp
FROM bucketed
GROUP BY bucket
"""


@register("ext_perplexity_buckets", _PPL_ORACLE)
def ext_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing: score every doc with the cheap
    perplexity proxy (mean token log-prob under the corpus's own unigram
    LM — same scoring as ext_unigram_logprob, ext_corpus_q.py), then cut
    the corpus into head/middle/tail terciles by score. Training mixes
    keep the head, downsample the middle, drop the tail.

    Determinism across engines: docs are ranked by the ROUNDED score
    (round-6 values hash-match between Spark and DuckDB — proven by
    ext_unigram_logprob's green oracle) with doc_id as tie-break, so
    tercile membership is a total order both engines agree on.

    Scale shape: the LM scoring is the unigram plan (token agg + skewed
    equi-join left to AQE). The tercile cut is the one genuinely global
    operation, and a bare ``ntile(3).over(Window.orderBy(...))`` would
    plan as Exchange SinglePartition + one WindowExec task over every
    doc-grain row (the round-7 verdict caught exactly this) — so the rank
    comes from ``distributed_global_rank`` (value-derived quantile
    buckets + bucket-local row_number + in-plan offsets, the gini recipe)
    and ntile(3) is then row-local integer arithmetic on (rank, n) via
    ``exact_ntile`` — bit-identical to the single-window spelling, no
    single-reducer stage anywhere in the plan."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    scored = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log("c")) - F.first(F.log("n")), 6).alias("avg_logprob")
        )
    )
    ranked = distributed_global_rank(
        scored.withColumn("neg_lp", -F.col("avg_logprob")),
        "neg_lp",
        ["doc_id"],
    )
    return (
        ranked.withColumn("bucket", exact_ntile("gr_i", "gr_n", 3))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("avg_logprob"), 6).alias("bucket_avg_lp"),
            F.round(F.min("avg_logprob"), 6).alias("bucket_min_lp"),
        )
    )


# ---------------------------------------------------------------------------
# ext_token_regex_count — subword-style pre-tokenizer budget counting
# ---------------------------------------------------------------------------

# GPT-2-ish pre-tokenizer, reduced to a class set whose semantics are
# identical in Java regex (Spark) and RE2 (DuckDB): letter runs, single
# digits, single non-alphanumeric marks. \s is deliberately avoided —
# Java's \s includes \x0B, RE2's does not.
_BPE_PAT = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\r]"

_TOKCOUNT_ORACLE = rf"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_PAT}'))::BIGINT AS n_bpe_tokens,
       round(n_chars / greatest(len(regexp_extract_all(text, '{_BPE_PAT}')), 1), 4)
           AS chars_per_token
FROM documents
"""


@register("ext_token_regex_count", _TOKCOUNT_ORACLE)
def ext_token_regex_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget counting under a BPE-style pre-tokenizer: per doc, the
    whitespace token count, the subword-pretokenizer match count (letter
    runs / single digits / single punctuation — the GPT-2 pattern family),
    and chars-per-token (the compression proxy used to spot
    non-linguistic content: code and tables run low, CJK runs high).

    Pure codegen: split + regexp_extract_all + size, no shuffle at all —
    the per-doc token budget is the cheapest full-corpus pass there is,
    which is why real pipelines attach it to every scan."""
    docs = load(spark, sf_dir, "documents")
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0)))
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_ws_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        F.round(F.col("n_chars") / F.greatest(n_bpe, F.lit(1)), 4).alias(
            "chars_per_token"
        ),
    )


# ---------------------------------------------------------------------------
# ext_multimodal_phash_dedup — byte-identical media payload clustering
# ---------------------------------------------------------------------------

#: perceptual-hash window: the leading bytes of the payload stand in for
#: pHash's fixed-size downsample (a real pHash resizes the decoded image to
#: a fixed raster first, then hashes — same shape: reduce, then digest).
_PHASH_WINDOW = 64

_PHASH_ORACLE = f"""
WITH hashed AS (
    -- DuckDB's md5 takes VARCHAR and digests its utf-8 bytes; the fixture
    -- corpus is pure ASCII so substr-by-chars ≡ substr-by-bytes and the
    -- digest agrees with Spark's md5 over the binary payload slice.
    SELECT doc_id,
           substr(md5(substr(text, 1, {_PHASH_WINDOW})), 1, 16) AS phash,
           octet_length(encode(text)) AS nb
    FROM documents
)
SELECT phash,
       count(*)::BIGINT AS n_copies,
       min(doc_id)      AS keeper_doc_id,
       sum(nb)::BIGINT  AS cluster_bytes
FROM hashed
GROUP BY phash
HAVING count(*) >= 2
"""


@register("ext_multimodal_phash_dedup", _PHASH_ORACLE)
def ext_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-payload near-dup clustering over the BINARY column, the
    perceptual-hash shape: REDUCE each payload to a fixed-size window
    (a real pHash decodes and resizes to a fixed raster; here the leading
    64 payload bytes are the deterministic stand-in this container's lack
    of codecs forces), DIGEST the reduction, then cluster payloads whose
    digests collide — reporting copies, keeper, and reclaimable bytes.
    The fixture's near-duplicate docs share long prefixes, so the window
    hash groups them the way a pHash groups re-encoded images.

    Runs on the attach_binary_payload ingestion shape
    (operators/multimodal.py:59 — payload = utf-8 bytes of text), so the
    oracle mirrors the digest via md5 of the text prefix.

    Scale shape: reduce+digest is row-local (the payload never shuffles —
    only the 16-char digest does), then one hash-agg on the digest. This
    is why media dedup is always hash-first: the shuffle carries ~32
    bytes/row regardless of payload size."""
    from ..operators.multimodal import attach_binary_payload

    media = attach_binary_payload(load(spark, sf_dir, "documents"))
    hashed = media.select(
        "doc_id",
        F.substring(
            F.md5(F.expr(f"substring(payload, 1, {_PHASH_WINDOW})")), 1, 16
        ).alias("phash"),
        F.octet_length("payload").alias("nb"),
    )
    return (
        hashed.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.sum("nb").cast("long").alias("cluster_bytes"),
        )
        .filter(F.col("n_copies") >= 2)
    )


# ---------------------------------------------------------------------------
# ext_ngram_novelty — memorization-risk audit (unique-trigram share per doc)
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), grams AS (
    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
    FROM toks, unnest(generate_series(1, len(t) - 2)) u(i)
), counts AS (
    SELECT g, count(*)::BIGINT AS c FROM grams GROUP BY g
)
SELECT doc_id,
       count(*)::BIGINT AS n_grams,
       round(avg(CASE WHEN c = 1 THEN 1.0 ELSE 0.0 END), 6) AS novelty
FROM grams JOIN counts USING (g)
GROUP BY doc_id
"""


@register("ext_ngram_novelty", _NOVELTY_ORACLE)
def ext_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-risk audit: per doc, the share of its word trigrams
    that occur nowhere else in the corpus (corpus count = 1). Docs whose
    trigrams are mostly shared are templated/duplicated content a model
    will memorize verbatim; high-novelty docs carry the information.
    The trigram grain is the same one decontamination (ext_decontaminate)
    and winnowing (ext_doc_winnow) key on.

    Scale shape: trigram fan-out is a narrow transform inside the scan
    stage; the corpus trigram count collapses via map-side partials
    before one hash-agg shuffle; then grams ⋈ counts is an equi-join on
    the gram (Zipf-skewed — AQE splits the hot reducers) and the per-doc
    verdict is a second hash-agg. No driver-side state at any point."""
    docs = load(spark, sf_dir, "documents")
    # project the token array FIRST so split() runs once per row — inlining
    # it into the transform lambda would re-tokenize per gram
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 3 THEN "
                "transform(sequence(0, size(t) - 3), "
                "i -> concat_ws(' ', t[i], t[i+1], t[i+2])) "
                "ELSE array() END"
            )
        ).alias("g"),
    )
    counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    return (
        grams.join(counts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.avg(F.when(F.col("c") == 1, 1.0).otherwise(0.0)), 6
            ).alias("novelty"),
        )
    )


_DQ_ORACLE = """
WITH a AS (
    SELECT count(*)::DOUBLE AS n_rows,
           count(o_custkey)::DOUBLE AS n_cust,
           count(DISTINCT o_orderkey)::DOUBLE AS n_keys,
           sum(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END)::DOUBLE AS n_nonneg,
           sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)::DOUBLE
               AS n_dom
    FROM orders
)
SELECT 'completeness_custkey' AS rule, round(n_cust / n_rows, 6) AS metric,
       n_cust / n_rows >= 0.99 AS passed FROM a
UNION ALL
SELECT 'uniqueness_orderkey', round(n_keys / n_rows, 6),
       n_keys / n_rows >= 1.0 FROM a
UNION ALL
SELECT 'nonneg_totalprice', round(n_nonneg / n_rows, 6),
       n_nonneg / n_rows >= 1.0 FROM a
UNION ALL
SELECT 'domain_orderstatus', round(n_dom / n_rows, 6),
       n_dom / n_rows >= 1.0 FROM a
UNION ALL
SELECT 'min_row_count', n_rows, n_rows >= 1000 FROM a
"""


@register("ext_dq_rules", _DQ_ORACLE)
def ext_dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint suite (the Deequ/Great-
    Expectations shape): five rules over the orders table — column
    completeness, key uniqueness, value-range share, categorical domain
    share, minimum row count — each reported as (rule, metric, passed).

    Scale shape: ALL rule metrics come from ONE full-scan aggregation (the
    Deequ trick — distributive/algebraic sketches share a single pass):
    counts and conditional sums collapse map-side; the only non-trivial
    metric, count(DISTINCT o_orderkey), Catalyst expands into the standard
    two-phase distinct-agg over the same shuffle. The 1-row result then
    fans out into rule rows via ``stack`` — driver cost is five literals.
    Checks run where the data is; nothing but verdict rows leaves the
    executors."""
    o = load(spark, sf_dir, "orders")
    a = o.agg(
        F.count(F.lit(1)).cast("double").alias("n_rows"),
        F.count("o_custkey").cast("double").alias("n_cust"),
        F.countDistinct("o_orderkey").cast("double").alias("n_keys"),
        F.sum(F.when(F.col("o_totalprice") >= 0, 1).otherwise(0))
        .cast("double")
        .alias("n_nonneg"),
        F.sum(F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0))
        .cast("double")
        .alias("n_dom"),
    )
    # nullif(n_rows, 0): a zero-row table has UNDEFINED ratio metrics —
    # NULL metric/verdict instead of an ANSI DIVIDE_BY_ZERO job failure
    # (min_row_count still reports 0/false). Identical on any non-empty
    # table, so oracle parity is untouched.
    return a.selectExpr(
        "stack(5, "
        "'completeness_custkey', round(n_cust / nullif(n_rows, 0.0), 6),"
        " n_cust / nullif(n_rows, 0.0) >= 0.99, "
        "'uniqueness_orderkey', round(n_keys / nullif(n_rows, 0.0), 6),"
        " n_keys / nullif(n_rows, 0.0) >= 1.0, "
        "'nonneg_totalprice', round(n_nonneg / nullif(n_rows, 0.0), 6),"
        " n_nonneg / nullif(n_rows, 0.0) >= 1.0, "
        "'domain_orderstatus', round(n_dom / nullif(n_rows, 0.0), 6),"
        " n_dom / nullif(n_rows, 0.0) >= 1.0, "
        "'min_row_count', n_rows, n_rows >= 1000.0"
        ") AS (rule, metric, passed)"
    )


_BENFORD_ORACLE = """
WITH digits AS (
    SELECT substr(CAST(floor(o_totalprice) AS BIGINT)::VARCHAR, 1, 1)::BIGINT
               AS d
    FROM orders WHERE o_totalprice >= 1
), counts AS (
    SELECT d, count(*)::DOUBLE AS n FROM digits GROUP BY d
), tot AS (SELECT sum(n) AS t FROM counts)
SELECT d AS leading_digit,
       n::BIGINT AS n_values,
       round(n / tot.t, 6) AS observed_p,
       round(log10(1.0 + 1.0 / d), 6) AS benford_p,
       round((n / tot.t - log10(1.0 + 1.0 / d))
             * (n / tot.t - log10(1.0 + 1.0 / d))
             / log10(1.0 + 1.0 / d) * tot.t, 6) AS chi2_term
FROM counts CROSS JOIN tot
"""


@register("ext_benford_audit", _BENFORD_ORACLE)
def ext_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: observed leading-digit
    shares against log10(1 + 1/d) with per-digit chi-square contributions
    — the forensic screen for fabricated or mis-generated monetary data
    (organic multiplicative amounts follow Benford; uniform generators —
    like this synthetic fixture — light up every digit's chi² term, which
    is itself a useful synthetic-data tell).

    Scale shape: the leading digit is row-local string arithmetic (no log
    rounding edge: floor→string→first char is exact); the distribution is
    a 9-row hash-agg with map-side combine; expectation and chi² terms
    are literals-on-aggregates. Nothing leaves the executors but 9
    rows."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    benford_p = F.log10(1.0 + 1.0 / F.col("d"))
    obs = F.col("n") / F.col("t")
    return counts.join(F.broadcast(tot)).select(
        F.col("d").alias("leading_digit"),
        F.col("n").cast("bigint").alias("n_values"),
        F.round(obs, 6).alias("observed_p"),
        F.round(benford_p, 6).alias("benford_p"),
        F.round(
            (obs - benford_p) * (obs - benford_p) / benford_p * F.col("t"), 6
        ).alias("chi2_term"),
    )
