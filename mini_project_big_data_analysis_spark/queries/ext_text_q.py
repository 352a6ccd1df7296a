r"""Text-analysis queries (SURVEY.md §2.9) over the documents table.

Everything here is a pure column expression (functions/text_fns.py) — no
UDFs — so the oracle can mirror each formula exactly: ratios are rationals
(int/int) that both engines evaluate identically in double precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text_fns
from .base import load, register

_STATS_ORACLE = r"""
SELECT doc_id,
       length(text)                                           AS n_chars_calc,
       len(string_split_regex(trim(text), '\s+'))             AS n_tokens_ws,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                                                              AS n_tokens_bpe,
       round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE
             / greatest(length(text), 1), 6)                  AS punct_ratio
FROM documents
"""


@register("ext_text_stats", _STATS_ORACLE)
def ext_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics: char length, whitespace tokens, BPE-ish
    tokens (regexp_count — codegen, no UDF), punctuation ratio."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        text_fns.token_count_ws("text").alias("n_tokens_ws"),
        text_fns.token_count_bpe("text").alias("n_tokens_bpe"),
        F.round(text_fns.punct_ratio("text"), 6).alias("punct_ratio"),
    )


def _stop_ratio_sql(lang_words: tuple[str, ...]) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in lang_words) + "]"
    return (
        r"len(list_filter(string_split_regex(trim(text), '\s+'),"
        f" t -> list_contains({lst}, lower(t))))::DOUBLE"
        r" / greatest(len(string_split_regex(trim(text), '\s+')), 1)"
    )


def _lang_oracle() -> str:
    ratios = {
        lang: _stop_ratio_sql(words) for lang, words in text_fns.STOPWORDS.items()
    }
    r_cols = ",\n    ".join(f"{expr} AS r_{lang}" for lang, expr in ratios.items())
    langs = list(text_fns.STOPWORDS)
    best = "greatest(" + ", ".join(f"r_{lang}" for lang in langs) + ")"
    # precedence = STOPWORDS dict order, matching text_fns.language_id
    case = "CASE " + " ".join(
        f"WHEN {best} > 0 AND r_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    return f"""
WITH scored AS (
  SELECT doc_id, lang, text,
    {r_cols}
  FROM documents
)
SELECT doc_id, lang,
       {case} AS lang_guess,
       round((least(length(text)::DOUBLE / 500.0, 1.0)
              + (1.0 - least(((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
                              / greatest(length(text), 1)) * 5.0, 1.0))
              + least(r_en * 5.0, 1.0)) / 3.0, 6) AS quality
FROM scored
"""


@register("ext_lang_quality", _lang_oracle())
def ext_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID (stopword-hit-rate heuristic) + composite quality score —
    the full formulas mirrored in SQL, including the tie-break order. Uses
    the staged ``with_lang_quality`` frame pass (tokens split once per row;
    the inlined scalar-Column form re-split the text ~74× and its oversized
    codegen unit ran 40× slower on the sf0.1 corpus)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return text_fns.with_lang_quality(docs).select(
        "doc_id", "lang", "lang_guess", "quality"
    )


@register(
    "ext_vocab_topk",
    r"""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
          FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 100
    """,
)
def ext_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-k: explode tokens → hash-agg count → top-100.
    Map-side partial aggregation collapses the token stream before the one
    shuffle; orderBy+limit compiles to TakeOrderedAndProject (no full sort)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(100)
    )


@register(
    "ext_doc_len_histogram",
    """
    SELECT least(CAST(floor(n_chars / 100.0) AS BIGINT), 9) AS bucket,
           count(*) AS n_docs,
           round(avg(n_chars), 6) AS avg_chars
    FROM documents
    GROUP BY 1
    """,
)
def ext_doc_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (100-char buckets, clamped at 9) — the
    standard quality-filter diagnostic for a training corpus."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 100.0).cast("long"), F.lit(9).cast("long"))
    return docs.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


@register(
    "ext_pii_scrub",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[0-9]+'))                     AS n_num_spans,
           md5(regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '[0-9]+', '<NUM>', 'g'))                              AS redacted_md5,
           length(regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '[0-9]+', '<NUM>', 'g'))                              AS redacted_len
    FROM documents
    """,
)
def ext_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: email/number spans replaced with
    typed placeholders — pure codegen'd regexp_replace, verified via md5 of
    the redacted text (so the oracle checks the full output string without
    hauling it through the comparator)."""
    docs = load(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    redacted = F.regexp_replace(
        F.regexp_replace("text", email, "<EMAIL>"), r"[0-9]+", "<NUM>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"[0-9]+")).alias("n_num_spans"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).alias("redacted_len"),
    )


@register(
    "ext_json_props",
    """
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT)           AS k,
           CAST(props->>'$.k' AS BIGINT) % 10       AS k_mod,
           CASE WHEN CAST(props->>'$.k' AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END          AS k_band
    FROM events
    """,
)
def ext_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from a JSON string column (events.props) plus
    derived columns — the schema-on-read boundary made columnar."""
    ev = load(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT").getField("k")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_mod"),
        F.when(k >= 50, F.lit("high")).otherwise(F.lit("low")).alias("k_band"),
    )


_URL_ORACLE = """
    WITH urls AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
               || '://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&v=2' AS url
        FROM documents
    )
    SELECT doc_id,
           url,
           regexp_extract(url, '^([a-z]+)://', 1)            AS scheme,
           regexp_extract(url, '^[a-z]+://([^/:?]+)', 1)     AS host,
           regexp_extract(url, '^[a-z]+://[^/?]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1)        AS lang_param
    FROM urls
"""


@register("fn_url_extract", _URL_ORACLE)
def fn_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL structure extraction (provenance bucketing by host, dedup by
    normalized path — crawl-pipeline staples) via Spark's codegen'd
    ``parse_url``. The fixture corpus carries no URLs, so the query derives
    a deterministic one per doc first; the oracle rebuilds the same string
    and extracts with RE2 — agreeing outputs prove parse_url's
    HOST/PATH/QUERY semantics against an independent implementation."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https")).otherwise(F.lit("http")),
        F.lit("://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


_WINNOW_ORACLE = r"""
    WITH pos AS (
        SELECT doc_id, text, len(text) - 7 AS n_grams,
               unnest(generate_series(1, greatest(len(text) - 7, 0))) AS i
        FROM documents
    ), grams AS (
        SELECT doc_id, n_grams, i,
               substr(md5(substr(text, i::INT, 8)), 1, 8) AS h
        FROM pos
    ), wins AS (
        SELECT doc_id, n_grams, i,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                   AS fingerprint
        FROM grams
    )
    SELECT DISTINCT doc_id, fingerprint FROM wins WHERE i <= n_grams - 3
"""


@register("ext_doc_winnow", _WINNOW_ORACLE)
def ext_doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (k=8-char grams,
    w=4 window, MOSS-style): distinct (doc_id, fingerprint). STRONG oracle
    — gram hashes are md5 prefixes, reproduced byte-for-byte in SQL."""
    docs = load(spark, sf_dir, "documents")
    return text_fns.winnow_fingerprints(docs, k=8, w=4)


_TFIDF_ORACLE = r"""
    WITH words AS (
        SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS word
        FROM documents
    ), tf AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS word
        FROM documents
    ), tf_counts AS (
        SELECT doc_id, word, count(*) AS tf FROM tf GROUP BY doc_id, word
    ), df_counts AS (
        SELECT word, count(*) AS df FROM words GROUP BY word
    ), n_docs AS (
        SELECT count(*) AS n FROM documents
    ), scored AS (
        SELECT t.doc_id, t.word,
               round(t.tf * ln(n.n::DOUBLE / d.df), 6) AS tfidf,
               row_number() OVER (PARTITION BY t.doc_id
                                  ORDER BY t.tf * ln(n.n::DOUBLE / d.df) DESC, t.word)
                   AS rnk
        FROM tf_counts t
        JOIN df_counts d USING (word)
        CROSS JOIN n_docs n
    )
    SELECT doc_id, word, tfidf, CAST(rnk AS INT) AS rnk
    FROM scored WHERE rnk <= 3
"""


@register("ext_tfidf_topterms", _TFIDF_ORACLE)
def ext_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF — the classic
    keyword/topic signal for corpus exploration and near-dup triage.

    Dataflow: one explode of the token stream feeds BOTH the per-doc term
    frequencies and (via distinct doc-word pairs) the document frequencies
    — two hash-aggs off a shared scan; the tiny (1-row) corpus count and
    the df table join back by word (AQE broadcasts df when it fits); the
    per-doc top-3 is a bounded window. The word ties break
    lexicographically so both engines rank identically."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = (
        words.distinct().groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df_counts, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf_raw",
            F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_raw"), F.asc("word"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "word",
            F.round("tfidf_raw", 6).alias("tfidf"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


_REPETITION_ORACLE = r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ), big AS (
        SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram
        FROM toks, unnest(generate_series(1, len(t) - 1)) AS s(i)
        WHERE len(t) >= 2
    ), counts AS (
        SELECT doc_id, bigram, count(*) AS c FROM big GROUP BY doc_id, bigram
    )
    SELECT doc_id,
           sum(c)::BIGINT AS n_bigrams,
           round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_frac
    FROM counts GROUP BY doc_id
"""


@register("ext_repetition_stats", _REPETITION_ORACLE)
def ext_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection (the Gopher/MassiveText duplicate-n-gram rule):
    fraction of a document's bigrams taken by its single most frequent
    bigram — high values flag boilerplate/spam for corpus filtering.

    Bigrams come from zip_with(tokens, shift-by-one) — row-local, no join —
    then two hash-aggs: (doc, bigram) counts, then per-doc max/sum. Both
    shuffles key on doc_id(+bigram), partial aggregation map-side; skew
    bounded by max document length."""
    docs = load(spark, sf_dir, "documents")
    docs = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("tk"))
    toks = F.col("tk")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        docs.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_bigram_frac"),
    )


_GATE_ORACLE = r"""
    WITH m AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_words,
               round(length(replace(text, ' ', ''))::DOUBLE
                     / greatest(len(string_split_regex(trim(text), '\s+')), 1), 6)
                   AS mean_word_len,
               round(len(list_filter(string_split_regex(trim(text), '\s+'),
                                     w -> regexp_full_match(w, '[A-Za-z]+')))::DOUBLE
                     / greatest(len(string_split_regex(trim(text), '\s+')), 1), 6)
                   AS alpha_frac
        FROM documents
    )
    SELECT doc_id, n_words, mean_word_len, alpha_frac,
           (n_words BETWEEN 10 AND 100000
            AND mean_word_len BETWEEN 2.0 AND 12.0
            AND alpha_frac >= 0.6) AS passes
    FROM m
"""


@register("ext_quality_gate", _GATE_ORACLE)
def ext_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style corpus quality gate: word-count bounds, mean word
    length bounds, alphabetic-word fraction — the standard pre-training
    document filter, as pure column expressions over ONE token split
    (staged select so the split isn't re-inlined per metric; cf. the
    ext_lang_quality plan lesson). Emits the metrics plus the boolean
    verdict so downstream can either filter or audit."""
    docs = load(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.split(F.trim(F.col("text")), r"\s+").alias("toks"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("n_nonspace"),
    )
    n_words = F.greatest(F.size("toks"), F.lit(1))
    metrics = staged.select(
        "doc_id",
        F.size("toks").alias("n_words"),
        F.round(F.col("n_nonspace").cast("double") / n_words, 6).alias(
            "mean_word_len"
        ),
        F.round(
            F.size(F.filter("toks", lambda w: w.rlike("^[A-Za-z]+$"))).cast("double")
            / n_words,
            6,
        ).alias("alpha_frac"),
    )
    return metrics.select(
        "*",
        (
            F.col("n_words").between(10, 100000)
            & F.col("mean_word_len").between(2.0, 12.0)
            & (F.col("alpha_frac") >= 0.6)
        ).alias("passes"),
    )


@register("ext_compression_ratio", None)  # rows-only: no zlib in ANSI SQL
def ext_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal (CCNet/RefinedWeb style): highly
    compressible text is repetitive boilerplate; near-incompressible text
    is noise/binary junk. deflate-level-6 ratio per doc via an Arrow
    pandas_udf (vectorized batches; zlib releases the GIL). Inequality
    semantics pinned in pytest (repetitive < natural < random); rows-only
    driver check — DuckDB has no deflate."""
    docs = load(spark, sf_dir, "documents")
    ratio = text_fns.compression_ratio_udf()
    spread = docs.repartition(
        max(spark.sparkContext.defaultParallelism, 8), "doc_id"
    )
    return spread.select(
        "doc_id",
        F.round(ratio(F.col("text")), 4).alias("comp_ratio"),
    ).withColumn("is_repetitive", F.col("comp_ratio") < 0.35)


def _confusion_oracle() -> str:
    ratios = {
        lang: _stop_ratio_sql(words) for lang, words in text_fns.STOPWORDS.items()
    }
    r_cols = ",\n    ".join(f"{expr} AS r_{lang}" for lang, expr in ratios.items())
    langs = list(text_fns.STOPWORDS)
    best = "greatest(" + ", ".join(f"r_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN {best} > 0 AND r_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    return f"""
WITH scored AS (
  SELECT doc_id, lang, text,
    {r_cols}
  FROM documents
), guessed AS (
  SELECT lang AS declared, {case} AS detected FROM scored
)
SELECT declared, detected,
       count(*)::BIGINT AS n_docs,
       round(count(*)::DOUBLE
             / sum(count(*)) OVER (PARTITION BY declared), 6) AS row_share
FROM guessed
GROUP BY declared, detected
"""


@register("ext_lang_confusion", _confusion_oracle())
def ext_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language CONFUSION MATRIX — the metadata-trust
    audit run before using crawl-declared language tags as training labels
    (a strong diagonal ⇒ the tags are usable; off-diagonal mass shows
    which declared languages are actually mislabeled or code-mixed). Rows
    carry within-declared-language shares so each matrix row reads as a
    distribution.

    Scale shape: detection is the staged one-pass lang-ID frame
    (with_lang_quality — tokens split once per row), the matrix is one
    (declared, detected) hash-agg bounded by |langs|² rows, and the row
    shares re-aggregate the collapsed matrix with a tiny window — nothing
    after the scan touches document grain twice."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    guessed = text_fns.with_lang_quality(docs).select(
        F.col("lang").alias("declared"), F.col("lang_guess").alias("detected")
    )
    cells = guessed.groupBy("declared", "detected").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("declared")
    return cells.select(
        "declared",
        "detected",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6
        ).alias("row_share"),
    )
