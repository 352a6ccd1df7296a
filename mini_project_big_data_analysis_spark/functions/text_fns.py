"""Text-analysis column functions (training-data pipeline layer).

Not present in the reference (its only text handling is a description-string
passthrough, consumer.py:45); these are the north-star text operators:
language-ID, quality scoring, token counting, fingerprinting. All built-ins —
pure Catalyst expressions, whole-stage-codegen friendly, no Python UDFs —
so they run at scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
# Deliberately small: language ID at pipeline scale is a cheap prefilter, not
# a model. Tokens must be lowercase single words.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "en", "por"),
}

#: BPE-ish token pattern: word pieces, digit runs, or single punctuation.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_tokens(text: Column | str) -> Column:
    """Whitespace tokenization — the unit for jaccard/shingles/ratios."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(text))


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish token count: counts word/digit/punct pieces via regexp_count —
    a codegen'd native expression, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(TOKEN_REGEX))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    toks = whitespace_tokens(text)
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, F.lower(t))))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars."""
    c = F.col(text) if isinstance(text, str) else text
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return punct / F.greatest(F.length(c), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite document-quality score in [0, 1]: rewards reasonable length,
    low punctuation density, and presence of common-word glue. The exact
    blend is a heuristic; what matters is it is a pure column expression.
    """
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c).cast("double")
    length_term = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(c, "en") * 5.0, F.lit(1.0))
    return F.round((length_term + punct_term + stop_term) / 3.0, 6)


def language_id(text: Column | str) -> Column:
    """Heuristic language ID: the language whose stopword-hit-rate is highest;
    'und' (undetermined) when nothing hits.

    NOTE: as a single Column this inlines every stopword_ratio into one
    expression tree (the chained when() repeats best_score at every level —
    ~74 split() calls per row in the optimized plan). Fine for ad-hoc use on
    small frames; for a corpus-scale pass use :func:`with_lang_quality`,
    which stages the tokenization so it runs once per row.
    """
    scores = [(lang, stopword_ratio(text, lang)) for lang in STOPWORDS]
    # greatest-of via chained when(): deterministic tie-break by dict order.
    best_score = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, score in reversed(scores):
        expr = F.when((best_score > 0) & (score == best_score), F.lit(lang)).otherwise(expr)
    return expr


def _contains(arr: Column):
    # single-param lambda from a factory: a two-param lambda would receive
    # the ARRAY INDEX as its second argument (PySpark higher-order contract)
    return lambda t: F.array_contains(arr, t)


def with_lang_quality(
    df,
    text_col: str = "text",
    lang_out: str = "lang_guess",
    quality_out: str = "quality",
):
    """Corpus-scale language-ID + quality score: adds ``lang_out`` and
    ``quality_out`` columns to ``df``.

    Same semantics as ``language_id`` + ``quality_score`` (identical results,
    same tie-break order) but staged across projections so the token array is
    computed ONCE per row: split+lower → per-language hit counts → ratios →
    arg-max. Catalyst's CollapseProject keeps the stages separate because
    the token array is referenced many times, so the optimized plan contains
    a single split() — vs ~74 when the scalar Columns are inlined into one
    select. The narrow all-projection pipeline still fuses into one stage:
    this is a strictly smaller expression tree, not extra passes over the
    data.

    Membership testing is a single token→language-bitmask map lookup per
    token (round 16): the per-language ``array_contains`` filters scanned
    every token against every language's stopword list (|langs| × |stops|
    string comparisons per token), where one hash lookup plus |langs| cheap
    integer-mask passes over the (tiny) matched-tag array computes the same
    hit counts — a bitmask rather than a token→lang map because stopwords
    overlap across languages ("la" is French AND Spanish; a last-wins map
    would undercount one of them). Measured at sf0.1: 0.467 → 0.344 s for
    the ext_lang_quality frame, byte-identical output.
    """
    langs = list(STOPWORDS)
    mask: dict[str, int] = {}
    for i, words in enumerate(STOPWORDS.values()):
        for w in words:
            mask[w] = mask.get(w, 0) | (1 << i)
    tag_map = F.create_map(*[x for w, v in mask.items() for x in (F.lit(w), F.lit(v))])
    base = list(df.columns)
    toks = F.transform(whitespace_tokens(text_col), lambda t: F.lower(t))
    s1 = df.select(*base, toks.alias("__toks"))
    # stage the matched-tag array so the map transform runs once per row
    # (referenced |langs| times below — CollapseProject keeps the stage)
    s1b = s1.select(
        *base,
        F.size("__toks").alias("__n"),
        F.filter(
            F.transform(F.col("__toks"), lambda t: tag_map[t]),
            lambda x: x.isNotNull(),
        ).alias("__tags"),
    )
    def _has_bit(bit: int):
        # single-param lambda from a factory (the _contains rule): a
        # defaulted second parameter would make the HOF pass the array
        # INDEX as that argument
        return lambda x: x.bitwiseAND(F.lit(bit)) != 0

    s2 = s1b.select(
        *base,
        "__n",
        *[
            F.size(F.filter(F.col("__tags"), _has_bit(1 << i))).alias(
                f"__hits_{lang}"
            )
            for i, lang in enumerate(langs)
        ],
    )
    s3 = s2.select(
        *base,
        *[
            (F.col(f"__hits_{lang}") / F.greatest(F.col("__n"), F.lit(1))).alias(
                f"__r_{lang}"
            )
            for lang in langs
        ],
    )
    s4 = s3.select(
        *base,
        *[f"__r_{lang}" for lang in langs],
        F.greatest(*[F.col(f"__r_{lang}") for lang in langs]).alias("__best"),
    )
    guess = F.lit("und")
    for lang in reversed(langs):
        guess = F.when(
            (F.col("__best") > 0) & (F.col(f"__r_{lang}") == F.col("__best")),
            F.lit(lang),
        ).otherwise(guess)
    c = F.col(text_col)
    nchars = F.length(c).cast("double")
    length_term = F.least(nchars / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    stop_term = F.least(F.col("__r_en") * 5.0, F.lit(1.0))
    quality = F.round((length_term + punct_term + stop_term) / 3.0, 6)
    return s4.select(*base, guess.alias(lang_out), quality.alias(quality_out))


def normalized_fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of casefolded, punctuation-stripped,
    whitespace-collapsed text. Two docs with the same fingerprint are
    duplicates up to formatting — the cheap first pass of a dedup pipeline.
    """
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), r"[^\w\s]", " "), r"\s+", " ")
    )
    return F.md5(normalized)


def shingles_from_tokens(toks: Column | str, k: int = 3) -> Column:
    """k-word shingles from an ALREADY-MATERIALIZED token-array column.

    Prefer this over :func:`word_shingles` whenever the caller can stage the
    tokenization in its own ``select`` first: this expression references the
    token array k+2 times (size, sequence bound, k lookups), and if ``toks``
    is an inline ``split(...)`` Catalyst re-evaluates the whole split at
    EVERY reference — each gram then re-splits the entire document, turning
    the explode quadratic in document length (measured live on
    ext_decontaminate: 9 s and wildly GC-variant vs sub-second staged; the
    same multiply-referenced-subexpression trap as the round-2
    lang-quality fix). A staged token column is a cheap attribute
    reference, and CollapseProject keeps the staging select separate
    because the expression is non-cheap and multiply referenced.

    Texts with fewer than ``k`` tokens yield an empty array: ``sequence(1, n-k+1)``
    would *descend* when ``n < k`` (ANSI element_at then throws on index 0/past-end),
    so the index range is guarded with ``when(n >= k, ...)`` and the lookups use
    ``try_element_at`` as a second line of defense.
    """
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, (i + j).cast("int")) for j in range(k)]
        ),
    )


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles as an array<string> — the unit for MinHash/Jaccard.

    Expressed with sequence+transform over the token array (no explode at
    this layer, so callers control when the row-multiplying explode happens).
    NOTE: inlines the tokenization into every reference — fine for one-shot
    scalar use, but hot explode paths should stage ``whitespace_tokens`` in
    a select and call :func:`shingles_from_tokens` (see its docstring).
    """
    return shingles_from_tokens(whitespace_tokens(text), k)


def winnow_fingerprints(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
):
    """Rolling-hash document fingerprinting by winnowing (Schleimer,
    Wilkerson & Aiken 2003, SIGMOD — the public MOSS algorithm): hash every
    ``k``-char gram, slide a ``w``-hash window over the sequence, keep each
    window's minimum hash, dedupe. Two documents sharing ≥1 fingerprint
    share a verbatim ``k``-char run; unlike ``normalized_fingerprint`` this
    localizes *partial* overlap (plagiarism/containment), not whole-doc
    equality.

    Relational plan: posexplode the gram positions, codegen'd md5 per gram,
    per-document ROWS-frame window min, distinct. One shuffle keyed on
    ``id_col`` whose skew is bounded by max document length. (An in-row
    variant — array_min over transform/slice — avoids even that shuffle but
    forfeits whole-stage codegen for the md5 loop; explode+window measured
    faster and is the scale default.) The gram hash is the first 8 hex chars
    of md5 so an ANSI-SQL oracle reproduces it byte-for-byte.

    Documents with fewer than ``k + w - 1`` chars produce no fingerprints
    (no complete window exists) — guarded against Spark's descending
    ``sequence(1, 0)`` surprise.

    Returns distinct (id_col, fingerprint) rows.
    """
    from pyspark.sql.window import Window

    t = F.col(text_col)
    n_grams = (F.length(t) - F.lit(k - 1)).alias("n_grams")
    positions = F.when(
        F.length(t) >= k, F.sequence(F.lit(1), F.length(t) - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    # Hash-distribute docs BEFORE the gram explode: a single-file scan is one
    # partition, which would run every md5 on one core — and the window below
    # requires hash(id_col) distribution anyway, so this shuffle replaces the
    # window's Exchange rather than adding one (the md5 work is what moves
    # off the single core).
    spark = df.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    df = df.repartition(n_parts, id_col)
    grams = df.select(
        id_col,
        t.alias("__t"),
        n_grams,
        F.posexplode(positions).alias("__pos", "i"),
    )
    hashed = grams.select(
        id_col,
        "n_grams",
        "i",
        F.substring(
            F.md5(F.col("__t").substr(F.col("i"), F.lit(k))), 1, 8
        ).alias("h"),
    )
    win = Window.partitionBy(id_col).orderBy("i").rowsBetween(0, w - 1)
    return (
        hashed.withColumn("fingerprint", F.min("h").over(win))
        .filter(F.col("i") <= F.col("n_grams") - F.lit(w - 1))
        .select(id_col, "fingerprint")
        .distinct()
    )


def compression_ratio_udf():
    """Arrow-vectorized ``string -> double``: deflate(level 6) bytes over
    raw utf-8 bytes. The classic repetition/noise quality signal — cheap,
    language-agnostic, and deterministic for a fixed zlib. Batched through
    Arrow so Python overhead is per-batch, and zlib.compress releases the
    GIL (batches compress concurrently across executor threads)."""
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def ratios(texts):
        out = []
        for t in texts:
            if not t:
                out.append(None)
                continue
            raw = t.encode("utf-8")
            out.append(len(zlib.compress(raw, 6)) / len(raw))
        return pd.Series(out, dtype="float64")

    return pandas_udf(ratios, "double")
