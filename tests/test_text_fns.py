"""Text-function unit tests, including the round-1 crash regression
(word_shingles on texts shorter than k, ADVICE.md item 1)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mini_project_big_data_analysis_spark.functions import text_fns


def _texts(spark, *rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "id long, text string")


def test_word_shingles_short_texts_yield_empty(spark):
    # regression: sequence(1, n-k+1) descended for n < k and element_at threw
    df = _texts(spark, "", "one", "two words", "exactly three tokens")
    out = df.select(text_fns.word_shingles("text", 3).alias("s")).collect()
    assert [r.s for r in out] == [[], [], [], ["exactly three tokens"]]


def test_word_shingles_normal(spark):
    df = _texts(spark, "a b c d")
    out = df.select(text_fns.word_shingles("text", 2).alias("s")).collect()
    assert out[0].s == ["a b", "b c", "c d"]


def test_token_counts(spark):
    df = _texts(spark, "hello world, 42 times!")
    row = df.select(
        text_fns.token_count_ws("text").alias("ws"),
        text_fns.token_count_bpe("text").alias("bpe"),
    ).collect()[0]
    assert row.ws == 4
    # hello | world | , | 42 | times | !
    assert row.bpe == 6


def test_stopword_and_punct_ratio(spark):
    df = _texts(spark, "the cat and the hat")
    r = df.select(
        F.round(text_fns.stopword_ratio("text", "en"), 6).alias("stop"),
        text_fns.punct_ratio("text").alias("punct"),
    ).collect()[0]
    assert r.stop == 0.6  # the, and, the of 5 tokens
    assert r.punct == 0.0


def test_language_id(spark):
    df = _texts(
        spark,
        "the cat is in the house and it is happy",
        "der Hund ist nicht in das Haus und",
        "le chat est dans la maison et il est content",
        "xyzzy plugh qwerty",
    )
    out = [r.lang for r in df.select(text_fns.language_id("text").alias("lang")).collect()]
    assert out == ["en", "de", "fr", "und"]


def test_fingerprint_collapses_formatting(spark):
    df = _texts(spark, "Hello,   World!", "hello world", "different text")
    fps = [
        r.fp for r in df.select(text_fns.normalized_fingerprint("text").alias("fp")).collect()
    ]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_quality_score_bounds(spark):
    df = _texts(spark, "", "the a of and to in is it that for " * 30, "!!!???!!!")
    rows = df.select(text_fns.quality_score("text").alias("q")).collect()
    for r in rows:
        assert 0.0 <= r.q <= 1.0
    # stopword-rich long text should outscore pure punctuation
    assert rows[1].q > rows[2].q


def test_winnow_fingerprints_edges_and_overlap(spark):
    from mini_project_big_data_analysis_spark.functions.text_fns import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            (1, ""),                      # empty: no grams
            (2, "abcdefg"),               # len 7 < k=8: no grams
            (3, "abcdefgh"),              # exactly one gram < k+w-1: no window
            (4, "the quick brown fox jumps over the lazy dog"),
            (5, "xx the quick brown fox jumps over the lazy dog yy"),
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(docs, k=8, w=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert 1 not in by_doc and 2 not in by_doc and 3 not in by_doc
    # containment: doc 5 embeds doc 4 verbatim => shares fingerprints
    assert by_doc[4] & by_doc[5]


def test_compression_ratio_orders_repetitive_natural_random(spark):
    from mini_project_big_data_analysis_spark.functions.text_fns import (
        compression_ratio_udf,
    )
    import pyspark.sql.functions as F

    import hashlib

    h, noise = b"seed", []
    for _ in range(64):
        h = hashlib.md5(h).digest()
        noise.append(h.hex())
    rows = [
        (1, "spam spam spam spam " * 50),                      # repetitive
        (2, "the quick brown fox jumps over the lazy dog and "
            "walks home through quiet evening streets " * 10), # natural-ish
        (3, "".join(noise)),                                   # hash-chain noise
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ratio = compression_ratio_udf()
    got = {
        r.doc_id: r.cr
        for r in df.select("doc_id", ratio(F.col("text")).alias("cr")).collect()
    }
    assert got[1] < got[2] < got[3], got
    assert got[1] < 0.2 and got[3] > 0.5
