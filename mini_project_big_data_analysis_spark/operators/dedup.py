"""Deduplication operators (north-star extension, SURVEY.md §2.9).

Four tiers, cheapest first — a real 100 TB dedup pipeline runs them as a
funnel so each stage only sees what the previous one couldn't kill:

1. exact        — hash groupBy on the raw column. One shuffle.
2. fingerprint  — exact after normalization (case/punct/whitespace).
3. minhash LSH  — near-dup candidates via banded MinHash over word shingles,
                  verified with exact Jaccard. Pure DataFrame ops; the only
                  row-multiplying step is the shingle explode, and every
                  shuffle is on doc_id or a band bucket key (never all-pairs).
4. simhash      — 64-bit simhash (Arrow-batched pandas_udf), candidates from
                  16-bit band equality, verified by Hamming distance.

Embedding-space near-dup lives in similarity.py (same blocking machinery as
ANN search).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..functions.text_fns import normalized_fingerprint, word_shingles


def exact_dedup(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """Exact dedup: one representative row (min id — deterministic, unlike
    dropDuplicates) per distinct key tuple, plus the multiplicity.

    Single hash-aggregate shuffle on ``keys``; partial aggregation happens
    map-side so only (key, min, count) triples cross the wire.
    """
    return df.groupBy(*keys).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("dup_count"),
    )


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Format-insensitive exact dedup: group by md5(normalized text)."""
    with_fp = df.withColumn("fingerprint", normalized_fingerprint(text_col))
    return with_fp.groupBy("fingerprint").agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("dup_count"),
    )


def incremental_dedup(
    corpus: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup an incoming batch AGAINST the existing corpus (incremental
    ingest: re-crawls, feed refreshes): returns the incoming rows whose
    normalized fingerprint already exists, paired with the canonical
    existing id — the rows an ingest pipeline drops (or links) instead of
    re-adding.

    Scale shape: the corpus side reduces to (fingerprint, min id) — one
    hash-agg with map-side partials, grouping 100 TB of text down to one
    32-byte row per distinct document — and the join on fingerprint is an
    equi-join AQE broadcasts whenever the incoming batch (or the distinct
    corpus) fits. The incoming batch never shuffles its payload: only its
    fingerprint column joins.
    """
    corpus_fp = (
        corpus.withColumn("fingerprint", normalized_fingerprint(text_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("existing_" + id_col))
    )
    inc_fp = incoming.withColumn("fingerprint", normalized_fingerprint(text_col))
    return inc_fp.join(corpus_fp, "fingerprint", "inner").select(
        id_col, "existing_" + id_col, "fingerprint"
    )


#: ASCII-whitespace tokenizer for the hashing UDFs. Python ``str.split()``
#: splits on Unicode whitespace (NBSP, U+2028, …) but Java's ``\s+`` (the
#: engine's word_shingles / Spark F.split) and DuckDB's RE2 ``\s+`` (the SQL
#: oracles) are ASCII-only — one tokenizer everywhere, or a single NBSP
#: desynchronizes signatures from both the verify stage and the oracle.
_ASCII_WS = re.compile(r"[ \t\n\r\f\v]+")


def ascii_tokens(text: str | None) -> list[str]:
    if not text:
        return []
    return [t for t in _ASCII_WS.split(text) if t]


def minhash_constants(num_hashes: int):
    """The seeded multiply-shift draws ``(a_i, b_i)`` shared by the MinHash
    UDF and its SQL oracle (queries/ext_dedup_q.py builds a VALUES table
    from the same arrays — one source of truth, no drift)."""
    import numpy as np

    rng = np.random.default_rng(1234)
    a = rng.integers(1, 2**62, size=num_hashes, dtype=np.uint64) * 2 + 1  # odd
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
    return a, b


def _make_minhash_udf(num_hashes: int, shingle_k: int):
    """Arrow-batched MinHash signature UDF (SURVEY.md §2.10: hashing is the
    one sanctioned pandas_udf use in the dedup path).

    Per doc: k-word shingles → one 64-bit base hash per shingle (md5 prefix)
    → ``num_hashes`` multiply-shift draws ``a_i * h + b_i (mod 2^64)`` →
    column-wise min, all vectorized in numpy. ~10× faster than both JVM
    alternatives measured at sf0.1 (explode+64-agg: codegen-compile-bound;
    transform/array_min projection: interpreted-HOF-bound). Deterministic:
    seeded rng for (a, b), md5 for base hashes.

    Docs with fewer than ``shingle_k`` tokens yield NULL (dropped by the
    caller) — an empty set has no meaningful MinHash and would spuriously
    band-match every other empty doc.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    A, B = minhash_constants(num_hashes)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_sig(texts):  # type: ignore[no-untyped-def]
        out = []
        for text in texts:
            toks = ascii_tokens(text)
            if len(toks) < shingle_k:
                out.append(None)
                continue
            shingles = {
                " ".join(toks[i : i + shingle_k])
                for i in range(len(toks) - shingle_k + 1)
            }
            base = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
                    for s in shingles
                ),
                dtype=np.uint64,
                count=len(shingles),
            )
            with np.errstate(over="ignore"):
                vals = A[:, None] * base[None, :] + B[:, None]  # (h, n) mod 2^64
            out.append(vals.min(axis=1).view(np.int64))
        return pd.Series(out)

    return minhash_sig


def _minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int, shingle_k: int
) -> DataFrame:
    """(id, signature array<bigint>), 1 row per doc with ≥ shingle_k tokens."""
    sig_udf = _make_minhash_udf(num_hashes, shingle_k)
    return df.select(F.col(id_col), sig_udf(F.col(text_col)).alias("signature")).filter(
        F.col("signature").isNotNull()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH, Jaccard-verified.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.

    Scale shape: signatures table is 1 row/doc; banding explodes it ×bands
    (still 1 row per doc-band); the bucket self-join only pairs docs sharing
    a band hash, so the shuffle is on (band, band_hash) — never O(n²).
    Exact-Jaccard verification joins shingle sets only for candidate pairs.

    Memory note (ADVICE r9): the class table below is ``localCheckpoint``-ed
    and its blocks are reclaimed by the ContextCleaner only when a JVM GC
    runs. This repo's ``get_spark`` sets ``spark.cleaner.periodicGC.interval``
    to 60s for that reason; under an EXTERNAL driver session the 30-minute
    default lets checkpoint blocks accumulate across repeated calls — set
    the interval at session build time (it is not runtime-mutable) for
    call-in-a-loop workloads.
    """
    rows_per_band = num_hashes // bands
    spark = df.sparkSession
    # Exact-duplicate collapse (the simhash group-join lesson, round 7):
    # identical texts have identical signatures, band buckets, AND shingle
    # sets, so the whole band-join + Jaccard-verify pipeline runs on ONE
    # representative per distinct text — a D-fold duplicated corpus (any
    # crawl before exact dedup; the sf1/sf3 stress fixtures) costs D not
    # D² through the bucket join and, more importantly, through the
    # shingle-array verify join. Intra-class pairs are emitted directly at
    # Jaccard exactly 1.0 (identical sets) — except shingle-less docs
    # (< k tokens), whose self-Jaccard is 0/0 = NULL and which the verify
    # filter drops in the uncollapsed plan too. md5 keys the class (128
    # bits; xxhash64 collisions would silently merge distinct texts).
    # NULL texts md5 to a NULL class key; uncollapsed, NULL join keys never
    # matched, so the all-NULL class must not expand into pairs (ADVICE r7).
    groups = (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(F.md5(F.col(text_col)).alias("__ck"))
        .agg(
            F.sort_array(F.collect_list(F.col(id_col))).alias("__ids"),
            F.first(F.col(text_col)).alias(text_col),
        )
        .select(
            F.element_at("__ids", 1).alias(id_col), text_col, "__ids"
        )
        # Eager localCheckpoint, not persist: the class table is tiny
        # (1 row per distinct text) and three downstream branches read it;
        # checkpointing materializes it once and truncates lineage, and the
        # 60s periodicGC reclaims the blocks when the plan is dropped.
        .localCheckpoint(eager=True)
    )
    df = groups.select(id_col, text_col)
    # Hashing cost is ~num_hashes × shingles per doc, far above scan cost —
    # a single-file input would otherwise run it on one core. Repartition to
    # cluster parallelism BEFORE the projection, and persist the (tiny,
    # 1-row-per-doc) signatures: the banded self-join consumes them twice.
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    sigs = _minhash_signatures(
        df.repartition(n_parts, id_col), id_col, text_col, num_hashes, shingle_k
    ).persist()

    band_entries = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")

    a = band_entries.alias("a")
    b = band_entries.alias("b")
    candidates = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )

    # _verify_jaccard materializes eagerly (localCheckpoint), so the cached
    # signature table can be released here instead of leaking a block into
    # executor memory for the session lifetime.
    verified = _verify_jaccard(
        df, candidates, id_col, text_col, shingle_k, jaccard_threshold
    )
    sigs.unpersist()

    # Expand representative pairs back to document pairs.
    from ..functions.text_fns import shingles_from_tokens, whitespace_tokens

    idmap_a = groups.select(
        F.col(id_col).alias("id_a"), F.col("__ids").alias("__ids_a")
    )
    idmap_b = groups.select(
        F.col(id_col).alias("id_b"), F.col("__ids").alias("__ids_b")
    )
    cross = (
        verified.join(idmap_a, "id_a")
        .join(idmap_b, "id_b")
        .select(F.explode("__ids_a").alias("x"), "__ids_b", "jaccard")
        .select("x", F.explode("__ids_b").alias("y"), "jaccard")
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
            "jaccard",
        )
    )
    intra = (
        groups.filter(F.size("__ids") >= 2)
        # staged tokenization (lambda-capture rule): materialize the token
        # array before the shingle transform references it
        .select("__ids", whitespace_tokens(text_col).alias("__toks"))
        .filter(
            F.size(
                F.array_distinct(shingles_from_tokens("__toks", shingle_k))
            )
            > 0
        )
        .select(F.posexplode("__ids").alias("i", "id_a"), "__ids")
        .select("i", "id_a", F.posexplode("__ids").alias("j", "id_b"))
        .filter(F.col("i") < F.col("j"))
        .select(
            "id_a", "id_b", F.round(F.lit(1.0), 6).alias("jaccard")
        )
    )
    if jaccard_threshold > 1.0:  # degenerate but keep the contract exact
        intra = intra.filter(F.lit(False))
    # Return the expansion LAZY. Everything expensive is already
    # materialized rep-level (verified pairs are eagerly checkpointed in
    # _verify_jaccard; the class table above) — the class→member expansion
    # is a pure streaming explode over those small inputs. Checkpointing it
    # here (the pre-round-9 form) materialized the full pair set, which at
    # 1000-deep dup classes is O(classes × D²) rows — measured: 25 BILLION
    # pairs / ~750 GB at the sf100 fixture, an OOM by construction — while
    # the lazy plan streams them through whatever sink consumes the result.
    return intra.unionByName(cross)


def _verify_jaccard(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int,
    threshold: float,
) -> DataFrame:
    """Exact Jaccard over distinct word-shingle sets for candidate pairs.

    The shingle-set table feeds both sides of the pair join — persisted so
    the (interpreted, higher-order-function) shingling runs once per doc,
    not once per join side."""
    spark = df.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    from ..functions.text_fns import shingles_from_tokens, whitespace_tokens

    # staged tokenization: the shingle transform must reference a
    # materialized token array, not re-split the text per gram
    # (see shingles_from_tokens docstring)
    shingle_sets = (
        df.repartition(n_parts, id_col)
        .select(F.col(id_col), whitespace_tokens(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.array_distinct(shingles_from_tokens("__toks", shingle_k)).alias("shingles"),
        )
        .persist()
    )
    sa = shingle_sets.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = shingle_sets.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("double"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # Eagerly materialize so the shingle-set cache can be released here
    # instead of leaking for the session lifetime (the caller may never
    # know this table existed). The checkpointed result is small —
    # candidate pairs above threshold only.
    out = verified.localCheckpoint(eager=True)
    shingle_sets.unpersist()
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_words: int = 8,
    threshold: float = 0.3,
) -> DataFrame:
    """n-gram Jaccard dedup with deterministic prefix blocking.

    Blocking key = first ``block_words`` whitespace tokens. SQL-expressible
    end-to-end (oracle-checkable), and the scale shape follows the round-7
    rep-collapse pattern (join GROUP representatives, expand member lists
    into output pairs): identical texts collapse to one md5 class row
    before the block-key self-join, so a class of D duplicates costs D
    through the shuffle instead of D² — measured 5.1 s → 1.1 s on the
    10×-duplicate sf1 fixture, value-identical output. The class self-join
    uses ``cls_a <= cls_b`` so intra-class (identical-text) pairs fall out
    of the SAME join pass — their Jaccard is computed from the class words
    like any other pair (trivially 1.0) — with ``x < y`` de-duplicating the
    member expansion; no second branch, no union. NULL texts form no class
    and thus no pairs (round-8 rule). Complements MinHash (which catches
    dups whose *prefix* differs).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    keyed = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("cls"),
        F.concat_ws(" ", F.slice(toks, 1, block_words)).alias("block_key"),
        F.array_distinct(toks).alias("words"),
    )
    classes = keyed.groupBy("cls").agg(
        F.first("block_key").alias("block_key"),
        F.first("words").alias("words"),
        F.sort_array(F.collect_list(id_col)).alias("ids"),
    )
    a = classes.alias("a")
    b = classes.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.block_key") == F.col("b.block_key"),
                F.col("a.cls") <= F.col("b.cls"),
            ],
        )
        .withColumn("inter", F.size(F.array_intersect("a.words", "b.words")).cast("double"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.size("a.words") + F.size("b.words") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a.cls").alias("ca"),
            F.col("b.cls").alias("cb"),
            F.col("a.ids").alias("ids_a"),
            F.col("b.ids").alias("ids_b"),
            "jaccard",
        )
        .select("ca", "cb", F.explode("ids_a").alias("x"), "ids_b", "jaccard")
        .select("ca", "cb", "x", F.explode("ids_b").alias("y"), "jaccard")
        .filter((F.col("ca") != F.col("cb")) | (F.col("x") < F.col("y")))
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
            "jaccard",
        )
    )


# --------------------------------------------------------------------------
# SimHash (pandas_udf — hashing 64 bit-planes is genuinely cheaper in numpy
# than as 64 Catalyst aggregates; Arrow batches keep the transfer columnar).
# --------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def simhash64(texts):  # type: ignore[no-untyped-def]
    """64-bit SimHash of whitespace tokens, deterministic (md5-based).

    Token bit-planes are memoized across the whole Arrow batch: vocabulary
    is Zipfian, so most occurrences hit the cache and the md5 + bit-expand
    cost is paid once per *distinct* token, not once per occurrence
    (measured 4× on the sf0.1 documents table)."""
    import hashlib

    import numpy as np
    import pandas as pd

    bit_cache: dict = {}

    def tok_bits(tok: str):
        bits = bit_cache.get(tok)
        if bits is None:
            # shift in unsigned space: md5's top bit is set for ~50% of
            # tokens and a Python int >= 2^63 breaks numpy int64 shifts.
            h = np.frombuffer(hashlib.md5(tok.encode()).digest()[:8], dtype="<u8")[0]
            bits = (
                2 * ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
                - 1
            )
            bit_cache[tok] = bits
        return bits

    def one(text):  # type: ignore[no-untyped-def]
        if text is None:
            # NULL text → NULL hash (no pairs downstream, ADVICE r7);
            # EMPTY text keeps hash 0 — known content, pairs with other
            # empties exactly as the pre-collapse plan did.
            return None
        if not text:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for tok in ascii_tokens(text):
            acc += tok_bits(tok)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        # map to signed int64
        return out - (1 << 64) if out >= (1 << 63) else out

    return pd.Series([one(t) for t in texts], dtype="Int64")


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Candidates via the pigeonhole trick: split the 64-bit hash into 4
    16-bit chunks; any pair within Hamming 3 must agree on ≥1 chunk, so the
    join shuffles on (chunk_idx, chunk_value) buckets only.

    The join runs over one REPRESENTATIVE row per distinct simhash, not per
    document: exact duplicates (identical simhash — the common case in a
    crawl before exact-dedup runs) collapse into a sorted id list first, so
    a D-fold duplicated corpus shrinks the bucket join D-fold and candidate
    volume D²-fold; intra-group pairs (Hamming 0) and cross-group pairs are
    then EXPANDED from the id lists directly into output rows — the
    candidate dedupe (a group pair can agree on up to 4 chunks) happens on
    group pairs, never on the D² document pairs. Measured on the sf3
    dup-stress fixture (30 copies/doc): 95 s → the join side drops from
    600k chunk rows to ~20k. Precondition: a single simhash group's id
    list is one row — corpora where one exact-dup class reaches millions
    of members should run exact dedup first (the output would be that many
    squared pairs regardless of plan shape).
    """
    # NULL texts hash to a NULL simhash; in the uncollapsed plan NULL join
    # keys never matched, so they produced no pairs — the collapse must not
    # turn the all-NULL class into hamming-0 pairs (ADVICE r7). Drop them
    # before grouping.
    hashed = df.select(
        F.col(id_col), simhash64(F.col(text_col)).alias("simhash")
    ).filter(F.col("simhash").isNotNull())
    groups = hashed.groupBy("simhash").agg(
        F.sort_array(F.collect_list(F.col(id_col))).alias("ids")
    )
    chunks = groups.select(
        "simhash",
        "ids",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("simhash", "ids", "c.chunk_idx", "c.chunk")

    a = chunks.alias("a")
    b = chunks.alias("b")
    gpairs = (
        a.join(
            b,
            on=[
                F.col("a.chunk_idx") == F.col("b.chunk_idx"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.simhash") < F.col("b.simhash"),
            ],
        )
        .select(
            F.col("a.ids").alias("ids_a"),
            F.col("b.ids").alias("ids_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    cross = (
        gpairs.select(F.explode("ids_a").alias("x"), "ids_b", "hamming")
        .select("x", F.explode("ids_b").alias("y"), "hamming")
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
            "hamming",
        )
    )
    intra = (
        groups.filter(F.size("ids") >= 2)
        .select(F.posexplode("ids").alias("i", "id_a"), "ids")
        .select("i", "id_a", F.posexplode("ids").alias("j", "id_b"))
        .filter(F.col("i") < F.col("j"))
        .select("id_a", "id_b", F.lit(0).alias("hamming"))
    )
    return intra.unionByName(cross)
