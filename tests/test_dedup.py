"""Dedup-operator tests on planted duplicates — the correctness pin for the
rows-only query ids (ext_dedup_fuzzy, ext_dedup_simhash)."""

from __future__ import annotations

from mini_project_big_data_analysis_spark.operators import dedup

BASE = (
    "spark shuffles data between stages when a wide dependency requires "
    "repartitioning by key across the cluster nodes"
)
NEAR = (
    "spark shuffles data between stages when a wide dependency requires "
    "repartitioning by key across all the cluster nodes"
)
OTHER = (
    "completely different text about cooking pasta with tomatoes basil "
    "garlic olive oil and a pinch of salt for dinner tonight"
)


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),        # exact dup of 1
        (3, NEAR),        # near dup of 1 (one inserted word)
        (4, OTHER),
        (5, "short"),     # < k tokens: must not crash anything
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_representative_and_count(spark):
    out = dedup.exact_dedup(_docs(spark), keys=["text"], id_col="doc_id")
    by_text = {r.text: r for r in out.collect()}
    assert by_text[BASE].doc_id == 1 and by_text[BASE].dup_count == 2
    assert by_text[OTHER].dup_count == 1


def test_fingerprint_dedup_formatting_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "bye")],
        "doc_id long, text string",
    )
    out = dedup.fingerprint_dedup(df, "text", "doc_id").collect()
    counts = sorted(r.dup_count for r in out)
    assert counts == [1, 2]


def test_minhash_lsh_finds_near_dups_and_survives_short_docs(spark):
    # regression: word_shingles crashed on < k-token docs (rows 5, 6)
    # bands=16 of 2 rows: P(candidate) for the planted j≈0.67 pair is
    # 1-(1-j²)¹⁶ ≈ 0.9999 — robust to the (deterministic) hash family.
    pairs = dedup.minhash_lsh_pairs(
        _docs(spark), "doc_id", "text", num_hashes=32, bands=16,
        jaccard_threshold=0.5,
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found  # exact dup always survives
    assert (1, 3) in found or (2, 3) in found  # near dup caught
    for r in pairs:
        assert r.jaccard >= 0.5


def test_ngram_jaccard_blocked_pairs(spark):
    pairs = dedup.ngram_jaccard_pairs(
        _docs(spark), "doc_id", "text", block_words=4, threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert found[(1, 2)] == 1.0
    assert (1, 3) in found


def test_ngram_collapse_expansion_is_member_uniform(spark):
    """Round-11 collapse regression pin for ngram_jaccard_pairs (the same
    contract test_dup_class_expansion_is_member_uniform pins for MinHash):
    a tripled exact-dup class must expand to every intra-class pair at
    Jaccard exactly 1.0, every member must score IDENTICALLY against an
    outside near-dup, NULL-text docs must contribute no pairs (they form
    no class), and same-word-set non-identical texts must still pair
    through the CROSS branch (different md5 classes, same block key)."""
    rows = [
        (1, BASE), (2, BASE), (3, BASE),   # 3-member exact-dup class
        (4, NEAR),                          # near dup, same 4-word prefix
        (5, OTHER),
        (6, None), (7, None), (8, None),    # planted NULL-text class
        (9, BASE + " "),                    # same word SET, different text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", block_words=4, threshold=0.5
    ).collect()
    by_pair = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert len(by_pair) == len(pairs), "duplicate output pairs"
    for p in [(1, 2), (1, 3), (2, 3)]:
        assert by_pair.get(p) == 1.0, by_pair
    # trailing-space doc: distinct md5 class, identical word set — must pair
    # with every BASE member at 1.0 through the cross branch
    for p in [(1, 9), (2, 9), (3, 9)]:
        assert by_pair.get(p) == 1.0, by_pair
    near_scores = {j for (a, b), j in by_pair.items() if 4 in (a, b)}
    assert len(near_scores) == 1, f"class members scored unequally: {near_scores}"
    assert {(a, b) for (a, b) in by_pair if 4 in (a, b)} == {
        (1, 4), (2, 4), (3, 4), (4, 9)
    }
    assert all(a not in (6, 7, 8) and b not in (6, 7, 8) for a, b in by_pair)


def test_simhash_pairs_hamming(spark):
    # a 1-token edit in a 300-token doc flips 2 simhash bits (deterministic,
    # md5-based) — within both the hamming budget and the 4-chunk pigeonhole
    # guarantee (hamming ≤ 3 ⇒ at least one 16-bit chunk agrees).
    base_words = [f"tok{i}" for i in range(300)]
    long_base = " ".join(base_words)
    long_near = " ".join(base_words[:-1] + ["changed"])
    df = spark.createDataFrame(
        [(1, long_base), (2, long_base), (3, long_near), (4, OTHER)],
        "doc_id long, text string",
    )
    pairs = dedup.simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert found[(1, 2)] == 0  # identical text → identical simhash
    assert found[(1, 3)] == 2 and found[(2, 3)] == 2
    assert not any(4 in p for p in found)


def test_connected_components_transitive(spark):
    from mini_project_big_data_analysis_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    out = {r.node: r.comp for r in connected_components(edges).collect()}
    assert out == {
        1: 1, 2: 1, 3: 1, 4: 1,       # 4-node chain collapses to min id
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_connected_components_long_chain_converges_fast(spark):
    """A 200-node path graph (diameter 199, min id at the far end) must
    fully collapse WITHOUT hitting max_iterations — pure one-hop min-label
    propagation would need 199 rounds and silently split the component at
    the default cap of 50; the compressed multi-hop rounds must get there
    within a small round budget (each round is a full label-table shuffle,
    so round count is the 100 TB cost model)."""
    import warnings

    from mini_project_big_data_analysis_spark.operators.components import (
        connected_components,
    )

    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # cap hit → failure
        out = {
            r.node: r.comp
            # local_finish_edges=0 pins the DISTRIBUTED loop: the round-16
            # driver-side union-find would otherwise absorb this small graph
            # and the round-budget property would go untested.
            for r in connected_components(
                edges, max_iterations=40, local_finish_edges=0
            ).collect()
        }
    assert out == {i: 0 for i in range(n)}


def test_connected_components_local_finish_matches_distributed(spark):
    """Round-16 local-finish pin: below the edge gate the driver-side
    union-find must return exactly the distributed fixpoint — same nodes,
    same min-id labels — on a graph mixing chains, cliques and isolates-by-
    self-loop, whichever path runs."""
    from mini_project_big_data_analysis_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21), (21, 20), (7, 7), (100, 4), (4, 9)],
        "id_a long, id_b long",
    )
    local = {
        r.node: r.comp
        for r in connected_components(edges, local_finish_edges=1000).collect()
    }
    dist = {
        r.node: r.comp
        for r in connected_components(edges, local_finish_edges=0).collect()
    }
    assert local == dist == {
        3: 3, 5: 3, 9: 3, 4: 3, 100: 3,
        20: 20, 21: 20,
        7: 7,
    }


def test_tokenizers_agree_on_unicode_whitespace(spark):
    """The Python UDF tokenizer must match Java's ASCII \\s+ (word_shingles,
    oracles): NBSP is NOT a separator in either."""
    from pyspark.sql import functions as F

    from mini_project_big_data_analysis_spark.functions.text_fns import whitespace_tokens
    from mini_project_big_data_analysis_spark.operators.dedup import ascii_tokens

    s = "a\u00a0b c\td"
    jvm_toks = (
        spark.createDataFrame([(s,)], "t string")
        .select(whitespace_tokens("t").alias("toks"))
        .collect()[0]
        .toks
    )
    assert ascii_tokens(s) == jvm_toks == ["a\u00a0b", "c", "d"]


def test_dup_class_expansion_is_member_uniform(spark):
    """Round-7 collapse regression pin: with a tripled exact-dup class, the
    expanded output must contain every intra-class pair at Jaccard exactly
    1.0 and give every member the SAME score against an outside near-dup
    (members are interchangeable — a collapse bug would score or drop some
    member differently). Short/empty dup classes must contribute nothing
    (their shingle sets are empty, matching the uncollapsed NULL-Jaccard
    behavior)."""
    rows = [
        (1, BASE), (2, BASE), (3, BASE),   # 3-member exact-dup class
        (4, NEAR),                          # near dup of the class
        (5, OTHER),
        (6, "short"), (7, "short"),         # dup class below shingle_k
        (8, ""), (9, ""),                   # empty dup class
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", num_hashes=32, bands=16, jaccard_threshold=0.5
    ).collect()
    by_pair = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    # every intra-class pair present, exactly 1.0
    for p in [(1, 2), (1, 3), (2, 3)]:
        assert by_pair.get(p) == 1.0, by_pair
    # the near dup scores identically against every class member
    near_scores = {j for (a, b), j in by_pair.items() if b == 4 or a == 4}
    assert len(near_scores) == 1 and near_scores.pop() >= 0.5
    assert {(a, b) for (a, b) in by_pair if a == 4 or b == 4} == {
        (1, 4), (2, 4), (3, 4)
    }
    # shingle-less dup classes contribute no pairs at all
    assert all(a not in (6, 7, 8, 9) and b not in (6, 7, 8, 9) for a, b in by_pair)


def test_null_text_classes_produce_no_pairs(spark):
    """ADVICE r7: the exact-dup-class collapse groups by the comparison key
    (md5 text / simhash / prefix), so all NULL-text docs fall into one
    NULL-keyed class — and the intra expansion must NOT emit hamming-0 /
    jaccard-1 / edit-dist-0 pairs for them, because the uncollapsed plans
    emitted none (NULL equi-join keys never match; NULL levenshtein was
    filtered). Real pairs among non-NULL docs must be unaffected."""
    rows = [
        (1, BASE), (2, BASE),
        (3, None), (4, None), (5, None),  # planted NULL-text class
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    mh = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", num_hashes=32, bands=16, jaccard_threshold=0.5
    ).collect()
    assert {(r.id_a, r.id_b) for r in mh} == {(1, 2)}

    sh = dedup.simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
    assert {(r.id_a, r.id_b) for r in sh} == {(1, 2)}

    # editdist query path: synthesize a documents table with NULL texts
    import tempfile

    from mini_project_big_data_analysis_spark.queries import all_queries

    with tempfile.TemporaryDirectory() as d:
        docs = spark.createDataFrame(
            [
                (1, "identical prefix here", "en", "web", 21),
                (2, "identical prefix here", "en", "web", 21),
                (3, None, "en", "web", 0),
                (4, None, "en", "web", 0),
                (5, "identical prefix here", None, "web", 21),  # NULL block key
                (6, "identical prefix here", None, "web", 21),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
        out = all_queries()["ext_dedup_editdist"].fn(spark, d).collect()
        assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}


def test_minhash_expansion_stays_lazy_in_the_returned_plan(spark):
    """Scale contract pinned after the sf100 OOM: minhash_lsh_pairs must
    return the class->member pair expansion LAZY — rep-level results are
    materialized inside (eager checkpoints of the verified rep pairs and
    the class table), but the expansion itself is O(classes x D^2) rows
    at D-deep dup classes (25 BILLION at the sf100 fixture) and must
    stream through whatever sink consumes it. A re-added materialization
    of the union (the pre-round-9 form) replaces the plan's Generate
    (posexplode/explode) nodes with a bare scan of checkpointed rows."""
    out = dedup.minhash_lsh_pairs(
        _docs(spark), "doc_id", "text", num_hashes=32, bands=16,
        jaccard_threshold=0.5,
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" in plan, (
        "pair expansion was materialized — the returned plan must keep the "
        "explode lazy:\n" + plan
    )


def test_connected_components_cliques_with_bridges(spark):
    """The contraction path (round 16): two 12-cliques joined by a single
    bridge edge, plus a clique that dangles a 5-chain. Cliques collapse to
    one label in the first round and the contraction drops their k(k-1)
    edge mass; the bridge and chain must still merge the collapsed
    clusters afterwards — a contraction that lost inter-cluster edges or
    returned lagging member labels would split these."""
    from mini_project_big_data_analysis_spark.operators.components import (
        connected_components,
    )

    c1 = [(i, j) for i in range(0, 12) for j in range(0, 12) if i < j]
    c2 = [(i, j) for i in range(100, 112) for j in range(100, 112) if i < j]
    bridge = [(11, 100)]
    c3 = [(i, j) for i in range(200, 212) for j in range(200, 212) if i < j]
    chain = [(211, 300), (300, 301), (301, 302), (302, 303)]
    edges = spark.createDataFrame(
        c1 + c2 + bridge + c3 + chain, "id_a long, id_b long"
    )
    out = {r.node: r.comp for r in connected_components(edges).collect()}
    assert all(out[i] == 0 for i in list(range(12)) + list(range(100, 112)))
    assert all(
        out[i] == 200 for i in list(range(200, 212)) + [300, 301, 302, 303]
    )
