"""Property-based tests (hypothesis) for the engine's pure helpers and the
row-local determinism claims the scale design rests on: hash-split
assignments must be a function of the id alone (stable under
repartitioning, subsetting, and incremental re-runs), LSH probe masks must
enumerate exactly the Hamming ball, and tokenization must match the ASCII
contract shared with the SQL oracles."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mini_project_big_data_analysis_spark.operators.dedup import ascii_tokens
from mini_project_big_data_analysis_spark.operators.similarity import _hamming_masks


@given(
    n_planes=st.integers(min_value=1, max_value=10),
    radius=st.integers(min_value=0, max_value=3),
)
def test_hamming_masks_enumerate_exact_ball(n_planes, radius):
    radius = min(radius, n_planes)
    masks = _hamming_masks(n_planes, radius)
    # all distinct, all within the bit width, popcount bounded by radius
    assert len(masks) == len(set(masks))
    from math import comb

    assert len(masks) == sum(comb(n_planes, r) for r in range(radius + 1))
    for m in masks:
        assert 0 <= m < (1 << n_planes)
        assert bin(m).count("1") <= radius


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80))
def test_ascii_tokens_contract(text):
    toks = ascii_tokens(text)
    # no token contains ASCII whitespace; empties never emitted
    assert all(t and not any(c in " \t\n\r\f\v" for c in t) for t in toks)
    # non-ASCII-whitespace (e.g. NBSP) is NOT a separator — the documented
    # contract that keeps signatures aligned with Java \s+ and RE2 \s+
    joined = " ".join(toks)
    for ch in " \t\n\r\f\v":
        assert ch not in "".join(toks)
    # idempotent: tokenizing the rejoined string yields the same tokens
    assert ascii_tokens(joined) == toks


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=30, unique=True
    )
)
def test_hash_split_assignment_depends_only_on_id(spark, ids):
    """The anti-randomSplit property: a row's split must not change when
    the surrounding rows, partitioning, or frame size change."""
    from mini_project_big_data_analysis_spark.operators.pipeline import hash_split

    full = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    whole = {
        r.doc_id: r.split
        for r in hash_split(full, weights).collect()
    }
    # subset (first half) + different partitioning ⇒ identical assignments
    half_ids = ids[: max(1, len(ids) // 2)]
    half = spark.createDataFrame([(i,) for i in half_ids], "doc_id long").repartition(3)
    sub = {r.doc_id: r.split for r in hash_split(half, weights).collect()}
    assert all(whole[i] == sub[i] for i in half_ids)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120))
def test_bpe_pretokenizer_partitions_every_non_separator_char(text):
    """ext_token_regex_count's pattern must PARTITION the input: every char
    that is not one of the four declared separators (space, tab, newline,
    CR) belongs to exactly one match — so the concatenated matches equal
    the input with separators deleted. This is the completeness property
    that makes the count a true token budget (nothing silently dropped),
    and it holds for arbitrary unicode because the final alternative is a
    negated class."""
    import re

    from mini_project_big_data_analysis_spark.queries.ext_audit_q import _BPE_PAT

    matches = re.findall(_BPE_PAT, text)
    stripped = "".join(c for c in text if c not in " \t\n\r")
    assert "".join(matches) == stripped


@given(
    pos=st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=25),
)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_span_island_merge_matches_reference_interval_merge(spark, pos):
    """The gap-islands window rule used by ext_span_dedup (break when
    pos > running-max(end) + 1) must merge [p, p+7] intervals exactly like
    the classic sorted interval-merge algorithm, for arbitrary position
    sets including duplicates and containment."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    N = 8
    rows = [(0, p, p + N - 1) for p in sorted(set(pos))]
    df = spark.createDataFrame(rows, "doc_id long, pos long, pos_end long")
    w_prev = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = sorted(
        (r.s, r.e)
        for r in df.withColumn(
            "brk",
            F.when(F.max("pos_end").over(w_prev) >= F.col("pos") - 1, 0).otherwise(1),
        )
        .withColumn("island", F.sum("brk").over(w_run))
        .groupBy("island")
        .agg(F.min("pos").alias("s"), F.max("pos_end").alias("e"))
        .collect()
    )
    # reference merge
    ref = []
    for p in sorted(set(pos)):
        s, e = p, p + N - 1
        if ref and s <= ref[-1][1] + 1:
            ref[-1] = (ref[-1][0], max(ref[-1][1], e))
        else:
            ref.append((s, e))
    assert got == ref


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=4096), min_size=1, max_size=200),
)
def test_compaction_cumsum_rule_invariants(sizes):
    """The streaming bin rule (bin = bytes-before // target) with item
    sizes ≤ target must yield consecutive non-decreasing bin ids, conserve
    totals, and close every non-final bin at ≥ target total bytes counted
    from its first item's start boundary."""
    T = 4096
    cum = 0
    bins = {}
    last_bin = 0
    for s in sizes:
        b = cum // T
        assert b >= last_bin and b - last_bin <= 1  # consecutive, no skips
        last_bin = b
        bins.setdefault(b, 0)
        bins[b] += s
        cum += s
    assert sum(bins.values()) == sum(sizes)
    assert sorted(bins) == list(range(len(bins)))


@given(
    ops=st.lists(
        st.sampled_from(["write", "expire1", "expire2", "orphan"]),
        min_size=1,
        max_size=8,
    ),
)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_snapshot_lifecycle_invariants_under_random_ops(spark, ops, tmp_path_factory):
    """Random interleavings of commits, expiries, and crash-orphans keep
    the table invariants: every manifest version is readable, expired/
    orphaned versions are not, and the allocator never reuses a live or
    orphaned directory."""
    import json
    import os

    from mini_project_big_data_analysis_spark.sources.writers import (
        expire_snapshots,
        read_snapshot,
        write_snapshot,
    )

    td = str(tmp_path_factory.mktemp("prop") / "tbl")
    expected = {}  # version -> row count
    orphans = set()
    next_rows = 1
    for op in ops:
        if op == "write":
            v = write_snapshot(
                spark.range(next_rows).withColumnRenamed("id", "v"), td
            )
            assert v not in expected and v not in orphans
            expected[v] = next_rows
            next_rows += 1
        elif op in ("expire1", "expire2") and expected:
            k = 1 if op == "expire1" else 2
            gone = expire_snapshots(td, keep_last=k)
            assert gone == sorted(expected)[: max(0, len(expected) - k)]
            for v in gone:
                expected.pop(v)
                assert not os.path.exists(os.path.join(td, f"v{v}"))
        elif op == "orphan" and expected:
            # simulate a crashed expire: drop the OLDEST version from the
            # manifest but leave its directory on disk
            v = sorted(expected)[0]
            if len(expected) > 1:
                with open(os.path.join(td, "manifest.json")) as f:
                    m = json.load(f)
                del m["versions"][str(v)]
                with open(os.path.join(td, "manifest.json"), "w") as f:
                    json.dump(m, f)
                expected.pop(v)
                orphans.add(v)
    for v, n in expected.items():
        assert read_snapshot(spark, td, v).count() == n
    for v in orphans:
        try:
            read_snapshot(spark, td, v)
            raise AssertionError(f"orphan v{v} readable")
        except KeyError:
            pass


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=24),
            st.integers(min_value=0, max_value=24),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """The compressed multi-hop CC loop must agree with a reference
    union-find on arbitrary random graphs (self-loops, parallel edges,
    many components, cycles) — pinning that the path-compression shortcut
    never crosses components or misses the per-component minimum."""
    from mini_project_big_data_analysis_spark.operators.components import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.comp for r in connected_components(df).collect()}
    assert got == expected
