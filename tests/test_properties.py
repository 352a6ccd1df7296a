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
