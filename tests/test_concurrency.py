"""Concurrent-submission contract (round 14).

A 1000-executor deployment runs many queries at once. Spark's unit of
tenant isolation is the SparkSession: catalog temp views live in the
SESSION, not the query, so the engine's contract is

  * one session may run any number of catalog queries CONCURRENTLY against
    the SAME dataset — the registered functions share no mutable Python
    state, and same-name temp views re-created over the same data are
    idempotent;
  * concurrent callers over DIFFERENT datasets must each take
    ``spark.newSession()`` (shared SparkContext/executors, private view
    namespace and SQLConf) — on a shared session the SQL ids' unqualified
    view names (``FROM lineitem``) are last-writer-wins, which is Spark
    semantics, not an engine bug (probed: interleaving two sf_dirs on one
    session corrupts results; two child sessions interleave cleanly).

These tests pin all three legs so a refactor that adds cross-query mutable
state, breaks view idempotency, or stops ``get_spark``'s builder-level conf
from reaching child sessions fails loudly.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor

from mini_project_big_data_analysis_spark.queries import all_queries

#: Diverse single-tenant mix: SQL-view id, hash-agg, window, pandas-UDF
#: similarity, broadcast join, text explode.
_MIX = [
    "sql_tpch_q1",
    "ext_dedup_exact",
    "agg_group_avg",
    "window_topk_per_group",
    "ext_text_stats",
    "join_inner_equi",
    # conf-mutating id: its set→plan→restore window is lock-serialized
    # (queries/cbo_q.py _CBO_CONF_LOCK) — this pin is what keeps that true
    "sql_cbo_broadcast",
]


def _rows(spark, qid, sf_dir):
    return sorted(map(tuple, all_queries()[qid].fn(spark, sf_dir).collect()))


def test_same_dataset_concurrent_submission_matches_serial(spark, sf_dir):
    serial = {qid: _rows(spark, qid, sf_dir) for qid in _MIX}
    with ThreadPoolExecutor(len(_MIX)) as ex:
        concurrent = list(ex.map(lambda q: (q, _rows(spark, q, sf_dir)), _MIX))
    for qid, got in concurrent:
        assert got == serial[qid], f"{qid} diverged under concurrent submission"


def test_shared_session_view_namespace_is_last_writer_wins(spark, sf_dir, sf_dir_mid):
    """The deterministic core of the cross-dataset hazard: running the same
    SQL id against two sf_dirs on ONE session leaves the shared ``lineitem``
    view pointing at the second — which is exactly why the contract sends
    cross-dataset concurrency to ``newSession()``.

    Deliberately mutates a view namespace, so it runs on a throwaway
    ``newSession()`` (own temp-view catalog) and leaves the shared
    session-scoped fixture untouched for later-collected tests
    (ADVICE r14 low)."""
    mine = spark.newSession()
    fn = all_queries()["sql_tpch_q1"].fn
    fn(mine, sf_dir_mid).collect()
    n_after_big = mine.table("lineitem").count()
    fn(mine, sf_dir).collect()
    n_after_tiny = mine.table("lineitem").count()
    assert n_after_big != n_after_tiny, (
        "fixtures must differ in size for this pin to mean anything"
    )
    expected_tiny = mine.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert n_after_tiny == expected_tiny  # last writer owns the name


def test_new_sessions_isolate_concurrent_datasets(spark, sf_dir, sf_dir_mid):
    fn = all_queries()["sql_tpch_q1"].fn
    want_a = sorted(map(tuple, fn(spark, sf_dir_mid).collect()))
    want_b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert want_a != want_b

    s_a, s_b = spark.newSession(), spark.newSession()
    # builder-level engine conf must reach child sessions (a runtime-only
    # conf would NOT survive newSession — that is why get_spark sets the
    # 100 TB posture at builder level)
    for child in (s_a, s_b):
        assert child.conf.get("spark.sql.adaptive.enabled") == "true"
        assert child.conf.get("spark.sql.session.timeZone") == "UTC"

    results: dict[str, list] = {"a": [], "b": []}
    errors: list[str] = []

    def work(tag, session, sf):
        try:
            for _ in range(3):
                results[tag].append(sorted(map(tuple, fn(session, sf).collect())))
        except Exception as exc:  # pragma: no cover - the assertion below reports
            errors.append(f"{tag}: {type(exc).__name__}: {exc}")

    t_a = threading.Thread(target=work, args=("a", s_a, sf_dir_mid))
    t_b = threading.Thread(target=work, args=("b", s_b, sf_dir))
    t_a.start(); t_b.start(); t_a.join(); t_b.join()

    assert not errors, errors
    assert all(r == want_a for r in results["a"]), "tenant A saw tenant B's data"
    assert all(r == want_b for r in results["b"]), "tenant B saw tenant A's data"
