"""Empty-input robustness pins (round 9).

At 100 TB a zero-row input is an ordinary event — a date partition with no
rows, a tenant with no documents, an update stream whose filter matched
nothing — so every operator must PLAN AND EXECUTE on empty tables, not
crash. The risky class is driver-side boundary actions (``approxQuantile``
→ ``[]``, ``first()`` → ``None``, centroid samples → zero vectors) and
empty-layout read-backs (a partitioned write of zero rows produces no
parquet files, so a schema-inferring re-read fails).

``scripts/empty_sweep.py`` runs the WHOLE catalog against the empty
fixture (228/236 passed before round 9; the 8 failures fixed here). This
test pins the fixed ids plus one representative per boundary-action
pattern so the class stays guarded inside the default suite.
"""

from __future__ import annotations

import os

import pytest

from mini_project_big_data_analysis_spark.queries import all_queries

# the 8 ids that FAILED the round-9 catalog sweep (each a distinct bug:
# empty-layout read-backs, None JDBC bounds, None percentile splits, a
# zero-vector centroid matrix, ANSI divide-by-zero on count 0)
FIXED_IDS = [
    "snk_partitioned_write",
    "snk_upsert_write",
    "join_dpp_partitioned",
    "src_jdbc_scan",
    "stream_multibatch_agg",
    "stream_foreachbatch_upsert",
    "ext_sim_ivf",
    "ext_dq_rules",
]

# one representative per boundary-action pattern that already survived the
# sweep — pinned so a refactor can't regress the pattern silently
REPRESENTATIVE_IDS = [
    "ext_user_rfm",  # multi-column approxQuantile boundaries
    "ext_gini_concentration",  # distributed_global_rank bucket boundaries
    "ext_winsorize",  # approxQuantile clamp bounds
    "ext_semdedup",  # centroid sample + rep-graph components
    "ext_sim_ann",  # LSH hyperplane sample
    "ext_vocab_growth",  # superbucket offset table
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory) -> str:
    from scripts.empty_sweep import TABLES, build_empty_fixture

    out = build_empty_fixture(str(tmp_path_factory.mktemp("empty_fixture")))
    assert sorted(os.listdir(out)) == sorted(f"{t}.parquet" for t in TABLES)
    return out


@pytest.mark.parametrize("qid", FIXED_IDS + REPRESENTATIVE_IDS)
def test_runs_on_empty_input(spark, empty_dir, qid):
    q = all_queries()[qid]
    df = q.fn(spark, empty_dir)
    # must execute, not just plan; schema must be derivable
    n = df.count()
    assert df.schema.fieldNames()
    # empty in ⇒ (near-)empty out: only constant-armed reports may emit rows
    assert n <= 10
