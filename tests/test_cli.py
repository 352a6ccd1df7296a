"""CLI surface tests (``python -m mini_project_big_data_analysis_spark``).

The reference's user surface is ``python <script>.py`` (producer.py /
consumer.py / app.py); the CLI is this engine's equivalent. Tests drive
``cli_main`` in-process with the shared session — list needs no JVM,
run/entry reuse the fixture.
"""

from __future__ import annotations

from mini_project_big_data_analysis_spark.__main__ import cli_main
from mini_project_big_data_analysis_spark.queries import all_queries

from conftest import SF_DIR


def test_list_prints_full_catalog(capsys):
    assert cli_main(["list"]) == 0
    out = capsys.readouterr().out.split()
    assert sorted(out) == sorted(all_queries())


def test_list_prefix_filters(capsys):
    assert cli_main(["list", "--prefix", "stream_"]) == 0
    out = capsys.readouterr().out.split()
    assert out and all(q.startswith("stream_") for q in out)


def test_run_unknown_id_exits_2(capsys):
    assert cli_main(["run", "no_such_query"]) == 2
    assert "unknown query id" in capsys.readouterr().err


def test_run_shows_rows(spark, capsys):
    rc = cli_main(
        ["run", "agg_group_avg", "--sf-dir", SF_DIR, "--show", "3"], spark=spark
    )
    assert rc == 0
    assert "event_type" in capsys.readouterr().out


def test_run_writes_parquet(spark, tmp_path, capsys):
    out = str(tmp_path / "res")
    rc = cli_main(
        ["run", "agg_group_avg", "--sf-dir", SF_DIR, "--out", out], spark=spark
    )
    assert rc == 0
    assert spark.read.parquet(out).count() > 0


def test_run_explain_prints_plan(spark, capsys):
    rc = cli_main(
        ["run", "proj_select_cols", "--sf-dir", SF_DIR, "--explain", "--show", "1"],
        spark=spark,
    )
    assert rc == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_entry_runs_flagship(spark, capsys):
    assert cli_main(["entry", "--sf-dir", SF_DIR, "--show", "2"], spark=spark) == 0
    assert "region" in capsys.readouterr().out
