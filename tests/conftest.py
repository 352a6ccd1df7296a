"""Shared pytest fixtures: one local SparkSession for the whole run
(JVM startup dominates; per-test sessions would be minutes of overhead).
"""

from __future__ import annotations

import pytest

from mini_project_big_data_analysis_spark.session import get_spark

SF_BASE = "/root/testdata"
SF_DIR = f"{SF_BASE}/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="mpbda-tests",
        master="local[2]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "2g"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def sf_dir_mid() -> str:
    """The next fixture size up — for tests that need TWO datasets whose
    results visibly differ (e.g. the session-isolation pins)."""
    return f"{SF_BASE}/sf0.01"
