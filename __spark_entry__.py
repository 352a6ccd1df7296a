"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``mini_project_big_data_analysis_spark``; this file
is only the wiring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mini_project_big_data_analysis_spark.queries import all_queries
from mini_project_big_data_analysis_spark.queries.flagship import flagship
from mini_project_big_data_analysis_spark.session import configure_existing

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_existing(spark)
    return flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {qid: wrap(q.fn) for qid, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query id; ids absent here are rows-only."""
    return {qid: q.oracle for qid, q in all_queries().items() if q.oracle is not None}
