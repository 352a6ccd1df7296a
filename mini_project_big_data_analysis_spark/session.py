"""SparkSession construction.

Pinned semantics (SURVEY.md §7 step 0):

- ``spark.sql.session.timeZone=UTC`` — the reference handles local time by
  adding an explicit per-row offset to a UTC base (consumer.py:59-61); the
  engine therefore treats every timestamp as UTC and models offsets as
  intervals. This also keeps the DuckDB oracle (UTC by default) comparable.
- AQE on — runtime partition coalescing, skew-join splitting and join
  strategy switching are the 100 TB posture (SURVEY.md §4.4).
- Arrow on — all pandas_udf / applyInPandas paths batch via Arrow.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "mini-project-big-data-analysis-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the same entry point serves tests (local[2]) and bench (local[32]).
    On a real cluster the caller passes no master and spark-submit decides.

    Concurrency contract (tests/test_concurrency.py): one session may run
    any number of catalog queries concurrently against the SAME dataset;
    concurrent callers over DIFFERENT datasets must each take
    ``spark.newSession()`` — the SQL ids register unqualified temp views
    (``lineitem`` etc.) whose namespace is the session, so a shared session
    is last-writer-wins across datasets. Engine conf is set at BUILDER
    level below precisely so child sessions inherit the 100 TB posture.
    """
    # Must run BEFORE the JVM launches: the gateway inherits this process's
    # environment, and Python workers take their import path from the env's
    # PYTHONPATH — this is what lets transformWithStateInPandas workers
    # import (the vendored) google.protobuf. No-op when protobuf is real.
    from .vendor import enable_protobuf_shim

    enable_protobuf_shim()

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Partitions sized for executor memory at scale (SURVEY.md §4.4);
        # 128 MiB is the parquet-friendly default and what we'd ship at 100 TB.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # local[32] runs 32 concurrent tasks inside the driver JVM: an 8g
        # heap GC-thrashes once the pandas-UDF-heavy queries have churned the
        # old gen (measured: later queries inflate 10-40×). 48g on the
        # 128 GiB build box keeps headroom for 32 Python workers. On a real
        # cluster executor memory comes from spark-submit, not this default.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # ContextCleaner only reclaims dropped shuffle files / checkpoint
        # blocks when a JVM GC runs; the 30-MINUTE default periodicGC means
        # a query-per-second workload accumulates dead blocks for the whole
        # session (observed: localCheckpoint blocks from dedup queries
        # degrading successors). 60s is the standard long-running-driver
        # setting and what we'd ship.
        .config("spark.cleaner.periodicGC.interval", "60s")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable semantics to a session we did not
    build (the driver hands ``entry()``/``queries()`` an existing session).

    Only runtime-mutable confs belong here: timezone and AQE are settable on
    a live session; memory/master are not.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    try:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:  # pragma: no cover - conf may be fixed in some harnesses
        pass
    return spark
