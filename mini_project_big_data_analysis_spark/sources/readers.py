"""Batch sources.

The reference's sources are a REST poll loop (producer.py:15-24) and a Kafka
consumer (consumer.py:18-25). In the batch engine both collapse to schema'd
scans; the streaming equivalents live in ``streaming/``.

Every reader declares its schema (schemas.py) so Catalyst plans against known
types and parquet scans get column pruning + predicate pushdown without an
inference pass over the footer of every file — at 100 TB an inference pass is
itself a job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TABLE_SCHEMAS

TABLES = tuple(TABLE_SCHEMAS)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table (full-collection scan analog, app.py:35-36).

    Plain ``spark.read.parquet`` — the declared schema is NOT forced on the
    scan because parquet is self-describing and Spark's vectorized reader is
    strictest when it trusts the footer; the schema module documents the
    contract and is asserted in tests instead.
    """
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLE_SCHEMAS)}")
    if name == "events":
        from .events import load_events

        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kafka-source analog (consumer.py:18-25): events whose ``props``
    payload is a JSON string, parsed with an explicit schema into typed
    columns. PERMISSIVE semantics: malformed JSON → NULL struct, never a
    failed job (matches the consumer's json.JSONDecodeError fallback,
    consumer.py:38-41).
    """
    events = read_table(spark, sf_dir, "events")
    return events.withColumn(
        "props_parsed", F.from_json(F.col("props"), "k BIGINT")
    )
