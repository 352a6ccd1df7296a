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
from pyspark.sql import types as T

from ..schemas import TABLE_SCHEMAS

TABLES = tuple(TABLE_SCHEMAS)


def _with_ntz(schema: T.StructType, *fields: str) -> T.StructType:
    """The declared schema with the named timestamp fields as NTZ — what
    the fixture footers actually carry for the TPC-H date columns."""
    return T.StructType(
        [
            T.StructField(f.name, T.TimestampNTZType(), f.nullable)
            if f.name in fields
            else f
            for f in schema.fields
        ]
    )


#: Footer-identical scan schemas (round 17, guide §1.2 fixed-cost audit).
#: ``spark.read.parquet`` without a schema runs a driver-side footer
#: inference pass PER CALL — measured 92–150 ms per read_table call at
#: sf0.1, about HALF the total cost of every sub-second catalog id; with
#: an explicit schema the same call is 27–60 ms. The schemas below are
#: byte-identical to what inference returns on every fixture SF
#: (verified across sf0.001/0.01/0.1: the only deltas from the DECLARED
#: schemas.py contract are o_orderdate/l_shipdate, which the footers
#: store as TIMESTAMP_NTZ), so plans, types, and results are unchanged —
#: the full 245-id differential pins that. At 100 TB skipping the footer
#: pass per query is the same win the module docstring always claimed.
_SCAN_SCHEMAS: dict[str, T.StructType] = {
    **{n: s for n, s in TABLE_SCHEMAS.items()},
    "orders": _with_ntz(TABLE_SCHEMAS["orders"], "o_orderdate"),
    "lineitem": _with_ntz(TABLE_SCHEMAS["lineitem"], "l_shipdate"),
}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table (full-collection scan analog, app.py:35-36)
    with the footer-identical explicit schema (no per-call inference)."""
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLE_SCHEMAS)}")
    if name == "events":
        from .events import load_events

        return load_events(spark, sf_dir)
    return spark.read.schema(_SCAN_SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")


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
