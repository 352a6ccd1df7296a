"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference pipeline (chezkiel/mini-project-big-data-analysis,
surveyed in SURVEY.md), re-expressed Spark-first.

The "engine" is deliberately a library layer over Spark SQL / DataFrame /
Structured Streaming (SURVEY.md §3.4): typed ingestion schemas, an operator
and function catalog, and a thin session module. Catalyst + Tungsten + AQE do
the planning and execution; we add no custom planner.

Subpackages
-----------
- ``session``    SparkSession construction (AQE on, UTC pinned)
- ``schemas``    explicit StructTypes for all inputs (schema-on-write posture)
- ``sources``    batch/stream readers and sinks
- ``functions``  scalar/column function catalog (datetime, json, text, vectors)
- ``operators``  relational + extension operators (dedup, similarity, text QA,
                 multimodal plumbing)
- ``streaming``  Structured Streaming pipelines (clean → sink, windowed aggs)
- ``queries``    the declared query catalog (SURVEY.md §2 ids) binding
                 operators to the driver's testdata, with DuckDB oracle SQL
- ``plans``      plan-inspection helpers used by tests to assert pushdown /
                 codegen / broadcast choices
"""

__version__ = "0.1.0"
