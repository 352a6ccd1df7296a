"""Explicit schemas (schema-on-write posture, SURVEY.md §1.3).

The reference is schema-on-read everywhere (pandas inference app.py:36,
defensive ``.get`` extraction consumer.py:32-53). We invert that: every
ingestion boundary declares a StructType, which buys columnar execution and
makes `from_json` parsing PERMISSIVE-but-typed.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver testdata tables (FIXTURES.md §A) — declared so scans never infer.
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# Reference-shaped weather documents (FIXTURES.md §B; consumer.py:32-53).
# ---------------------------------------------------------------------------

#: Raw OpenWeatherMap-shaped document (pre-cleaning). ``weather`` is declared
#: as its *string* encoding so the polymorphic string-or-array arrival
#: (consumer.py:36-43) is handled by `from_json` + coalesce, not Python.
RAW_WEATHER = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField(
            "main",
            T.StructType(
                [
                    T.StructField("temp", T.DoubleType()),
                    T.StructField("humidity", T.LongType()),
                    T.StructField("pressure", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "weather",
            T.ArrayType(T.StructType([T.StructField("description", T.StringType())])),
        ),
        T.StructField("wind", T.StructType([T.StructField("speed", T.DoubleType())])),
        T.StructField(
            "coord",
            T.StructType(
                [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
            ),
        ),
        T.StructField("dt", T.LongType()),
        T.StructField("timezone", T.LongType()),
    ]
)

#: Array-of-structs schema for the polymorphic ``weather`` field when it
#: arrives as a JSON *string* (consumer.py:37-41) and must be try-parsed.
WEATHER_ARRAY = T.ArrayType(
    T.StructType([T.StructField("description", T.StringType())])
)

#: Cleaned observation row (consumer.py:67-76).
CLEAN_WEATHER = T.StructType(
    [
        T.StructField("city", T.StringType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("humidity", T.LongType()),
        T.StructField("pressure", T.LongType()),
        T.StructField("weather", T.StringType()),
        T.StructField("wind_speed", T.DoubleType()),
        T.StructField(
            "coordinates",
            T.StructType(
                [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
            ),
        ),
        T.StructField("local_time", T.StringType()),
    ]
)

#: The city→island dimension (app.py:15-23) as a proper table.
DIM_ISLAND = T.StructType(
    [T.StructField("city", T.StringType()), T.StructField("pulau", T.StringType())]
)
