"""Projection / scalar-function queries (SURVEY.md §2.2).

Each declared ``fn_*`` / ``proj_*`` id gets a standalone binding on the
driver tables. Where the reference semantics need data shapes the tables
don't have (polymorphic JSON, nested weather documents), the query *derives*
that shape deterministically from `events` inside both engines — the oracle
reproduces the derivation in SQL, so the check still pins the function's
semantics, not the synthesizer's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import datetime_fns, json_fns
from ..schemas import WEATHER_ARRAY
from .base import load, register


@register(
    "proj_select_cols",
    "SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def proj_select_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-only-these-columns projection (analysis.ipynb:cell1:12)."""
    return load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@register(
    "proj_rename",
    "SELECT c_custkey AS id_pelanggan, c_name AS nama, c_acctbal AS saldo FROM customer",
)
def proj_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk column rename (analysis.ipynb:cell1:2-10 city→kota etc.)."""
    return (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .withColumnsRenamed(
            {"c_custkey": "id_pelanggan", "c_name": "nama", "c_acctbal": "saldo"}
        )
    )


# The full consumer flatten/clean/derive pipeline (consumer.py:32-76) run on a
# weather-shaped frame derived from events. Derivation rules (mirrored in SQL):
#   name       = event_type padded with spaces  (exercises the trim, producer.py:36)
#   main.temp  = value, NULLed for event_id%11==0  (completeness gate rows)
#   main.humidity = user_id%100 ; main.pressure = 1013
#   weather    = JSON string '[{"description": <event_type>}]', NULL for %7==0
#   wind.speed = value/2 ; dt = event_id+1.7e9 ; timezone = 25200 (UTC+7)
_NESTED_ORACLE = """
SELECT
  trim(event_type)                                   AS city,
  value                                              AS temperature,
  user_id % 100                                      AS humidity,
  CAST(1013 AS BIGINT)                               AS pressure,
  CASE WHEN event_id % 7 = 0 THEN 'Unknown' ELSE event_type END AS weather,
  round(value / 2, 6)                                AS wind_speed,
  strftime(to_timestamp(event_id + 1700000000) + to_seconds(25200),
           '%Y-%m-%d %H:%M:%S')                      AS local_time
FROM events
WHERE event_id % 11 <> 0
"""


@register("proj_nested_extract", _NESTED_ORACLE)
def proj_nested_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumer's entire clean pipeline (consumer.py:32-76) — nested
    extraction with defaults, polymorphic weather parse, completeness filter,
    epoch→local-time derivation — via operators.relational.clean_weather."""
    ev = load(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(F.lit("  "), F.col("event_type"), F.lit("  ")).alias("name"),
        F.struct(
            F.when(F.col("event_id") % 11 != 0, F.col("value")).alias("temp"),
            (F.col("user_id") % 100).alias("humidity"),
            F.lit(1013).cast("long").alias("pressure"),
        ).alias("main"),
        F.when(
            F.col("event_id") % 7 != 0,
            F.concat(
                F.lit('[{"description": "'), F.col("event_type"), F.lit('"}]')
            ),
        ).alias("weather_raw"),
        F.struct((F.col("value") / 2).alias("speed")).alias("wind"),
        F.struct(F.lit(0.0).alias("lon"), F.lit(0.0).alias("lat")).alias("coord"),
        (F.col("event_id") + 1_700_000_000).alias("dt"),
        F.lit(25200).cast("long").alias("timezone"),
    )
    from ..operators.relational import clean_weather

    cleaned = clean_weather(raw)
    # coordinates is a struct (engines render structs differently) and
    # humidity/pressure casts are already pinned — project the scalar columns.
    return cleaned.select(
        "city",
        "temperature",
        "humidity",
        "pressure",
        "weather",
        F.round("wind_speed", 6).alias("wind_speed"),
        "local_time",
    )


@register(
    "fn_json_parse_polymorphic",
    """
    SELECT event_id,
           CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS n_items
    FROM events
    """,
)
def fn_json_parse_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic JSON field (consumer.py:36-43): valid JSON-array string →
    parsed; malformed ('not-json') or NULL → empty array, never a failure."""
    ev = load(spark, sf_dir, "events")
    poly = (
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit('[{"description": "'), F.col("event_type"), F.lit('"}]')),
        )
        .when(F.col("event_id") % 3 == 1, F.lit("not-json"))
        .otherwise(F.lit(None).cast("string"))
    )
    parsed = json_fns.parse_polymorphic_array(poly, WEATHER_ARRAY)
    return ev.select("event_id", F.size(parsed).alias("n_items"))


@register(
    "fn_array_first_field",
    """
    SELECT event_id,
           CASE WHEN event_id % 2 = 0 THEN event_type ELSE 'Unknown' END AS description
    FROM events
    """,
)
def fn_array_first_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First array element's field with default (consumer.py:45
    weather_list[0].get('description', 'Unknown')), empty-array-safe."""
    ev = load(spark, sf_dir, "events")
    arr = F.when(
        F.col("event_id") % 2 == 0,
        F.array(F.struct(F.col("event_type").alias("description"))),
    ).otherwise(F.array().cast("array<struct<description:string>>"))
    return ev.select(
        "event_id",
        json_fns.first_element_field(arr, "description").alias("description"),
    )


@register(
    "fn_epoch_to_ts",
    """
    SELECT event_id,
           strftime(to_timestamp(event_id + 1700000000), '%Y-%m-%d %H:%M:%S') AS utc_ts
    FROM events
    """,
)
def fn_epoch_to_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch seconds → UTC timestamp (consumer.py:59 utcfromtimestamp)."""
    ev = load(spark, sf_dir, "events")
    epoch = F.col("event_id") + 1_700_000_000
    return ev.select(
        "event_id",
        datetime_fns.ts_format(datetime_fns.epoch_to_ts(epoch)).alias("utc_ts"),
    )


@register(
    "fn_ts_add_offset",
    """
    SELECT event_id,
           strftime(ts + to_seconds(user_id % 86400 - 43200),
                    '%Y-%m-%d %H:%M:%S') AS local_ts
    FROM events
    """,
)
def fn_ts_add_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row timezone-offset addition (consumer.py:60 + timedelta(seconds)),
    including negative offsets."""
    ev = load(spark, sf_dir, "events")
    off = F.col("user_id") % 86400 - 43200
    return ev.select(
        "event_id",
        datetime_fns.ts_format(
            datetime_fns.ts_add_offset_seconds("ts", off)
        ).alias("local_ts"),
    )


@register(
    "fn_ts_format",
    "SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str FROM events",
)
def fn_ts_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp → wire-format string (consumer.py:61, app.py:156)."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", datetime_fns.ts_format("ts").alias("ts_str"))


@register(
    "fn_ts_parse",
    """
    SELECT event_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s
    FROM events
    """,
)
def fn_ts_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String → timestamp parse (app.py:40 pd.to_datetime): format then
    re-parse the wire string; output epoch seconds to prove a real round-trip."""
    ev = load(spark, sf_dir, "events")
    parsed = datetime_fns.ts_parse(datetime_fns.ts_format("ts"))
    return ev.select("event_id", F.unix_timestamp(parsed).alias("epoch_s"))


@register(
    "fn_cast_round",
    """
    SELECT event_id,
           CAST(round_even(value, 0) AS DOUBLE) AS value_rounded,
           CAST(user_id % 100 AS INT)           AS h_int
    FROM events
    """,
)
def fn_cast_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coerce + round with pandas parity (app.py:44-45): banker's rounding
    (bround / round_even), int cast."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        datetime_fns.bround_like_pandas("value", 0).alias("value_rounded"),
        (F.col("user_id") % 100).cast("int").alias("h_int"),
    )


@register(
    "fn_dim_lookup",
    """
    SELECT c.c_custkey, c.c_nationkey,
           coalesce(n.n_name, 'Lainnya') AS nation_name
    FROM customer c
    LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 13) n
      ON c.c_nationkey = n.n_nationkey
    """,
)
def fn_dim_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dict-lookup enrichment with default (get_pulau app.py:25-29,46):
    broadcast left join + coalesce; the dim is filtered so the default
    actually fires for some rows."""
    from ..operators.relational import dim_lookup

    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 13)
    return dim_lookup(
        customer, nation, "c_nationkey", "n_nationkey", "n_name", "Lainnya",
        out_col="nation_name",
    )


@register(
    "fn_string_strip",
    "SELECT c_custkey, trim(concat('  ', c_name, '   ')) AS name_stripped FROM customer",
)
def fn_string_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace strip (producer.py:36 city.strip())."""
    c = load(spark, sf_dir, "customer")
    padded = F.concat(F.lit("  "), F.col("c_name"), F.lit("   "))
    return c.select("c_custkey", F.trim(padded).alias("name_stripped"))


_UNPIVOT_ORACLE = """
    SELECT o_orderkey, metric, value
    FROM (
        SELECT o_orderkey,
               o_totalprice AS totalprice,
               o_custkey::DOUBLE AS custkey
        FROM orders WHERE o_orderkey <= 100
    ) UNPIVOT INCLUDE NULLS (value FOR metric IN (totalprice, custkey))
"""


@register("proj_unpivot", _UNPIVOT_ORACLE)
def proj_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) — the inverse of agg_pivot's long→wide and
    the reshape every metrics store needs. Native `DataFrame.unpivot`: a
    row-local Expand (each input row emits one row per value column), no
    shuffle, no UDF; oracle is DuckDB's native UNPIVOT."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    wide = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return wide.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_TRY_CAST_ORACLE = """
    SELECT event_id,
           CASE WHEN regexp_matches(raw, '^\\s*[+-]?[0-9]+\\s*$')
                THEN TRY_CAST(raw AS BIGINT) END AS as_int,
           TRY_CAST(raw AS DOUBLE) AS as_double
    FROM (
        SELECT event_id,
               CASE event_id % 4 WHEN 0 THEN '42'
                                 WHEN 1 THEN '3.5'
                                 WHEN 2 THEN '12x'
                                 ELSE '' END AS raw
        FROM events
    )
"""


@register("fn_try_cast", _TRY_CAST_ORACLE)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant casting over deterministic dirty strings: try_cast
    maps unparseable input to NULL instead of throwing — the row-level
    escape hatch that keeps a 100 TB job alive under Spark 4's default ANSI
    mode (one '12x' in a trillion rows must not kill the stage). Engine
    divergence captured in the oracle: Spark's try_cast('3.5' AS BIGINT) is
    NULL (ANSI: no implicit fractional truncation) while DuckDB's TRY_CAST
    rounds to 4 — the oracle guards the integer path with a regex to mirror
    Spark's semantics (verified live)."""
    ev = load(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_id") % 4 == 0, "42")
        .when(F.col("event_id") % 4 == 1, "3.5")
        .when(F.col("event_id") % 4 == 2, "12x")
        .otherwise("")
    )
    return ev.select(
        "event_id",
        raw.try_cast("bigint").alias("as_int"),
        raw.try_cast("double").alias("as_double"),
    )


@register(
    "fn_map_wordcounts",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    )
    SELECT doc_id,
           count(DISTINCT token)                        AS n_distinct,
           count(*) FILTER (WHERE token = 'table')      AS n_table,
           count(*) FILTER (WHERE token = 'value')      AS n_value
    FROM toks GROUP BY doc_id
    """,
)
def fn_map_wordcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip (the one Spark container type the catalog hadn't
    exercised): per-doc word→count map built with map_from_entries over the
    aggregated (word, count) pairs, then consumed via try_element_at (ANSI
    mode: plain element_at throws on missing keys) and size(). The exported
    columns are scalars — map column ordering is engine-defined, so the map
    itself never crosses the comparator; the oracle recomputes the lookups
    relationally."""
    from .base import load

    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    mapped = counts.groupBy("doc_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("token", "c")))
        ).alias("wc")
    )
    return mapped.select(
        "doc_id",
        F.size("wc").alias("n_distinct"),
        F.coalesce(F.try_element_at("wc", F.lit("table")), F.lit(0)).alias("n_table"),
        F.coalesce(F.try_element_at("wc", F.lit("value")), F.lit(0)).alias("n_value"),
    )


@register(
    "fn_variant_json",
    """
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT)  AS k,
           props->>'$.k'                  AS k_str
    FROM events
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT type (semi-structured data without a declared
    schema — the OPEN alternative to stringly-typed JSON columns):
    ``parse_json`` ingests the payload once into the binary variant
    encoding, then ``variant_get`` extracts typed paths with per-path
    casts. Unlike from_json there is no up-front struct schema — the shape
    the consumer's schemaless JSON (consumer.py:24) actually has.

    Scale note: variant decode + path access are codegen'd columnar ops on
    the binary encoding (no per-row JSON re-parse per path, which the
    ->> twice-over string form pays). Oracle: DuckDB's JSON path
    extraction over the same payloads."""
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
        F.expr("variant_get(parse_json(props), '$.k', 'string')").alias("k_str"),
    )


_UDTF_ORACLE = """
WITH sents AS (
    SELECT doc_id, string_split(text, '. ') AS s FROM documents
)
SELECT doc_id,
       CAST(i - 1 AS INT) AS sent_idx,
       s[i]               AS sentence
FROM sents, unnest(generate_series(1, len(s))) u(i)
"""


@register("fn_udtf_sentences", _UDTF_ORACLE)
def fn_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function — completes the
    UDF/UDAF/UDTF surface next to agg_udaf_geomean and the pandas_udf
    scalar tier): one input doc row fans out to (sent_idx, sentence) rows
    through a LATERAL correlated call. The split rule is a literal '. '
    so DuckDB's non-regex string_split mirrors it exactly.

    Engine policy note (SURVEY §2.10): built-in posexplode(split(...))
    expresses THIS particular fan-out natively and stays in codegen —
    sql_lateral_view is that form. The UDTF exists as the tested template
    for generators with real per-row logic (sentence segmenters, parsers,
    tokenizers) that no built-in covers; per-row Python cost is the
    documented price, and the generator still runs data-parallel inside
    the scan stage with no shuffle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx INT, sentence STRING")
    class SplitSentences:
        def eval(self, text: str):  # noqa: ANN001 - Spark calls per row
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                yield i, s

    spark.udtf.register("split_sentences", SplitSentences)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM documents d, LATERAL split_sentences(d.text) s
        """
    )


_HOF_ORACLE = r"""
WITH t AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
    FROM documents
)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       len(list_filter(toks, x -> length(x) > 3))::BIGINT AS n_long,
       list_sum(list_transform(toks, x -> length(x)))::BIGINT AS total_len
FROM t
"""


@register("fn_array_hof", _HOF_ORACLE)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as a first-class surface: per-doc token
    stats computed with ``transform`` / ``filter`` / ``aggregate`` lambdas
    INSIDE the array column — no explode, no shuffle, no UDF. This is the
    idiom that replaces 'explode → aggregate → groupBy back' for row-scoped
    array work: the explode spelling shuffles token-grain rows to rebuild
    doc grain, while the lambda spelling is row-local codegen (size,
    list-filter count, running-sum fold) that pipelines into the scan.
    DuckDB's list_transform/list_filter/list_sum are the exact oracle
    twins."""
    docs = load(spark, sf_dir, "documents")
    docs = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("tk"))
    toks = F.col("tk")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.filter(toks, lambda x: F.length(x) > 3)).cast("long").alias(
            "n_long"
        ),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("total_len"),
    )


_COLLATE_ORACLE = """
WITH cased AS (
    SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS lang_cased
    FROM documents
)
SELECT lower(lang_cased) AS lang_norm,
       count(*)::BIGINT AS n
FROM cased
GROUP BY lower(lang_cased)
"""


@register("fn_collation_group", _COLLATE_ORACLE)
def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (headline Spark 4 feature): a mixed-case
    language column (half the rows deterministically upper-cased) grouped
    under the UTF8_LCASE collation, so 'EN' and 'en' land in ONE group
    without a lower() rewrite touching the data. Collation rides the
    string TYPE — comparisons, joins, and aggs all honor it once declared,
    which is the schema-level fix for the classic silently-case-split
    dimension. The output key is re-normalized through lower() because the
    collated group's representative casing is engine-internal; DuckDB
    states the lower() lowering the collation replaces."""
    docs = load(spark, sf_dir, "documents")
    cased = docs.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("lang_cased")
    )
    return (
        cased.groupBy(F.collate(F.col("lang_cased"), "UTF8_LCASE").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower(F.col("k")).alias("lang_norm"), "n")
    )
