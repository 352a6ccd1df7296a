"""Relational operators (SURVEY.md §2.2-2.7) as a declarative library.

Everything here is a thin composition of DataFrame built-ins — deliberately
boring (SURVEY.md §7 "what's hard"), because Catalyst then gives predicate
pushdown, column pruning, broadcast selection and AQE for free. The value of
the layer is pinned semantics: sample stddev, banker's rounding, defaults on
non-matching joins, pandas-compatible pivot behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import datetime_fns, json_fns
from ..schemas import WEATHER_ARRAY


def clean_weather(raw: DataFrame) -> DataFrame:
    """The consumer's flatten/clean/derive pipeline (consumer.py:32-76) as
    one declarative projection + filter.

    Input shape: schemas.RAW_WEATHER with ``weather`` as a raw JSON string
    (the polymorphic boundary form). Output: schemas.CLEAN_WEATHER.
    Narrow, map-only — no shuffle at any scale.
    """
    weather_arr = json_fns.parse_polymorphic_array("weather_raw", WEATHER_ARRAY)
    return (
        raw.withColumn("weather_arr", weather_arr)
        .select(
            F.trim(F.col("name")).alias("city"),  # producer.py:36 strip
            F.col("main.temp").alias("temperature"),
            F.col("main.humidity").alias("humidity"),
            F.col("main.pressure").alias("pressure"),
            json_fns.first_element_field("weather_arr", "description").alias("weather"),
            F.col("wind.speed").alias("wind_speed"),
            F.col("coord").alias("coordinates"),
            datetime_fns.ts_format(
                datetime_fns.ts_add_offset_seconds(
                    datetime_fns.epoch_to_ts("dt"), "timezone"
                )
            ).alias("local_time"),
            F.col("dt"),
        )
        # completeness gate (consumer.py:55-57): temp, humidity, dt required
        .filter(
            F.col("temperature").isNotNull()
            & F.col("humidity").isNotNull()
            & F.col("dt").isNotNull()
        )
        .drop("dt")
    )


def dim_lookup(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_value: str,
    default: str,
    out_col: str | None = None,
) -> DataFrame:
    """Dictionary-lookup enrichment (get_pulau, app.py:25-29,46) as a
    broadcast left join with a default for non-matches.

    ``broadcast(dim)`` is load-bearing at scale: the dimension ships to every
    executor once and the fact table never shuffles.
    """
    out = out_col or dim_value
    # Alias the dim's columns before joining so a shared key name (city==city,
    # the documented get_pulau shape) never collides: DataFrame.drop(name)
    # removes ALL columns with that name, including the fact's.
    d = dim.select(
        F.col(dim_key).alias("__dim_key"), F.col(dim_value).alias("__dim_val")
    )
    joined = fact.join(
        F.broadcast(d), on=fact[fact_key] == d["__dim_key"], how="left"
    )
    return joined.withColumn(out, F.coalesce(F.col("__dim_val"), F.lit(default))).drop(
        "__dim_key", "__dim_val"
    )


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join (SURVEY.md §4.4): append a deterministic
    salt in [0, salt) to the fact side (hash of all its columns, so rows of
    one hot key scatter) and replicate the dim side ×salt, then join on
    (key, salt). Output is identical to the plain join; the hot key's rows
    land on ``salt`` reducers instead of one.

    Use when a known skewed key overwhelms AQE's runtime skew splitting
    (e.g. the NULL/default bucket of a dimension). Cost: dim inflates
    ×salt — only appropriate for broadcast-size-ish dims or modest salt.
    """
    fact_salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt))
    )
    dim_salted = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = fact_salted.join(
        dim_salted,
        on=[fact_salted[fact_key] == dim_salted[dim_key],
            fact_salted["__salt"] == dim_salted["__salt"]],
        how=how,
    )
    return joined.drop("__salt")


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """Frequency table (app.py:144-146): (value, count) sorted count-desc,
    value-asc tiebreak for determinism."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc(col))
    )


def describe_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """``df.describe()`` analog (analysis.ipynb:cell2:2) in long format:
    one row per column with count/mean/stddev/min/max.

    Exact (not approximate) everywhere so it is oracle-checkable; quartiles
    are intentionally excluded from the exact contract (Spark's summary()
    quartiles are approx — SURVEY.md §2.4 agg_describe note) and available
    via ``approx_quartiles``.
    """
    # ONE aggregate job over all columns (at 100 TB, one scan — not one per
    # column), then a stack() unpivot of the single result row into long form.
    aggs: list[Column] = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.round(F.avg(c), 6).alias(f"{c}__mean"),
            F.round(F.stddev_samp(c), 6).alias(f"{c}__stddev"),
            F.round(F.min(c).cast("double"), 6).alias(f"{c}__min"),
            F.round(F.max(c).cast("double"), 6).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', `{c}__n`, `{c}__mean`, `{c}__stddev`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS (column, n, mean, stddev, min, max)"
        )
    )


def approx_quartiles(df: DataFrame, col: str, accuracy: int = 10000) -> DataFrame:
    """25/50/75th percentiles via approx_percentile — the scale-appropriate
    sketch (exact percentiles need a full sort at 100 TB)."""
    return df.agg(
        F.percentile_approx(col, [0.25, 0.5, 0.75], accuracy).alias("quartiles")
    ).select(
        F.col("quartiles")[0].alias("q25"),
        F.col("quartiles")[1].alias("q50"),
        F.col("quartiles")[2].alias("q75"),
    )


def pivot_matrix(
    df: DataFrame,
    index: str,
    columns: str,
    values: str,
    pivot_values: list[str] | None = None,
) -> DataFrame:
    """Pivot table with mean aggfunc (app.py:153 pandas default).

    Passing ``pivot_values`` explicitly skips Spark's distinct-scan planning
    pass AND pins output column order — at 100 TB the implicit distinct over
    the pivot column is a full extra job, so callers should always pass it
    when the domain is known.
    """
    gb = df.groupBy(index)
    piv = gb.pivot(columns, pivot_values) if pivot_values else gb.pivot(columns)
    return piv.agg(F.round(F.avg(values), 6))


def global_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Multi-aggregate over the filtered set (app.py:116-124): mean/min/max/
    sample-stddev per column, single pass, single row."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.round(F.avg(c), 6).alias(f"avg_{c}"),
            F.round(F.min(c), 6).alias(f"min_{c}"),
            F.round(F.max(c), 6).alias(f"max_{c}"),
            F.round(F.stddev_samp(c), 6).alias(f"std_{c}"),
        ]
    return df.agg(*aggs)
