r"""Round-6 time-series + statistics queries (SURVEY.md §2.9i):
hypertable-style gap filling with LOCF, EWMA smoothing, robust
(median/MAD) anomaly detection, MATCH_RECOGNIZE-lite sequence matching,
journey Markov transitions, trailing-baseline burst detection, hourly-rate
autocorrelation, winsorization, the two-sample KS drift statistic, and the
Gini concentration coefficient over the events/orders tables.

The reference's time handling stops at a pandas resample-free line chart
(``app.py:101-131`` plots raw rows ordered by timestamp); these model the
operations a metrics/observability pipeline actually runs at scale —
regular-grid densification, smoothing, outlier flagging, and ordered
pattern detection — so they derive from the north-star extension charter,
not reference behavior.

Every implementation is a pure window/aggregate composition (no UDFs, no
RNG); oracles mirror the exact arithmetic in DuckDB. Two cross-engine
lessons are baked in (ADVICE round 5): timestamp differences compare
``floor(epoch)`` seconds on both sides, and every tie-broken window orders
by ``(ts, event_id)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import load, register

# ---------------------------------------------------------------------------
# ext_time_gapfill — hourly spine densification + last-observation-carried-
# forward (the TimescaleDB time_bucket_gapfill / locf shape)
# ---------------------------------------------------------------------------

_GAPFILL_USERS = 10  # spine = users × span-hours; bounded and tiny per user

_GAPFILL_ORACLE = f"""
WITH ev AS (
    SELECT user_id, date_trunc('hour', ts) AS h, value
    FROM events WHERE user_id < {_GAPFILL_USERS}
), hourly AS (
    SELECT user_id, h, count(*)::BIGINT AS n_events,
           round(sum(value), 6) AS v_sum
    FROM ev GROUP BY user_id, h
), bounds AS (
    SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY user_id
), spine AS (
    SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
    FROM bounds
), j AS (
    SELECT s.user_id, s.h, hh.v_sum, coalesce(hh.n_events, 0) AS n_events
    FROM spine s LEFT JOIN hourly hh ON s.user_id = hh.user_id AND s.h = hh.h
), g AS (
    -- LOCF via the grouping trick: count(v) over the ordered prefix bumps
    -- at every non-null, so rows sharing a group share the last non-null
    SELECT *, count(v_sum) OVER (PARTITION BY user_id ORDER BY h) AS grp
    FROM j
)
SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_s, n_events,
       max(v_sum) OVER (PARTITION BY user_id, grp) AS v_filled,
       (v_sum IS NULL) AS is_gap
FROM g
"""


@register("ext_time_gapfill", _GAPFILL_ORACLE)
def ext_time_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap fill: densify each user's hourly activity onto a
    regular per-user [min-hour, max-hour] grid and carry the last observed
    hourly sum forward across empty hours (LOCF), flagging filled rows.

    Scale shape: the hourly pre-aggregation collapses the event log FIRST
    (map-side partials, one shuffle on (user, hour)); the spine is generated
    from a per-key 2-value bounds row via ``sequence``+``explode`` — rows
    materialize only post-shuffle, spine cardinality = span-hours per key,
    never event count. The spine⋈hourly join and the LOCF window reuse the
    same (user_id) partitioning, and LOCF is ``last(ignorenulls)`` over a
    running frame — state is one value per key, not the history. At 100 TB
    the same plan holds with (user, day-range) spine bucketing; nothing is
    driver-side."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < _GAPFILL_USERS)
        .select("user_id", F.date_trunc("hour", "ts").alias("h"), "value")
    )
    hourly = ev.groupBy("user_id", "h").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("v_sum"),
    )
    bounds = ev.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"),
    )
    j = spine.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("v_sum", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v_sum").isNull().alias("is_gap"),
    )


# ---------------------------------------------------------------------------
# ext_ewma_smooth — fixed-horizon exponentially-weighted moving average
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_LAGS = 8  # truncated horizon: weight below (1-a)^8 ≈ 0.058 dropped


def _ewma_terms_sql() -> tuple[str, str]:
    num, den = [], []
    for k in range(_EWMA_LAGS):
        w = f"{(1.0 - _EWMA_ALPHA) ** k!r}"
        lagv = f"lag(value, {k}) OVER w" if k else "value"
        num.append(f"coalesce({lagv}, 0.0) * {w}")
        den.append(f"(CASE WHEN {lagv} IS NOT NULL THEN {w} ELSE 0.0 END)")
    return " + ".join(num), " + ".join(den)


_EWMA_NUM, _EWMA_DEN = _ewma_terms_sql()

_EWMA_ORACLE = f"""
SELECT event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       round(({_EWMA_NUM}) / ({_EWMA_DEN}), 6) AS ewma
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
"""


@register("ext_ewma_smooth", _EWMA_ORACLE)
def ext_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing per event-type series (alpha=0.3), truncated to the
    last 8 observations and renormalized over the weights actually present
    — the standard monitoring smoother, made engine-portable by unrolling
    the recursion into a fixed lag polynomial.

    Scale shape: one window shuffle on event_type (the series key), then
    pure codegen arithmetic — the 8 lags compile into ONE window frame
    pass, no self-joins, no UDF. The truncation is what makes this scale:
    the true infinite-horizon EWMA needs sequential per-key state (a
    streaming transformWithState job), while the truncated form is
    embarrassingly window-parallel with bounded error 0.7^8 ≈ 5.8%.
    Both engines evaluate the identical left-to-right double sum, so
    round(·, 6) closes the ulp gap."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    num, den = F.lit(0.0), F.lit(0.0)
    for k in range(_EWMA_LAGS):
        wt = (1.0 - _EWMA_ALPHA) ** k
        lagv = F.lag("value", k).over(w) if k else F.col("value")
        num = num + F.coalesce(lagv, F.lit(0.0)) * F.lit(wt)
        den = den + F.when(lagv.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return ev.select(
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round(num / den, 6).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# ext_anomaly_mad — robust outlier detection: median / MAD z-score
# ---------------------------------------------------------------------------

_MAD_K = 1.4826  # consistency constant: MAD → sigma under normality
_MAD_CUT = 3.0

_MAD_ORACLE = f"""
WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events GROUP BY event_type
), dev AS (
    SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
    FROM events e JOIN med m USING (event_type)
), mad AS (
    SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev
    GROUP BY event_type
)
SELECT d.event_type,
       count(*)::BIGINT AS n,
       sum(CASE WHEN d.adev > {_MAD_CUT} * {_MAD_K} * a.mad
                THEN 1 ELSE 0 END)::BIGINT AS n_anomalies,
       round(any_value(d.med), 6) AS median_value,
       round(any_value(a.mad), 6) AS mad_value
FROM dev d JOIN mad a USING (event_type)
GROUP BY d.event_type
"""


@register("ext_anomaly_mad", _MAD_ORACLE)
def ext_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event type: flag values whose absolute
    deviation from the median exceeds 3·1.4826·MAD (median absolute
    deviation) — the estimator monitoring pipelines use because, unlike
    mean/stddev, a 50% outlier burst cannot drag the threshold.

    Scale shape: two grouped exact-percentile aggregations (Spark's
    ``percentile`` ≡ DuckDB ``quantile_cont``, both linear-interpolated on
    the sorted doubles), each one shuffle on the handful-cardinality type
    key; the per-type medians/MADs broadcast back onto the event stream
    (AQE picks broadcast — the stats side is rows=n_types). Exact medians
    at 100 TB would make these two shuffles sort-heavy; the documented
    swap-in is ``approx_percentile`` with a 1e-4 accuracy knob on the same
    plan. Counting, not filtering, keeps the output bounded."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", 0.5).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.col("adev") > F.lit(_MAD_CUT * _MAD_K) * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_anomalies"),
            F.round(F.any_value("med"), 6).alias("median_value"),
            F.round(F.any_value("mad"), 6).alias("mad_value"),
        )
    )


# ---------------------------------------------------------------------------
# ext_sequence_match — ordered event-pattern detection (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------

_SEQ_WINDOW_S = 1800  # error → purchase within 30 minutes

_SEQ_ORACLE = f"""
WITH ep AS (
    SELECT user_id, event_type, ts, event_id,
           lead(event_type) OVER w AS nxt_type,
           floor(epoch(lead(ts) OVER w))::BIGINT
             - floor(epoch(ts))::BIGINT AS gap_s
    FROM events
    WHERE event_type IN ('error', 'purchase')
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       count(*)::BIGINT AS n_matches,
       min(gap_s) AS fastest_s
FROM ep
WHERE event_type = 'error' AND nxt_type = 'purchase'
  AND gap_s <= {_SEQ_WINDOW_S}
GROUP BY user_id
"""


@register("ext_sequence_match", _SEQ_ORACLE)
def ext_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered sequence matching: per user, count error events whose NEXT
    error/purchase event is a purchase within 30 minutes (the
    MATCH_RECOGNIZE ``A B`` adjacency pattern, restricted to the two
    participating types) and the fastest such error→purchase gap.

    Scale shape: the type filter prunes the log in the scan (pushed
    predicate), then ONE window shuffle on user_id computes lead(type) and
    lead(ts) in a single frame pass, and the match predicate + grouped agg
    reuse that partitioning — the classic funnel/journey primitive without
    a self-join (the naive ts-band self-join is quadratic per user).
    Cross-engine: gaps compare floor(epoch) seconds on both sides and the
    window tie-breaks on (ts, event_id) — the two ADVICE-r5 precision
    rules."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("error", "purchase"))
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("nxt_type"),
        (
            F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")
        ).alias("gap_s"),
    )
    return (
        ep.filter(
            (F.col("event_type") == "error")
            & (F.col("nxt_type") == "purchase")
            & (F.col("gap_s") <= _SEQ_WINDOW_S)
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("gap_s").alias("fastest_s"),
        )
    )


# ---------------------------------------------------------------------------
# ext_markov_transitions — event-type transition matrix (journey analytics)
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type AS src,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS dst
    FROM events
), pairs AS (
    SELECT src, dst, count(*)::BIGINT AS n
    FROM seq WHERE dst IS NOT NULL
    GROUP BY src, dst
), tot AS (
    SELECT src, sum(n)::BIGINT AS n_src FROM pairs GROUP BY src
)
SELECT p.src, p.dst, p.n,
       round(p.n::DOUBLE / t.n_src, 6) AS p_transition
FROM pairs p JOIN tot t USING (src)
"""


@register("ext_markov_transitions", _MARKOV_ORACLE)
def ext_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event journeys:
    P(next = dst | current = src), estimated from each user's time-ordered
    sequence — the model behind next-action prediction, journey Sankeys,
    and absorbing-state funnel analysis.

    Scale shape: ONE window shuffle on user_id produces every adjacent
    pair via lead() (no self-join on sequence position), the (src, dst)
    count collapses map-side to ≤|types|² rows, and the row-normalization
    re-aggregates the collapsed matrix (never re-reading the log) before a
    broadcast-sized join keyed by src. The matrix is |types|² regardless
    of corpus size — everything after the first window is effectively
    free. Tie-break (ts, event_id) per the ADVICE-r5 rule."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    pairs = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("src").agg(F.sum("n").alias("n_src"))
    return pairs.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_src"), 6).alias(
            "p_transition"
        ),
    )


# ---------------------------------------------------------------------------
# ext_burst_detect — rate-spike detection against a trailing baseline
# ---------------------------------------------------------------------------

_BURST_TRAIL = 6  # trailing window, hours
_BURST_FACTOR = 2.0

_BURST_ORACLE = f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h, count(*)::BIGINT AS n
    FROM events GROUP BY event_type, date_trunc('hour', ts)
), trailed AS (
    SELECT event_type, h, n,
           avg(n) OVER (PARTITION BY event_type ORDER BY h
                        ROWS BETWEEN {_BURST_TRAIL} PRECEDING AND 1 PRECEDING)
               AS trail_avg,
           count(*) OVER (PARTITION BY event_type ORDER BY h
                          ROWS BETWEEN {_BURST_TRAIL} PRECEDING AND 1 PRECEDING)
               AS n_trail
    FROM hourly
)
SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_s, n,
       round(trail_avg, 6) AS trail_avg
FROM trailed
WHERE n_trail = {_BURST_TRAIL} AND n > {_BURST_FACTOR} * trail_avg
"""


@register("ext_burst_detect", _BURST_ORACLE)
def ext_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: flag hours where a type's event rate exceeds 2× its
    own trailing-6-hour average (full-history hours only, so partial
    baselines can't alarm) — the rate-anomaly monitor ops teams page on,
    complementing ext_anomaly_mad's value-space detector with a time-space
    one.

    Scale shape: the hourly pre-aggregation collapses the log FIRST (one
    shuffle, map-side partials); the trailing window then runs over
    hour-grain rows — span-hours × types, thousands of rows regardless of
    log size — partitioned by type. The window frame is ROWS-bounded, so
    state is 6 values; nothing here grows with event volume."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-_BURST_TRAIL, -1)
    )
    trailed = hourly.select(
        "event_type",
        "h",
        "n",
        F.avg("n").over(w).alias("trail_avg"),
        F.count(F.lit(1)).over(w).alias("n_trail"),
    )
    return trailed.filter(
        (F.col("n_trail") == _BURST_TRAIL)
        & (F.col("n") > _BURST_FACTOR * F.col("trail_avg"))
    ).select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
        "n",
        F.round("trail_avg", 6).alias("trail_avg"),
    )


# ---------------------------------------------------------------------------
# ext_autocorr — lag-1 autocorrelation of each type's hourly rate series
# ---------------------------------------------------------------------------

_AUTOCORR_ORACLE = """
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h, count(*)::DOUBLE AS n
    FROM events GROUP BY event_type, date_trunc('hour', ts)
), lagged AS (
    SELECT event_type, n,
           lag(n) OVER (PARTITION BY event_type ORDER BY h) AS n_prev
    FROM hourly
)
SELECT event_type,
       count(*)::BIGINT AS n_pairs,
       round(corr(n, n_prev), 6) AS acf1
FROM lagged WHERE n_prev IS NOT NULL
GROUP BY event_type
"""


@register("ext_autocorr", _AUTOCORR_ORACLE)
def ext_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's hourly rate series — the
    seasonality/persistence probe (high acf1 ⇒ momentum/periodicity worth a
    seasonal model; near 0 ⇒ Poisson-ish arrivals) that decides whether
    the burst detector's trailing-average baseline is even valid.

    Scale shape: same skeleton as ext_burst_detect — log collapses to
    hour grain first, ONE type-partitioned window aligns each hour with
    its predecessor, and ``corr`` is a distributive co-moment aggregate
    (Spark and DuckDB both compute sample correlation via single-pass
    co-moments, merged exactly across partitions)."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type", "n", F.lag("n").over(w).alias("n_prev")
    )
    return (
        lagged.filter(F.col("n_prev").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("n", "n_prev"), 6).alias("acf1"),
        )
    )


# ---------------------------------------------------------------------------
# ext_winsorize — percentile clipping + robust vs raw moment comparison
# ---------------------------------------------------------------------------

_WINSOR_LO = 0.01
_WINSOR_HI = 0.99

_WINSOR_ORACLE = f"""
WITH cuts AS (
    SELECT event_type,
           quantile_cont(value, {_WINSOR_LO}) AS lo,
           quantile_cont(value, {_WINSOR_HI}) AS hi
    FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*)::BIGINT AS n,
       sum(CASE WHEN e.value < c.lo OR e.value > c.hi THEN 1 ELSE 0 END)::BIGINT
           AS n_clipped,
       round(any_value(c.lo), 6) AS p01,
       round(any_value(c.hi), 6) AS p99,
       round(avg(e.value), 6) AS mean_raw,
       round(avg(CASE WHEN e.value < c.lo THEN c.lo
                      WHEN e.value > c.hi THEN c.hi
                      ELSE e.value END), 6) AS mean_winsor
FROM events e JOIN cuts c USING (event_type)
GROUP BY e.event_type
"""


@register("ext_winsorize", _WINSOR_ORACLE)
def ext_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit per event type: clip values to the [P1, P99]
    band and report raw vs winsorized means plus the clip count — the
    metric-hardening step reporting pipelines apply so a single corrupt
    reading can't move a dashboard mean (clipping, unlike dropping,
    preserves row count for ratio metrics).

    Scale shape: the cut points are one grouped exact-percentile agg
    (``percentile`` ≡ quantile_cont; swap approx_percentile at 100 TB on
    the same plan) broadcast back onto the stream — n_types rows — and the
    comparison is a single conditional-aggregation pass: one wide shuffle
    total beyond the percentile sort."""
    ev = load(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.percentile("value", _WINSOR_LO).alias("lo"),
        F.percentile("value", _WINSOR_HI).alias("hi"),
    )
    j = ev.join(F.broadcast(cuts), "event_type")
    clipped = (
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
            ).otherwise(0)
        ).alias("n_clipped"),
        F.round(F.any_value("lo"), 6).alias("p01"),
        F.round(F.any_value("hi"), 6).alias("p99"),
        F.round(F.avg("value"), 6).alias("mean_raw"),
        F.round(F.avg(clipped), 6).alias("mean_winsor"),
    )


# ---------------------------------------------------------------------------
# ext_ks_test — two-sample Kolmogorov–Smirnov statistic (ECDF distance)
# ---------------------------------------------------------------------------

_KS_ORACLE = """
WITH v AS (
    SELECT n_chars::DOUBLE AS x, lang = 'en' AS is_en FROM documents
), pts AS (
    SELECT x,
           sum(CASE WHEN is_en THEN 1 ELSE 0 END)::BIGINT AS ca,
           sum(CASE WHEN is_en THEN 0 ELSE 1 END)::BIGINT AS cb
    FROM v GROUP BY x
), tot AS (
    SELECT sum(ca)::DOUBLE AS na, sum(cb)::DOUBLE AS nb FROM pts
), ecdf AS (
    SELECT sum(ca) OVER (ORDER BY x) / tot.na AS fa,
           sum(cb) OVER (ORDER BY x) / tot.nb AS fb
    FROM pts CROSS JOIN tot
)
SELECT (SELECT na FROM tot)::BIGINT AS n_en,
       (SELECT nb FROM tot)::BIGINT AS n_other,
       round(max(abs(fa - fb)), 6) AS ks_d
FROM ecdf
"""


@register("ext_ks_test", _KS_ORACLE)
def ext_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the en and non-en
    document-length distributions — the continuous-variable drift test
    pairing ext_token_drift's categorical JS divergence (KS needs no
    binning choice; D = max ECDF gap, evaluated exactly at the observed
    points where the max must occur).

    Scale shape: values collapse to DISTINCT-VALUE grain first (one
    hash-agg with per-slice conditional counts — the length domain is
    small, so this is the big reduction); the two ECDFs come from running
    sums over ONE global sort of those distinct values (range-partitioned
    exchange, same machinery as orderBy — value-domain-sized, not
    corpus-sized); totals broadcast as a 1-row literal. All counts stay
    integer until the final two divisions, so both engines compare
    bit-identical ECDF steps."""
    docs = load(spark, sf_dir, "documents")
    v = docs.select(
        F.col("n_chars").cast("double").alias("x"),
        (F.col("lang") == "en").alias("is_en"),
    )
    pts = v.groupBy("x").agg(
        F.sum(F.when(F.col("is_en"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("is_en"), 0).otherwise(1)).alias("cb"),
    )
    tot = pts.agg(
        F.sum("ca").cast("double").alias("na"),
        F.sum("cb").cast("double").alias("nb"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ecdf = pts.join(F.broadcast(tot)).select(
        (F.sum("ca").over(w) / F.col("na")).alias("fa"),
        (F.sum("cb").over(w) / F.col("nb")).alias("fb"),
    )
    d = ecdf.agg(F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_d"))
    return (
        tot.select(
            F.col("na").cast("bigint").alias("n_en"),
            F.col("nb").cast("bigint").alias("n_other"),
        )
        .join(d)
    )


# ---------------------------------------------------------------------------
# ext_gini_concentration — spend-concentration (inequality) coefficient
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH cust AS (
    SELECT o_custkey, round(sum(o_totalprice) * 100)::BIGINT AS cents
    FROM orders GROUP BY o_custkey
), ranked AS (
    SELECT cents,
           row_number() OVER (ORDER BY cents, o_custkey) AS i
    FROM cust
)
SELECT count(*)::BIGINT AS n_customers,
       round(sum(cents) / 100.0, 2) AS total_spend,
       round(2.0 * sum(i * cents) / (count(*) * sum(cents))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM ranked
"""


@register("ext_gini_concentration", _GINI_ORACLE)
def ext_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the concentration audit run on
    corpora too (is 90% of the data coming from 1% of domains/users?),
    computed by the sorted-rank identity G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n.

    Scale shape: orders collapse to customer grain by one hash-agg; the
    global rank is ``operators.relational.distributed_global_rank`` (this
    query's inline spelling was the recipe's origin; round 8 moved it to
    the shared library) — bucket on VALUE-derived approxQuantile
    boundaries (ADVICE r6: never ``spark_partition_id`` across jobs; a
    value-derived bucket id cannot misalign no matter how often the
    subtree is recomputed), row_number within each bucket, per-bucket
    offsets from a broadcast self-cross of the ≤17-row bucket-count table
    — no unpartitioned WindowExec anywhere, one job end-to-end. Ties on
    cents share a bucket by construction, so the o_custkey tie-break
    stays bucket-local. The moments are distributive sums. Exactness
    trick: spend converts to integer CENTS before ranking and summation,
    and Σ i·xᵢ / Σx accumulate in DECIMAL(38,0) — rank × cents products
    overflow int64 already at the sf3 stress fixture (ANSI mode throws;
    caught by the round-8 scaling sweep), and DuckDB's BIGINT sum widens
    to HUGEINT for the same reason. Both engines therefore hold the sums
    EXACTLY and convert to double only at the final divisions — no float
    association noise, no overflow until 10³⁸."""
    from ..operators.relational import distributed_global_rank

    orders = load(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    ranked = distributed_global_rank(
        cust, "cents", ["o_custkey"], n_buckets=16
    ).select("cents", F.col("gr_i").alias("i"))
    n = F.count(F.lit(1))
    # decimal(18,0) × decimal(19,0) → decimal(38,0): exact, in-bounds
    s1 = F.sum(
        F.col("i").cast("decimal(18,0)") * F.col("cents").cast("decimal(19,0)")
    ).cast("double")
    s2 = F.sum(F.col("cents").cast("decimal(38,0)"))
    return ranked.agg(
        n.alias("n_customers"),
        F.round((s2 / 100.0).cast("double"), 2).alias("total_spend"),
        F.round(
            2.0 * s1 / (n * s2.cast("double")) - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# ext_changepoint_meanshift — binary-segmentation changepoint per series
# ---------------------------------------------------------------------------

_CHANGEPOINT_ORACLE = """
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h, count(*)::DOUBLE AS n
    FROM events GROUP BY event_type, date_trunc('hour', ts)
), idx AS (
    SELECT event_type, h, n,
           row_number() OVER w AS i,
           sum(n) OVER w AS s,
           count(*) OVER (PARTITION BY event_type) AS cnt,
           sum(n) OVER (PARTITION BY event_type) AS tot
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY h ROWS UNBOUNDED PRECEDING)
), scored AS (
    SELECT event_type, h, i, cnt,
           round(abs(s / i - (tot - s) / (cnt - i))
                 * sqrt(i * (cnt - i) / cnt::DOUBLE), 6) AS shift_score
    FROM idx WHERE i < cnt
), best AS (
    SELECT event_type, h, shift_score,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY shift_score DESC, h) AS rk
    FROM scored
)
SELECT event_type,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS split_hour,
       shift_score
FROM best WHERE rk = 1
"""


@register("ext_changepoint_meanshift", _CHANGEPOINT_ORACLE)
def ext_changepoint_meanshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint detection, binary-segmentation step: for each type's
    hourly rate series, the split hour maximizing the standardized
    before/after mean shift |μ_L − μ_R|·sqrt(i(n−i)/n) — the CUSUM-family
    statistic behind 'when did the rate regime change', and the recursive
    unit of full binary segmentation (re-run on each side).

    Scale shape: the log collapses to hour grain first; ONE ordered window
    per type yields index + prefix sum, so every candidate split is scored
    from two numbers — no per-split re-aggregation, no self-join (the
    naive spelling is O(n²) per series); the argmax is a rank-1 filter.
    The score rounds BEFORE ranking with an (score DESC, h) tie-break so
    both engines pick the identical split."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    idx = hourly.select(
        "event_type",
        "h",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("h"))
        .alias("i"),
        F.sum("n").over(w).alias("s"),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
        F.sum("n").over(w_all).alias("tot"),
    )
    scored = idx.filter(F.col("i") < F.col("cnt")).select(
        "event_type",
        "h",
        F.round(
            F.abs(
                F.col("s") / F.col("i")
                - (F.col("tot") - F.col("s")) / (F.col("cnt") - F.col("i"))
            )
            * F.sqrt(
                F.col("i")
                * (F.col("cnt") - F.col("i"))
                / F.col("cnt").cast("double")
            ),
            6,
        ).alias("shift_score"),
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.col("shift_score").desc(), "h"
    )
    return (
        scored.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("split_hour"),
            "shift_score",
        )
    )


# ---------------------------------------------------------------------------
# ext_psi_stability — Population Stability Index between time halves
# ---------------------------------------------------------------------------

_PSI_EPS = 1e-6

_PSI_ORACLE = f"""
WITH ref AS (
    SELECT value FROM events
    WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-16'
), cur AS (
    SELECT value FROM events
    WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-16'
), cuts AS (
    SELECT quantile_cont(value, 0.1) c1, quantile_cont(value, 0.2) c2,
           quantile_cont(value, 0.3) c3, quantile_cont(value, 0.4) c4,
           quantile_cont(value, 0.5) c5, quantile_cont(value, 0.6) c6,
           quantile_cont(value, 0.7) c7, quantile_cont(value, 0.8) c8,
           quantile_cont(value, 0.9) c9
    FROM ref
), bucketed AS (
    SELECT period, CASE WHEN value < c1 THEN 1 WHEN value < c2 THEN 2
                        WHEN value < c3 THEN 3 WHEN value < c4 THEN 4
                        WHEN value < c5 THEN 5 WHEN value < c6 THEN 6
                        WHEN value < c7 THEN 7 WHEN value < c8 THEN 8
                        WHEN value < c9 THEN 9 ELSE 10 END AS bucket
    FROM (SELECT 'ref' AS period, value FROM ref
          UNION ALL SELECT 'cur', value FROM cur) u
    CROSS JOIN cuts
), shares AS (
    SELECT bucket,
           greatest(count(*) FILTER (WHERE period = 'ref')::DOUBLE
                    / (SELECT count(*) FROM ref), {_PSI_EPS}) AS p,
           greatest(count(*) FILTER (WHERE period = 'cur')::DOUBLE
                    / (SELECT count(*) FROM cur), {_PSI_EPS}) AS q
    FROM bucketed GROUP BY bucket
)
SELECT bucket,
       round(p, 6) AS p_ref, round(q, 6) AS q_cur,
       round((p - q) * ln(p / q), 6) AS psi_term
FROM shares
"""


@register("ext_psi_stability", _PSI_ORACLE)
def ext_psi_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of the
    month, on reference-decile buckets of the value distribution — THE
    model-monitoring drift gauge (PSI > 0.2 = retrain alarm); complements
    KS (max gap) with a mass-weighted decomposition showing WHICH deciles
    moved.

    Scale shape: decile cut points are one exact-percentile aggregate over
    the reference slice (approx_percentile swaps in at 100 TB), broadcast
    as a 1-row literal into a row-local 10-branch CASE — bucketing never
    shuffles; the share table is one (period, bucket) hash-agg of 20 rows.
    Epsilon-flooring both shares identically keeps empty current-buckets
    finite on both engines."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cut_ts = F.lit("2024-01-16").cast("timestamp")
    ref = ev.filter(F.col("ts") < cut_ts)
    cur = ev.filter(F.col("ts") >= cut_ts)
    cuts = ref.agg(
        *[
            F.percentile("value", q).alias(f"c{i}")
            for i, q in enumerate(
                [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9], start=1
            )
        ]
    )
    u = ref.select(F.lit("ref").alias("period"), "value").unionByName(
        cur.select(F.lit("cur").alias("period"), "value")
    )
    bucket = F.lit(10)
    for i in range(9, 0, -1):
        bucket = F.when(F.col("value") < F.col(f"c{i}"), i).otherwise(bucket)
    # Period totals as a broadcast 1-row subtree instead of two driver-side
    # .count() jobs (round 17, guide §2.6/§5): the counts were two extra
    # serialized jobs per run; as a plan subtree they run inside the one
    # timed job. Division moves after the agg — double / long coerces
    # exactly like the previous double / Python-int literal.
    tot = ev.agg(
        F.sum(F.when(F.col("ts") < cut_ts, 1).otherwise(0)).alias("__n_ref"),
        F.sum(F.when(F.col("ts") >= cut_ts, 1).otherwise(0)).alias("__n_cur"),
    )
    shares = (
        u.join(F.broadcast(cuts))
        .select("period", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("period") == "ref", 1).otherwise(0))
            .cast("double")
            .alias("__s_ref"),
            F.sum(F.when(F.col("period") == "cur", 1).otherwise(0))
            .cast("double")
            .alias("__s_cur"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.greatest(
                F.col("__s_ref") / F.col("__n_ref"), F.lit(_PSI_EPS)
            ).alias("p"),
            F.greatest(
                F.col("__s_cur") / F.col("__n_cur"), F.lit(_PSI_EPS)
            ).alias("q"),
        )
    )
    return shares.select(
        "bucket",
        F.round("p", 6).alias("p_ref"),
        F.round("q", 6).alias("q_cur"),
        F.round(
            (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 6
        ).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# ext_seasonality_index — hour-of-day load profile per series
# ---------------------------------------------------------------------------

_SEASON_ORACLE = """
WITH hourly AS (
    SELECT event_type, extract(hour FROM ts)::BIGINT AS hod,
           count(*)::DOUBLE AS n
    FROM events GROUP BY event_type, extract(hour FROM ts)
), tot AS (
    SELECT event_type, sum(n) AS t FROM hourly GROUP BY event_type
)
SELECT h.event_type, h.hod,
       h.n::BIGINT AS n_events,
       round(h.n / t.t * 24.0, 6) AS seasonal_index
FROM hourly h JOIN tot t USING (event_type)
"""


@register("ext_seasonality_index", _SEASON_ORACLE)
def ext_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality index per event type: observed share of a
    type's events in each hour × 24, so 1.0 = flat, 2.0 = double the
    uniform rate — the load profile that (a) validates the burst
    detector's trailing baseline (strong seasonality needs a same-hour
    baseline instead) and (b) drives capacity scheduling.

    Scale shape: the log collapses straight to (type, hour-of-day) —
    ≤ 24·|types| rows — in one hash-agg with map-side combine; totals
    re-aggregate the collapsed profile and join back broadcast-sized.
    Row-local `extract(hour)`, no windows, nothing at event grain after
    the scan."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hod")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = hourly.groupBy("event_type").agg(F.sum("n").alias("t"))
    return hourly.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hod",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(F.col("n") / F.col("t") * 24.0, 6).alias("seasonal_index"),
    )


# ---------------------------------------------------------------------------
# ext_vocab_growth — vocabulary growth curve (Heaps' law audit)
# ---------------------------------------------------------------------------

_VOCAB_BUCKET = 50  # docs per curve point

_VOCAB_GROWTH_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM documents
), first_seen AS (
    SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok
), per_bucket AS (
    SELECT (first_doc // {_VOCAB_BUCKET})::BIGINT AS bucket,
           count(*)::BIGINT AS new_tokens
    FROM first_seen GROUP BY first_doc // {_VOCAB_BUCKET}
)
SELECT bucket, new_tokens,
       sum(new_tokens) OVER (ORDER BY bucket
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS vocab_size
FROM per_bucket
"""


@register("ext_vocab_growth", _VOCAB_GROWTH_ORACLE)
def ext_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (the Heaps'-law audit): tokens attributed to
    the document where they FIRST appear, rolled into 50-doc curve points
    with the cumulative vocabulary size — the corpus-diversity diagnostic
    (a flattening curve means new data is mostly repeating the old: the
    collect-more-data stopping signal; a linear one means heavy novelty —
    or an ID/noise column leaking into text).

    Scale shape: first-seen = one min-aggregate over the exploded tokens
    (map-side combine collapses the Zipf head); the curve is a bucket-grain
    re-agg (corpus_size/50 rows). That grain is still data-proportional,
    so the running total is TWO-PHASE rather than one unpartitioned window
    (the round-7 verdict's watch item): buckets roll into 1024-bucket
    superbucket partial sums, the cumulative offsets run over the
    superbucket table (corpus/51,200 grain — one task, but survivable past
    10¹² docs; the honest bound), and the final vocab_size is the
    broadcast offset plus a superbucket-LOCAL running window. No sort of
    the token stream, no per-doc set intersection — novelty falls out of
    min(doc_id)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    first_seen = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    per_bucket = first_seen.groupBy(
        F.floor(F.col("first_doc") / _VOCAB_BUCKET)
        .cast("bigint")
        .alias("bucket")
    ).agg(F.count(F.lit(1)).alias("new_tokens"))
    grain = 1024  # buckets per superbucket (offset-table shrink factor)
    sb = per_bucket.withColumn(
        "sb", F.floor(F.col("bucket") / grain).cast("bigint")
    )
    w_off = Window.orderBy("sb").rowsBetween(Window.unboundedPreceding, -1)
    off_df = (
        sb.groupBy("sb")
        .agg(F.sum("new_tokens").alias("sb_sum"))
        .select(
            "sb", F.coalesce(F.sum("sb_sum").over(w_off), F.lit(0)).alias("off")
        )
    )
    w_local = Window.partitionBy("sb").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        sb.join(F.broadcast(off_df), "sb")
        .select(
            "bucket",
            "new_tokens",
            (F.col("off") + F.sum("new_tokens").over(w_local))
            .cast("bigint")
            .alias("vocab_size"),
        )
    )


# ---------------------------------------------------------------------------
# ext_percentile_bands — hourly p50/p90/p99 value bands per series
# ---------------------------------------------------------------------------

_BANDS_ORACLE = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
       count(value)::BIGINT AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events WHERE value IS NOT NULL
GROUP BY event_type, date_trunc('hour', ts)
"""


@register("ext_percentile_bands", _BANDS_ORACLE)
def ext_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly p50/p90/p99 value bands per event type — the latency-
    percentile time series every SLO dashboard is built on (means hide
    tail regressions; the p99 band is where incidents live).

    Scale shape: one grouped aggregation computes all three EXACT
    percentiles in a single pass per (type, hour) group — Spark's
    ``percentile`` accepts an array of fractions, so the sort-per-group
    happens once, not three times. Groups are hour-bounded, so per-group
    state is one hour of values; the documented 100 TB swap-in is
    approx_percentile(value, array(...), 10000) on the identical plan
    (mergeable sketches, no per-group sort)."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pct = F.percentile("value", [0.5, 0.9, 0.99])
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count("value").alias("n"),
            F.round(pct[0], 6).alias("p50"),
            F.round(pct[1], 6).alias("p90"),
            F.round(pct[2], 6).alias("p99"),
        )
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
            "n",
            "p50",
            "p90",
            "p99",
        )
    )
