r"""Round-6 product-analytics queries (SURVEY.md §2.9g): cohort retention,
ordered conversion funnel, and deterministic A/B comparison — the
behavioral-analytics layer every event-log engine ends up serving (the
reference's dashboard aggregates per city, app.py:101-153; these are the
same event-log → metric shape at user grain).

All assignments/cuts are pure functions of the data (no RNG): the A/B arm
derives from ``md5(user_id || salt)`` exactly like the §2.9 hash-split
family, so the DuckDB oracles reproduce every output byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import distributed_global_rank, exact_ntile
from .base import load, register

# ---------------------------------------------------------------------------
# ext_retention_cohorts — classic D0/D1/…/DN cohort retention triangle
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH act AS (
    SELECT DISTINCT user_id, (floor(epoch(ts))::BIGINT // 86400) AS day
    FROM events
), first AS (
    SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id
)
SELECT f.cohort_day,
       (a.day - f.cohort_day)   AS day_offset,
       count(*)::BIGINT         AS n_users
FROM act a JOIN first f USING (user_id)
GROUP BY f.cohort_day, day_offset
"""


@register("ext_retention_cohorts", _RETENTION_ORACLE)
def ext_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day, counted
    on every (cohort, days-since-first) cell — the standard growth/churn
    readout.

    Scale shape: TWO exchanges total and no join — one user_id hash agg
    collecting each user's distinct active-day set (map-side partials
    collapse events to user-days before the shuffle; the set is bounded by
    the calendar, not by event volume), with the cohort read off the same
    set via array_min and offsets exploded inline; then the final
    (cohort, offset) agg. The naive distinct → min-agg → self-join plan
    costs a third exchange because the (user, day) distinct partitions by
    both columns."""
    ev = load(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400)
    per_user = ev.groupBy("user_id").agg(
        F.collect_set(day.alias("day")).alias("days")
    )
    return (
        per_user.select(
            F.array_min("days").alias("cohort_day"),
            F.explode("days").alias("day"),
        )
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# ext_funnel_steps — ordered conversion funnel (signup → click → purchase)
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH ev AS (
    SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS sec FROM events
), s1 AS (
    SELECT user_id, min(sec) AS t1 FROM ev WHERE event_type = 'signup'
    GROUP BY user_id
), s2 AS (
    SELECT e.user_id, min(e.sec) AS t2
    FROM ev e JOIN s1 USING (user_id)
    WHERE e.event_type = 'click' AND e.sec >= s1.t1
    GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, min(e.sec) AS t3
    FROM ev e JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.sec >= s2.t2
    GROUP BY e.user_id
)
SELECT * FROM (
    SELECT '1_signup' AS step, (SELECT count(*) FROM s1)::BIGINT AS n_users,
           1.0 AS conv_from_prev
    UNION ALL
    SELECT '2_click',
           (SELECT count(*) FROM s2)::BIGINT,
           round((SELECT count(*) FROM s2)::DOUBLE
                 / nullif((SELECT count(*) FROM s1), 0), 6)
    UNION ALL
    SELECT '3_purchase',
           (SELECT count(*) FROM s3)::BIGINT,
           round((SELECT count(*) FROM s3)::DOUBLE
                 / nullif((SELECT count(*) FROM s2), 0), 6)
)
"""


@register("ext_funnel_steps", _FUNNEL_ORACLE)
def ext_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: first signup, then first click AT OR AFTER
    it, then first purchase at or after that — per-step user counts and
    step-over-step conversion. Order sensitivity (each step only counts
    events after the previous step's time) is what separates a funnel from
    three independent counts.

    Scale shape: each step's filtered scan shuffles ONCE on user_id (k
    scan legs → k exchanges, each carrying only that step's event type);
    the min-aggs and step-joins between them reuse that partitioning with
    no re-exchange, and the final counts are scalar aggregates. A depth-k
    funnel is k chained semi-joins — never a per-user collect or a window
    over the whole event log."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("sec").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("sec") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("sec") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).alias("n")).withColumn("k", F.lit(1))
    n2 = s2.agg(F.count(F.lit(1)).alias("n")).withColumn("k", F.lit(1))
    n3 = s3.agg(F.count(F.lit(1)).alias("n")).withColumn("k", F.lit(1))
    wide = (
        n1.select(F.col("n").alias("c1"), "k")
        .join(n2.select(F.col("n").alias("c2"), "k"), "k")
        .join(n3.select(F.col("n").alias("c3"), "k"), "k")
    )
    return wide.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("1_signup").alias("step"),
                    F.col("c1").alias("n_users"),
                    F.lit(1.0).alias("conv_from_prev"),
                ),
                F.struct(
                    F.lit("2_click").alias("step"),
                    F.col("c2").alias("n_users"),
                    F.round(
                        F.col("c2").cast("double")
                        / F.nullif(F.col("c1"), F.lit(0)),
                        6,
                    ).alias("conv_from_prev"),
                ),
                F.struct(
                    F.lit("3_purchase").alias("step"),
                    F.col("c3").alias("n_users"),
                    F.round(
                        F.col("c3").cast("double")
                        / F.nullif(F.col("c2"), F.lit(0)),
                        6,
                    ).alias("conv_from_prev"),
                ),
            )
        ).alias("r")
    ).select("r.step", "r.n_users", "r.conv_from_prev")


# ---------------------------------------------------------------------------
# ext_ab_zscore — deterministic A/B comparison with Welch z-score
# ---------------------------------------------------------------------------

_AB_ARM = (
    "CASE WHEN (('0x' || substr(md5(user_id::VARCHAR || 'ab-v1'), 1, 8))"
    "::UBIGINT)::BIGINT < 2147483648 THEN 'A' ELSE 'B' END"
)

_AB_ORACLE = f"""
WITH armed AS (
    SELECT event_type, value, {_AB_ARM} AS arm
    FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       count(*) FILTER (WHERE arm = 'A')::BIGINT      AS n_a,
       count(*) FILTER (WHERE arm = 'B')::BIGINT      AS n_b,
       round(avg(value) FILTER (WHERE arm = 'A'), 6)  AS mean_a,
       round(avg(value) FILTER (WHERE arm = 'B'), 6)  AS mean_b,
       round((avg(value) FILTER (WHERE arm = 'A')
              - avg(value) FILTER (WHERE arm = 'B'))
             / sqrt(var_samp(value) FILTER (WHERE arm = 'A')
                        / count(*) FILTER (WHERE arm = 'A')
                    + var_samp(value) FILTER (WHERE arm = 'B')
                        / count(*) FILTER (WHERE arm = 'B')), 6) AS z_score
FROM armed
GROUP BY event_type
"""


@register("ext_ab_zscore", _AB_ORACLE)
def ext_ab_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B readout: users hash-split 50/50 (md5, same recipe
    as ext_split_hash — assignment is stable under re-partitioning and
    re-runs), per-metric Welch z-score between the arms. The experiment-
    analysis primitive, as ONE single-pass conditional aggregation.

    Scale shape: arm assignment is row-local; everything else is one hash
    agg per event_type with map-side partials (count/sum/sumsq are all
    distributive — no second pass, no pivot shuffle)."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    arm_hash = F.conv(
        F.substring(F.md5(F.concat(F.col("user_id").cast("string"), F.lit("ab-v1"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    armed = ev.select(
        "event_type",
        "value",
        F.when(arm_hash < 2147483648, "A").otherwise("B").alias("arm"),
    )
    a = F.col("arm") == "A"
    b = F.col("arm") == "B"
    va = F.when(a, F.col("value"))
    vb = F.when(b, F.col("value"))
    n_a = F.count(va)
    n_b = F.count(vb)
    mean_a = F.avg(va)
    mean_b = F.avg(vb)
    z = (mean_a - mean_b) / F.sqrt(
        F.var_samp(va) / n_a + F.var_samp(vb) / n_b
    )
    return armed.groupBy("event_type").agg(
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(z, 6).alias("z_score"),
    )


_SRM_ORACLE = f"""
WITH armed AS (
    SELECT DISTINCT user_id, {{arm}} AS arm
    FROM events
), c AS (
    SELECT count(*) FILTER (WHERE arm = 'A')::DOUBLE AS n_a,
           count(*) FILTER (WHERE arm = 'B')::DOUBLE AS n_b
    FROM armed
)
SELECT n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
       round(power(n_a - (n_a + n_b) / 2, 2) / ((n_a + n_b) / 2)
             + power(n_b - (n_a + n_b) / 2, 2) / ((n_a + n_b) / 2), 6)
           AS chi2,
       (power(n_a - (n_a + n_b) / 2, 2) / ((n_a + n_b) / 2)
        + power(n_b - (n_a + n_b) / 2, 2) / ((n_a + n_b) / 2)) > 3.841459
           AS srm_detected
FROM c
"""


@register("ext_ab_srm_check", _SRM_ORACLE.format(arm=_AB_ARM))
def ext_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the A/B split: a chi-square
    goodness-of-fit of the realized per-USER arm counts against the
    declared 50/50, flagged at the 95% critical value (3.841, df=1) — the
    first sanity check any experimentation platform runs, because a biased
    assignment invalidates every downstream readout (including
    ext_ab_zscore, which shares this exact md5 arm recipe).

    Scale shape: arm assignment is row-local; the per-user dedupe is one
    hash-agg (map-side partials collapse each user's events first); the
    chi-square itself is arithmetic over ONE 2-value row. Nothing leaves
    the executors but two counts."""
    ev = load(spark, sf_dir, "events")
    arm_hash = F.conv(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit("ab-v1"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    armed = ev.select(
        "user_id", F.when(arm_hash < 2147483648, "A").otherwise("B").alias("arm")
    ).distinct()
    c = armed.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("double")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("double")
        .alias("n_b"),
    )
    half = (F.col("n_a") + F.col("n_b")) / 2
    chi2 = (
        F.pow(F.col("n_a") - half, 2) / half + F.pow(F.col("n_b") - half, 2) / half
    )
    return c.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841459).alias("srm_detected"),
    )


_RFM_ORACLE = """
WITH per_user AS (
    SELECT user_id,
           date_diff('day', max(date_trunc('day', ts)),
                     DATE '2024-02-01') AS recency_days,
           count(*)::BIGINT AS frequency,
           round(sum(value), 6) AS monetary
    FROM events GROUP BY user_id
), scored AS (
    SELECT *,
           ntile(5) OVER (ORDER BY recency_days, user_id) AS r_score,
           ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
           ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_score
    FROM per_user
)
SELECT r_score, f_score, m_score,
       count(*)::BIGINT AS n_users,
       round(avg(monetary), 6) AS avg_monetary
FROM scored
GROUP BY r_score, f_score, m_score
"""


@register("ext_user_rfm", _RFM_ORACLE)
def ext_user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles, the
    classic CRM / engagement-tier model): per user days-since-last-activity
    against a fixed anchor date, event count, and value sum, each scored
    into quintiles (1 = best), rolled up to segment-cell counts.

    Scale shape: the log collapses to USER grain first (one hash-agg —
    map-side partials do the heavy lifting). User grain is
    data-proportional, so the three quintile cuts must NOT be spelled as
    unpartitioned ntile windows (Exchange SinglePartition + one WindowExec
    task each — the round-7 verdict caught exactly this): each score uses
    ``distributed_global_rank`` (value-derived quantile buckets +
    bucket-local row_number + in-plan offsets, the gini recipe) and
    ``exact_ntile`` row-local arithmetic — bit-identical to native
    ntile(5) with the same user_id tie-breaks, no single-reducer stage.
    All three bucket-boundary sets come from ONE multi-column
    approxQuantile action (descending keys negated first). The anchor
    date is pinned so recency is reproducible."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.datediff(
            F.lit("2024-02-01").cast("date"),
            F.max(F.date_trunc("day", "ts")).cast("date"),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("value"), 6).alias("monetary"),
    )
    keyed = per_user.withColumns(
        {
            "rec_key": F.col("recency_days").cast("double"),
            "neg_freq": -F.col("frequency").cast("double"),
            "neg_mon": -F.col("monetary"),
        }
    ).localCheckpoint(eager=True)  # events scan+agg runs ONCE: the
    # user-grain table feeds the boundary action AND the three rank
    # pipelines AND the final agg (executor-local materialization —
    # distributed, user-grain-sized, not a driver collect)
    n_buckets = 32
    probs = [i / n_buckets for i in range(1, n_buckets)]
    b_rec, b_frq, b_mon = keyed.approxQuantile(
        ["rec_key", "neg_freq", "neg_mon"], probs, 0.001
    )
    scored = keyed
    for key, tie, bounds, score in [
        ("rec_key", "user_id", b_rec, "r_score"),
        ("neg_freq", "user_id", b_frq, "f_score"),
        ("neg_mon", "user_id", b_mon, "m_score"),
    ]:
        scored = distributed_global_rank(
            scored, key, [tie], bounds=bounds, rank_col="gr_i", total_col="gr_n"
        )
        scored = scored.withColumn(score, exact_ntile("gr_i", "gr_n", 5)).drop(
            "gr_i", "gr_n"
        )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("monetary"), 6).alias("avg_monetary"),
    )


_SMOOTH_ALPHA = 50.0  # pseudo-count strength of the global prior

_SMOOTH_ORACLE = f"""
WITH per_user AS (
    SELECT user_id,
           count(*)::DOUBLE AS n,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::DOUBLE
               AS conv
    FROM events GROUP BY user_id
), prior AS (
    SELECT sum(conv) / sum(n) AS p FROM per_user
)
SELECT user_id,
       n::BIGINT AS n_events,
       conv::BIGINT AS n_purchases,
       round(conv / n, 6) AS raw_rate,
       round((conv + {_SMOOTH_ALPHA} * prior.p) / (n + {_SMOOTH_ALPHA}), 6)
           AS smoothed_rate
FROM per_user CROSS JOIN prior
"""


@register("ext_smoothed_rates", _SMOOTH_ORACLE)
def ext_smoothed_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes rate smoothing: each user's purchase rate shrunk
    toward the global prior with pseudo-count strength 50 — the standard
    fix for ranking/segmenting on rates when per-entity volume varies by
    orders of magnitude (a 1/2 user must not outrank a 40/100 user). The
    same shrinkage serves CTR features and low-volume segment dashboards.

    Scale shape: the log collapses to entity grain in one hash-agg; the
    global prior is a 1-row aggregate broadcast into a row-local formula —
    no second pass over events, no window. Output stays entity-grain."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("conv"),
    )
    prior = per_user.agg((F.sum("conv") / F.sum("n")).alias("p"))
    return per_user.join(F.broadcast(prior)).select(
        "user_id",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("conv").cast("bigint").alias("n_purchases"),
        F.round(F.col("conv") / F.col("n"), 6).alias("raw_rate"),
        F.round(
            (F.col("conv") + _SMOOTH_ALPHA * F.col("p"))
            / (F.col("n") + _SMOOTH_ALPHA),
            6,
        ).alias("smoothed_rate"),
    )


_POWER_Z = 2.8016  # z_{0.025} + z_{0.2}: 80% power at alpha = 0.05 two-sided

_POWER_ORACLE = f"""
WITH armed AS (
    SELECT event_type, value, {{arm}} AS arm
    FROM events WHERE value IS NOT NULL
), stats AS (
    SELECT event_type,
           count(*) FILTER (WHERE arm = 'A')::DOUBLE AS n_a,
           count(*) FILTER (WHERE arm = 'B')::DOUBLE AS n_b,
           var_samp(value) AS pooled_var
    FROM armed GROUP BY event_type
)
SELECT event_type,
       n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
       round(pooled_var, 6) AS pooled_var,
       round({_POWER_Z} * sqrt(pooled_var * (1.0 / n_a + 1.0 / n_b)), 6)
           AS mde_abs
FROM stats
"""


@register("ext_ab_power", _POWER_ORACLE.format(arm=_AB_ARM))
def ext_ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment POWER analysis: per metric (event type), the minimum
    detectable effect at 80% power / alpha 0.05 given the realized arm
    sizes and variance — mde = 2.8016·σ·sqrt(1/n_a + 1/n_b). Closes the
    experimentation suite (hash split → SRM guard → Welch readout →
    power): a 'no significant difference' readout is only interpretable
    next to the effect size the experiment could actually detect.

    Scale shape: arm assignment is the shared row-local md5 recipe; one
    conditional-aggregation pass per type computes counts and variance
    (single-pass co-moments); the MDE is row-local arithmetic on the
    5-row stats table."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    arm_hash = F.conv(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit("ab-v1"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    armed = ev.select(
        "event_type",
        "value",
        F.when(arm_hash < 2147483648, "A").otherwise("B").alias("arm"),
    )
    stats = armed.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("double")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("double")
        .alias("n_b"),
        F.var_samp("value").alias("pooled_var"),
    )
    return stats.select(
        "event_type",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round("pooled_var", 6).alias("pooled_var"),
        F.round(
            _POWER_Z
            * F.sqrt(
                F.col("pooled_var") * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
            ),
            6,
        ).alias("mde_abs"),
    )


_LIFT_ORACLE = """
WITH baskets AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day, event_type
    FROM events
), n_baskets AS (
    SELECT count(DISTINCT (user_id, day)) AS nb
    FROM baskets
), singles AS (
    SELECT event_type, count(*)::DOUBLE AS n FROM baskets
    GROUP BY event_type
), pairs AS (
    SELECT a.event_type AS item_a, b.event_type AS item_b,
           count(*)::DOUBLE AS n_ab
    FROM baskets a JOIN baskets b
      ON a.user_id = b.user_id AND a.day = b.day
     AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
)
SELECT item_a, item_b,
       n_ab::BIGINT AS n_baskets_ab,
       round(n_ab / nb, 6) AS support,
       round(n_ab / sa.n, 6) AS confidence_a_to_b,
       round(n_ab * nb / (sa.n * sb.n), 6) AS lift
FROM pairs
JOIN singles sa ON sa.event_type = item_a
JOIN singles sb ON sb.event_type = item_b
CROSS JOIN n_baskets
"""


@register("ext_basket_lift", _LIFT_ORACLE)
def ext_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over (user, day) baskets: support, confidence and
    LIFT for every event-type pair — the market-basket/frequent-itemset
    family (lift > 1 ⇒ the types co-occur beyond chance; the
    cross-sell / journey-affinity primitive, and at k=2 the exact core of
    Apriori).

    Scale shape: the log collapses to DISTINCT (basket, item) rows first
    (one hash-agg — the row count is baskets × avg distinct items, not
    events); the pair self-join keys on the basket id with an a<b
    orientation so each pair counts once; item marginals and the basket
    total re-aggregate the collapsed table and join back at |items|²
    grain. With a small item domain everything after the first agg is
    broadcast-sized; for web-scale item domains the standard refinement
    (count only pairs passing a min-support prefilter) drops in before
    the join."""
    ev = load(spark, sf_dir, "events")
    baskets = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day"), "event_type"
    ).distinct()
    # Round-17 measured-and-reverted: folding this count into the plan as a
    # broadcast 1-row subtree (the ext_psi_stability treatment) did NOT
    # drop the job count here (AQE spends a broadcast-preparation job on
    # the subtree; 11 jobs either way) and the interleaved A/B read flat
    # (median 1.300 vs 1.379 s at sf0.1) — the count over the already-
    # collapsed basket table is too cheap for the fusion to pay.
    nb = baskets.select("user_id", "day").distinct().count()
    singles = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("item_a"),
            F.col("b.event_type").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
    )
    sa = singles.select(
        F.col("event_type").alias("item_a"), F.col("n").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("item_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("n_ab").cast("bigint").alias("n_baskets_ab"),
            F.round(F.col("n_ab") / nb, 6).alias("support"),
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias(
                "confidence_a_to_b"
            ),
            F.round(
                F.col("n_ab") * nb / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
    )


_LTV_ORACLE = """
WITH firsts AS (
    SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
    FROM events GROUP BY user_id
), revenue AS (
    SELECT f.cohort_day,
           date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS offset_days,
           sum(e.value) AS v
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY f.cohort_day, date_diff('day', f.cohort_day, date_trunc('day', e.ts))
), sized AS (
    SELECT cohort_day, count(*)::DOUBLE AS cohort_users
    FROM firsts GROUP BY cohort_day
)
SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort_day,
       r.offset_days::BIGINT AS offset_days,
       round(sum(r.v) OVER (PARTITION BY r.cohort_day ORDER BY r.offset_days
                            ROWS UNBOUNDED PRECEDING)
             / s.cohort_users, 6) AS cum_value_per_user
FROM revenue r JOIN sized s USING (cohort_day)
"""


@register("ext_cohort_ltv", _LTV_ORACLE)
def ext_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: cumulative value per user by days-since-first-
    activity, one curve per acquisition-day cohort — the revenue twin of
    the retention triangle (ext_retention_cohorts), and the payback-period
    readout growth teams steer spend with.

    Scale shape: first-activity = one user hash-agg; the log joins to its
    cohort label on user_id (shuffle) and collapses immediately to
    (cohort, offset) grain — the curve table is days², tiny — before the
    running-sum window and the per-user normalization (cohort sizes
    broadcast back). No event-grain windows anywhere."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    revenue = (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day")).alias(
                "offset_days"
            ),
        )
        .agg(F.sum("value").alias("v"))
    )
    sized = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("double").alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("offset_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return revenue.join(F.broadcast(sized), "cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("offset_days").cast("bigint").alias("offset_days"),
        F.round(
            F.sum("v").over(w) / F.col("cohort_users"), 6
        ).alias("cum_value_per_user"),
    )


_ATTRIB_ORACLE = """
    WITH ev AS (
        SELECT event_id, ts, user_id, event_type FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
          AND event_type IN ('click', 'purchase')
    ), p AS (
        SELECT event_id AS purchase_id, user_id, ts AS p_ts
        FROM ev WHERE event_type = 'purchase'
    ), c AS (
        SELECT event_id AS click_id, user_id, ts AS c_ts
        FROM ev WHERE event_type = 'click'
    ), cand AS (
        SELECT p.purchase_id, c.click_id,
               (floor(epoch(p.p_ts)) - floor(epoch(c.c_ts)))::BIGINT AS gap_s,
               row_number() OVER (
                   PARTITION BY p.purchase_id
                   ORDER BY c.c_ts DESC, c.click_id DESC
               ) AS rn
        FROM p JOIN c
          ON p.user_id = c.user_id
         AND c.c_ts <= p.p_ts
         AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
    )
    SELECT p.purchase_id, p.user_id, w.click_id, w.gap_s
    FROM p LEFT JOIN (
        SELECT purchase_id, click_id, gap_s FROM cand WHERE rn = 1
    ) w ON p.purchase_id = w.purchase_id
"""


@register("ext_attribution_lasttouch", _ATTRIB_ORACLE)
def ext_attribution_lasttouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's most
    recent click no older than one hour (ties: the click sorts before a
    same-instant purchase; among same-instant clicks the highest event_id
    wins); purchases with no qualifying click stay unattributed (NULL) —
    the conversion-credit join every marketing-analytics stack runs.

    Scale shape: ONE shuffle on user_id — clicks and purchases are merged
    into a single event sequence and a running ``last(click, ignorenulls)``
    over (ts, kind, event_id) carries each user's latest click forward, so
    every purchase reads its answer row-locally from the frame. The
    SQL-oracle formulation (per-purchase candidate join + rank) would be
    O(clicks × purchases) within a user; the merged-sequence form is the
    scale-correct physical plan for the same semantics, and hash-matching
    the join form proves the rewrite."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isin("click", "purchase")
        )
        .select(
            "event_id",
            "ts",
            "user_id",
            F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = ev.withColumns(
        {
            "last_click_id": F.last(
                F.when(F.col("kind") == 0, F.col("event_id")), ignorenulls=True
            ).over(w),
            "last_click_ts": F.last(
                F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
            ).over(w),
        }
    )
    attributed = F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return seq.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(attributed, F.col("last_click_id")).alias("click_id"),
        F.when(
            attributed,
            F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts"),
        ).alias("gap_s"),
    )
