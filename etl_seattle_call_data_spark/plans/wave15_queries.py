"""Fifteenth-wave coverage: business-day SLA arithmetic and
distribution-free median confidence intervals.

docs/CROSS_ENGINE.md rules apply: integer epoch-day arithmetic
(rule 11), exact sqrt (rule 8), grouped two-phase ranking instead of
per-group single-reducer sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table

# Cumulative-weekday closed form: W(d) = 5*((d+3) DIV 7) + LEAST((d+3)%7, 5)
# counts weekdays in [Monday 1969-12-29, d) — business days between two
# dates is the difference W(d2)-W(d1), no per-day explode, no calendar
# table. (+3 aligns epoch day 0, a Thursday, to a Monday-started week.)
_W_SPARK = "(5 * ((({d}) + 3) DIV 7) + LEAST((({d}) + 3) % 7, 5))"
_W_DUCK = "(5 * ((({d}) + 3) // 7) + LEAST((({d}) + 3) % 7, 5))"


@register(
    "business_day_latency",
    "Order-to-ship latency in BUSINESS days per priority: weekday "
    "counts come from the closed-form cumulative function "
    "W(d) = 5*((d+3) DIV 7) + LEAST((d+3)%7, 5) evaluated at the two "
    "epoch-day endpoints — pure integer arithmetic, no calendar "
    "dimension, no per-day explode, identical on both engines. "
    "Reports mean/max business-day lag and the share beyond 60 "
    "business days — the SLA view operations actually contract on "
    "(calendar-day SLAs overcount weekends by ~40%%). One fact-order "
    "join + one bounded aggregate.",
    f"""
    WITH lag AS (
      SELECT o.o_orderpriority AS priority,
             {_W_DUCK.format(d="epoch_us(l.l_shipdate) // 86400000000")}
               - {_W_DUCK.format(d="epoch_us(o.o_orderdate) // 86400000000")}
               AS bdays
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(bdays) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mean_business_days,
           CAST(MAX(bdays) AS BIGINT) AS max_business_days,
           CAST(SUM(CASE WHEN bdays > 60 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS over_60bd_ppm
    FROM lag
    GROUP BY priority
    """,
)
def q_business_day_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    ship_w = _W_SPARK.format(d="unix_micros(l_shipdate) DIV 86400000000")
    order_w = _W_SPARK.format(d="unix_micros(o_orderdate) DIV 86400000000")
    lag = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(f"{ship_w} - {order_w}").alias("bdays"),
    )
    return lag.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        (F.sum("bdays").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_business_days"
        ),
        F.max("bdays").cast("bigint").alias("max_business_days"),
        F.expr(
            "CAST(SUM(CASE WHEN bdays > 60 THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("over_60bd_ppm"),
    )


@register(
    "median_ci_distribution_free",
    "Distribution-free 95%% confidence interval for the median of "
    "event values per type: the CI bounds are ORDER STATISTICS at "
    "ranks floor((n - 1.96*sqrt(n))/2) and ceil((n + 1.96*sqrt(n))/2 "
    "+ 1) (clamped to [1, n]) — the binomial-based interval that "
    "needs no normality assumption and no variance estimate, exact "
    "on both engines because sqrt is IEEE-correctly-rounded (rule 8) "
    "and floor/ceil of the identical double are deterministic. Ranks "
    "come from the grouped two-phase rank (operators/ranking.py — no "
    "per-type single-reducer sort); the three order statistics are "
    "picked by one conditional aggregate over the rank-joined rows.",
    """
    WITH ranked AS (
      SELECT event_type, value, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rnk
      FROM events
    ),
    stats AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
      GROUP BY event_type
    ),
    bounds AS (
      SELECT event_type, n,
             GREATEST(CAST(floor((CAST(n AS DOUBLE)
                                  - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0)
                           AS BIGINT), 1) AS lo_rank,
             LEAST(CAST(ceil((CAST(n AS DOUBLE)
                              + 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0 + 1.0)
                        AS BIGINT), n) AS hi_rank,
             (n + 1) // 2 AS med_rank
      FROM stats
    )
    SELECT b.event_type, b.n,
           MAX(CASE WHEN r.rnk = b.med_rank THEN r.value END) AS median,
           MAX(CASE WHEN r.rnk = b.lo_rank THEN r.value END) AS ci_lo,
           MAX(CASE WHEN r.rnk = b.hi_rank THEN r.value END) AS ci_hi
    FROM bounds b
    JOIN ranked r ON r.event_type = b.event_type
                 AND r.rnk IN (b.lo_rank, b.med_rank, b.hi_rank)
    GROUP BY b.event_type, b.n
    """,
)
def q_median_ci_distribution_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.operators.ranking import two_phase_rank_in_groups

    ev = load_table(spark, sf_dir, "events")
    ranked = two_phase_rank_in_groups(
        ev.select("event_type", "value", "event_id"),
        group_cols=["event_type"],
        order_by=["value", "event_id"],
        coarse=F.expr("CAST(floor(value) AS BIGINT)"),
        rank_name="rnk",
    )
    stats = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nd = F.col("n").cast("double")
    bounds = stats.select(
        "event_type",
        "n",
        F.greatest(
            F.floor((nd - 1.96 * F.sqrt(nd)) / 2.0).cast("bigint"), F.lit(1).cast("bigint")
        ).alias("lo_rank"),
        F.least(
            F.ceil((nd + 1.96 * F.sqrt(nd)) / 2.0 + 1.0).cast("bigint"), F.col("n")
        ).alias("hi_rank"),
        F.expr("(n + 1) DIV 2").alias("med_rank"),
    )
    joined = ranked.join(F.broadcast(bounds), "event_type").filter(
        (F.col("rnk") == F.col("lo_rank"))
        | (F.col("rnk") == F.col("med_rank"))
        | (F.col("rnk") == F.col("hi_rank"))
    )
    return joined.groupBy("event_type", "n").agg(
        F.max(F.when(F.col("rnk") == F.col("med_rank"), F.col("value"))).alias("median"),
        F.max(F.when(F.col("rnk") == F.col("lo_rank"), F.col("value"))).alias("ci_lo"),
        F.max(F.when(F.col("rnk") == F.col("hi_rank"), F.col("value"))).alias("ci_hi"),
    )
