"""Fifth-wave behavioral-analytics coverage: weekly cohort retention,
stepwise funnel conversion, and SCD-2 validity-interval history — the
three shapes every product-analytics / warehouse user reaches for that
weren't yet first-class queries.

Cross-engine rules from plans/queries.py apply. date_trunc('week')
starts Monday on both engines; day arithmetic stays integral (datediff
// 7), never through doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table


@register(
    "cohort_retention_weekly",
    "Classic cohort retention: users grouped by first-activity week, "
    "counted in each subsequent activity week (week_offset = whole "
    "weeks since cohort). Two aggregations — per-user first week, then "
    "distinct users per (cohort_week, week_offset); the per-user table "
    "re-joins on user_id, partial-agg map-side both times. Retention "
    "fraction divides two exact integer counts.",
    """
    WITH first_week AS (
      SELECT user_id,
             CAST(min(date_trunc('week', ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_trunc('week', e.ts) AS TIMESTAMP) AS activity_week
      FROM events e JOIN first_week f ON e.user_id = f.user_id
    ),
    cohort_sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size
      FROM first_week GROUP BY cohort_week
    )
    SELECT a.cohort_week,
           CAST(datediff('day', a.cohort_week, a.activity_week) // 7 AS INTEGER)
             AS week_offset,
           COUNT(*) AS n_active,
           cs.cohort_size,
           CAST(COUNT(*) AS DOUBLE) / CAST(cs.cohort_size AS DOUBLE) AS retention
    FROM activity a JOIN cohort_sizes cs ON a.cohort_week = cs.cohort_week
    GROUP BY a.cohort_week, week_offset, cs.cohort_size
    """,
)
def q_cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_week = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    activity = (
        ev.join(first_week, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).alias("activity_week"),
        )
        .distinct()
    )
    cohort_sizes = first_week.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    week_offset = (
        F.floor(F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7)
        .cast("int")
        .alias("week_offset")
    )
    return (
        activity.join(F.broadcast(cohort_sizes), "cohort_week")
        .groupBy("cohort_week", week_offset, "cohort_size")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size").cast("double")).alias(
                "retention"
            ),
        )
    )


@register(
    "funnel_view_click_purchase",
    "Stepwise funnel with ORDER enforcement: first view, then the first "
    "click AT OR AFTER that view, then the first purchase at or after "
    "that click — a simple per-type min-ts misses the ordering and "
    "overcounts. Three narrow per-user aggregates chained by joins on "
    "user_id; each stage's table only shrinks. Emits one row per stage "
    "with the surviving-user count and conversion from stage 1.",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
      GROUP BY e.user_id
    ),
    counts AS (
      SELECT 1 AS stage, 'view' AS stage_name, COUNT(*) AS n_users FROM v
      UNION ALL
      SELECT 2, 'click_after_view', COUNT(*) FROM c
      UNION ALL
      SELECT 3, 'purchase_after_click', COUNT(*) FROM p
    )
    SELECT stage, stage_name, n_users,
           CAST(n_users AS DOUBLE)
             / NULLIF(CAST((SELECT n_users FROM counts WHERE stage = 1)
                           AS DOUBLE), 0)
             AS conversion
    FROM counts
    """,
)
def q_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(1).alias("stage"), F.lit("view").alias("stage_name"), "n_users"
        )
        .unionAll(
            c.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(2).alias("stage"),
                F.lit("click_after_view").alias("stage_name"),
                "n_users",
            )
        )
        .unionAll(
            p.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(3).alias("stage"),
                F.lit("purchase_after_click").alias("stage_name"),
                "n_users",
            )
        )
    )
    base = counts.filter(F.col("stage") == 1).select(
        F.col("n_users").alias("base_users")
    )
    return counts.crossJoin(F.broadcast(base)).select(
        "stage",
        "stage_name",
        "n_users",
        # NULLIF guard (CROSS_ENGINE rule 40): no view events -> base 0
        (
            F.col("n_users").cast("double")
            / F.nullif(F.col("base_users").cast("double"), F.lit(0.0))
        ).alias("conversion"),
    )


@register(
    "scd2_priority_history",
    "SCD-2 validity intervals: each customer's order stream becomes "
    "[valid_from, valid_to) state rows via lead() over (o_orderdate, "
    "o_orderkey) — the open interval carries the standard sentinel "
    "high date 9999-12-31 so current-state rows stay range-filterable. "
    "One shuffle on o_custkey, streaming window, no self-join "
    "— the standard warehouse dimension-history build.",
    """
    SELECT o_custkey, o_orderkey,
           o_orderpriority AS state,
           o_orderdate AS valid_from,
           COALESCE(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                    TIMESTAMP '9999-12-31') AS valid_to
    FROM orders
    """,
)
def q_scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderpriority").alias("state"),
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(
            F.lead("o_orderdate").over(w),
            F.lit("9999-12-31").cast("timestamp"),
        ).alias("valid_to"),
    )


@register(
    "incremental_mv_daily_revenue",
    "Incremental materialized-view maintenance: the daily per-type "
    "event rollup is maintained as merge(agg(base), agg(delta)) — "
    "SUM/COUNT are commutative monoids so the merged table equals the "
    "full recompute EXACTLY (decimal sums), which is precisely what the "
    "oracle asserts by computing the full agg directly. At scale this "
    "is the O(delta) refresh path: only new facts are scanned, the "
    "merge shuffles two small agg tables, and ratios (avg) re-derive "
    "from merged components (operators/cdc.py::merge_partial_aggs).",
    """
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_value
    FROM events
    GROUP BY event_type, day
    """,
)
def q_incremental_mv_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.operators import cdc

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    dec = F.col("value").cast("decimal(18,6)")

    def agg(part: DataFrame) -> DataFrame:
        return part.groupBy("event_type", day).agg(
            F.count(F.lit(1)).alias("n"), F.sum(dec).alias("sum_dec")
        )

    base = agg(ev.filter(F.col("ts") < cutoff))
    delta = agg(ev.filter(F.col("ts") >= cutoff))
    merged = cdc.merge_partial_aggs(
        base, delta, keys=["event_type", "day"], sum_cols=["sum_dec"]
    )
    return merged.select(
        "event_type",
        "day",
        "n",
        F.col("sum_dec").cast("double").alias("sum_value"),
        (F.col("sum_dec").cast("double") / F.col("n").cast("double")).alias("avg_value"),
    )


@register(
    "event_transition_matrix",
    "First-order Markov transitions: per user, each event's type paired "
    "with the NEXT event's type (lag/lead over (ts, event_id) — the "
    "unique id breaks timestamp ties deterministically), counted into "
    "the transition matrix with row-normalized probabilities. One "
    "shuffle for the window, one for the tiny 5×5 count table; "
    "probabilities divide exact integer counts.",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    counts AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
    FROM counts
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    row_total = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / row_total.cast("double")).alias("p"),
    )


@register(
    "twap_user_value",
    "Time-weighted average value per user: each event's value holds "
    "until the next event (lead over (ts, event_id)); TWAP = "
    "Σ(v·holding_seconds)/Σ(holding_seconds). Exactness: v quantizes "
    "to 1e-6 longs and the weighted sum accumulates in DECIMAL(38,0) — "
    "exact integer arithmetic, one double division at the end. The "
    "final (open-ended) event carries zero weight.",
    """
    WITH seq AS (
      SELECT user_id,
             CAST(round(value * 1000000.0) AS BIGINT) AS qv,
             CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT) AS hold_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    agg AS (
      SELECT user_id,
             COUNT(*) AS n_holds,
             CAST(SUM(hold_us) AS BIGINT) AS total_us,
             SUM(CAST(qv AS HUGEINT) * CAST(hold_us AS HUGEINT)) AS wsum
      FROM seq WHERE hold_us IS NOT NULL AND hold_us > 0
      GROUP BY user_id
    )
    -- exact quotient+remainder: wsum is ~1e20, past DOUBLE's 2^53 —
    -- and DuckDB's HUGEINT→DOUBLE conversion double-rounds while
    -- Spark's BigDecimal→double is correctly rounded (1-ulp drift).
    -- q <= 1e9 and rem < total_us < 2^53 convert EXACTLY on both.
    SELECT user_id, n_holds, total_us,
           (CAST(CAST(wsum // total_us AS BIGINT) AS DOUBLE)
            + CAST(CAST(wsum % total_us AS BIGINT) AS DOUBLE)
              / CAST(total_us AS DOUBLE)) / 1000000.0 AS twap
    FROM agg
    """,
)
def q_twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    qv = F.round(F.col("value") * 1000000.0).cast("long")
    hold_us = (
        F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    ).cast("long")
    seq = ev.select(
        "user_id", qv.alias("qv"), hold_us.alias("hold_us")
    ).filter(F.col("hold_us").isNotNull() & (F.col("hold_us") > 0))
    agg = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_holds"),
        F.sum("hold_us").cast("bigint").alias("total_us"),
        F.sum(
            F.col("qv").cast("decimal(38,0)") * F.col("hold_us").cast("decimal(38,0)")
        ).alias("wsum"),
    )
    quot = F.expr("CAST(wsum DIV total_us AS BIGINT)").cast("double")
    rem = F.expr("CAST(wsum % total_us AS BIGINT)").cast("double")
    return agg.select(
        "user_id",
        "n_holds",
        "total_us",
        ((quot + rem / F.col("total_us").cast("double")) / F.lit(1000000.0)).alias(
            "twap"
        ),
    )
