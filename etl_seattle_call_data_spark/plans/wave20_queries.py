"""Twentieth-wave coverage: Holt linear exponential smoothing via a
recursive CTE, largest-remainder proration, boilerplate prefix census,
growth accounting, delta-method ratio-metric CIs, and Wasserstein-1
distribution drift.

docs/CROSS_ENGINE.md rules throughout: exact integer state machines
(rule 4 fixed point; the portable truncating intdiv spelled as
(x - x % d) / d so ONE shared recursive SQL string runs verbatim on
both engines), quotient+remainder splits for >2^63 moments, shared
IEEE trees for every float (rules 1-2, 8), bounded-grid integer CDFs,
rule-20 total orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.operators import dq
from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.plans.wave10_queries import (
    _SPLIT_DUCK,
    _SPLIT_SPARK,
    _split_double,
)
from etl_seattle_call_data_spark.sources.registry import load_table, load_tables


# ---------------------------------------------------------------------------
# Holt linear exponential smoothing (recursive CTE, shared SQL)
# ---------------------------------------------------------------------------

# Portable truncating integer division by a positive literal: x % d is
# dividend-signed on BOTH engines (rule 25), (x - x % d) is exactly
# divisible, the / is exact in double (|x| << 2^53), and the final cast
# truncates an already-integral double identically (DuckDB's round-on-
# cast and Spark's truncate agree on exact integers).
def _intdiv(x: str, d: int) -> str:
    return f"CAST((({x}) - ({x}) % {d}) / {d} AS BIGINT)"


_HOLT_SQL = f"""
    WITH RECURSIVE monthly AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) * 100
               + CAST(month(o_orderdate) AS INTEGER) AS ym,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
      FROM orders
      GROUP BY CAST(year(o_orderdate) AS INTEGER) * 100
               + CAST(month(o_orderdate) AS INTEGER)
    ),
    series AS (
      SELECT ym, x, ROW_NUMBER() OVER (ORDER BY ym) AS idx FROM monthly
    ),
    holt(t, level, trend, err_sum, n_err) AS (
      SELECT CAST(1 AS BIGINT), x, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT)
      FROM series WHERE idx = 1
      UNION ALL
      SELECT h.t + 1,
             {_intdiv('3 * s.x + 7 * (h.level + h.trend)', 10)},
             {_intdiv(
                 '(' + _intdiv('3 * s.x + 7 * (h.level + h.trend)', 10)
                 + ' - h.level) + 9 * h.trend', 10)},
             h.err_sum + abs(s.x - (h.level + h.trend)),
             h.n_err + 1
      FROM holt h JOIN series s ON s.idx = h.t + 1
    )
    SELECT CAST(t AS BIGINT) AS n_months,
           CAST(level AS DOUBLE) / 100.0 AS final_level_dollars,
           CAST(trend AS DOUBLE) / 100.0 AS final_trend_dollars,
           CAST(err_sum AS DOUBLE)
             / (100.0 * CAST(NULLIF(n_err, 0) AS DOUBLE))
             AS one_step_mae_dollars
    FROM holt WHERE t = (SELECT MAX(idx) FROM series)
"""


# Python truncating intdiv matching SQL's (x - x % d) / d with
# dividend-signed % (Python's % is divisor-signed, so spell truncation
# toward zero explicitly; d is a positive literal).
def _py_tdiv(x: int, d: int) -> int:
    return -((-x) // d) if x < 0 else x // d


@register(
    "holt_linear_smoothing_mae",
    "Holt's linear (double) exponential smoothing over the monthly "
    "revenue series: state (level, trend) advances one month per step "
    "with alpha=0.3, beta=0.1 in exact integer fixed point — the "
    "truncating division is spelled portably as (x - x%10)/10 so no "
    "dialect split exists — while the one-step-ahead absolute "
    "forecast errors accumulate alongside. Output: final level/trend "
    "and the one-step MAE (the exponential-smoothing baseline a "
    "forecaster must beat; complements the persistence baseline "
    "naive_ltv_forecast_mae). The oracle runs the recursion as ONE "
    "WITH RECURSIVE string; the Spark side does the heavy lifting "
    "(the monthly rollup — the only fact-scale pass) distributed, "
    "then collects the ~80-row monthly series (calendar-bounded at "
    "ANY SF, same bounded-driver-metadata convention as ranking.py's "
    "bucket offsets) and folds the inherently-sequential recursion in "
    "exact Python bigints: identical fixed-point arithmetic, one IEEE "
    "division at the end, without paying ~80 sequential Spark jobs of "
    "fixed scheduler cost for a 1-row-frontier recursion.",
    _HOLT_SQL,
)
def q_holt_linear_smoothing_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    load_tables(spark, sf_dir, names=("orders",))
    # Same rollup expressions as the oracle's `monthly` CTE, run on
    # Spark so round/cast semantics are engine-identical.
    monthly = spark.sql(
        """
        SELECT CAST(year(o_orderdate) AS INTEGER) * 100
                 + CAST(month(o_orderdate) AS INTEGER) AS ym,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
        FROM orders
        GROUP BY CAST(year(o_orderdate) AS INTEGER) * 100
                 + CAST(month(o_orderdate) AS INTEGER)
        """
    )
    series = sorted(
        ((r["ym"], r["x"]) for r in monthly.collect()), key=lambda p: p[0]
    )
    schema = T.StructType(
        [
            T.StructField("n_months", T.LongType()),
            T.StructField("final_level_dollars", T.DoubleType()),
            T.StructField("final_trend_dollars", T.DoubleType()),
            T.StructField("one_step_mae_dollars", T.DoubleType()),
        ]
    )
    if not series:
        return spark.createDataFrame([], schema)
    # Exact-integer Holt fold: mirrors the recursive CTE step for step.
    level, trend, err_sum, n_err = series[0][1], 0, 0, 0
    for _, x in series[1:]:
        err_sum += abs(x - (level + trend))
        n_err += 1
        new_level = _py_tdiv(3 * x + 7 * (level + trend), 10)
        trend = _py_tdiv((new_level - level) + 9 * trend, 10)
        level = new_level
    # Single-month series (n_err == 0): NULL on BOTH sides — the oracle
    # divides by NULLIF(n_err, 0), so neither engine evaluates 0.0/0.0
    # (whose NaN-vs-NULL result is a DuckDB config knob). Unreachable at
    # any shipped SF (orders spans ~80 months) but kept exact anyway.
    mae = float(err_sum) / (100.0 * float(n_err)) if n_err else None
    row = (len(series), float(level) / 100.0, float(trend) / 100.0, mae)
    return spark.createDataFrame([row], schema)


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) proration of a fixed budget
# ---------------------------------------------------------------------------

_LR_BUDGET = 10000


@register(
    "revenue_proration_largest_remainder",
    "Largest-remainder (Hamilton) apportionment: prorate a fixed "
    "budget of 10000 units across nations proportional to exact "
    "revenue cents so the allocation is INTEGER and sums EXACTLY to "
    "the budget — floor shares first, then one extra unit to the "
    "largest fractional remainders (remainder = rev*budget % total, "
    "exact BIGINT; ties broken by nation name, rule 20). The "
    "billing/budget primitive that naive rounding gets wrong (sums "
    "drift by a few units). One fact rollup + broadcast nation dim; "
    "ranking windows over the 25-row nation table.",
    f"""
    WITH nr AS (
      SELECT n.n_name AS nation,
             SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    ),
    t AS (SELECT SUM(cents) AS total, COUNT(*) AS n_nations FROM nr),
    base AS (
      SELECT nation, cents,
             cents * {_LR_BUDGET} // t.total AS floor_units,
             cents * {_LR_BUDGET} % t.total AS remainder,
             t.total AS total
      FROM nr, t
    ),
    ranked AS (
      SELECT nation, cents, floor_units, remainder,
             ROW_NUMBER() OVER (ORDER BY remainder DESC, nation) AS rr,
             {_LR_BUDGET} - SUM(floor_units) OVER () AS leftover
      FROM base
    )
    SELECT nation,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           CAST(floor_units AS BIGINT) AS floor_units,
           CAST(CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS extra_unit,
           CAST(floor_units + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
             AS BIGINT) AS allocated_units
    FROM ranked
    """,
)
def q_revenue_proration_largest_remainder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    nr = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
    )
    t = nr.agg(F.sum("cents").alias("total"))
    base = dq.scalar_join(nr, t).select(
        "nation",
        "cents",
        F.expr(f"cents * {_LR_BUDGET} DIV total").alias("floor_units"),
        F.expr(f"cents * {_LR_BUDGET} % total").alias("remainder"),
    )
    # 25-row nation table: bounded single-partition windows
    ranked = base.select(
        "nation",
        "cents",
        "floor_units",
        F.row_number()
        .over(Window.orderBy(F.col("remainder").desc(), "nation"))
        .alias("rr"),
        (F.lit(_LR_BUDGET) - F.sum("floor_units").over(Window.partitionBy()))
        .alias("leftover"),
    )
    extra = F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
    return ranked.select(
        "nation",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.col("floor_units").cast("bigint").alias("floor_units"),
        extra.cast("bigint").alias("extra_unit"),
        (F.col("floor_units") + extra).cast("bigint").alias("allocated_units"),
    )


# ---------------------------------------------------------------------------
# Boilerplate prefix census across the corpus
# ---------------------------------------------------------------------------

_BP_PREFIX = 40
_BP_TOPK = 15


@register(
    "boilerplate_prefix_census",
    "Boilerplate header census: the top repeated 40-char canonical "
    "prefixes across the corpus with document counts, distinct "
    "sources touched, and corpus share ppm — the cross-document "
    "template detector (license headers, scraped nav chrome) that "
    "in-document repetition signals (doc_repetition_ratios) cannot "
    "see. Pure groupBy on the prefix key (one shuffle, no pairwise "
    "anything — prefix equality IS the blocking), top-15 under the "
    "(count DESC, prefix) total order (rule 20).",
    f"""
    WITH p AS (
      SELECT substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
               1, {_BP_PREFIX}) AS prefix,
             source
      FROM documents
    ),
    g AS (
      SELECT prefix,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      FROM p GROUP BY prefix
    )
    SELECT prefix, n_docs, n_sources,
           CAST(n_docs * 1000000 // (SELECT COUNT(*) FROM documents)
             AS BIGINT) AS corpus_share_ppm
    FROM g
    ORDER BY n_docs DESC, prefix LIMIT {_BP_TOPK}
    """,
)
def q_boilerplate_prefix_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.operators.text import canonical_text

    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        F.substring(canonical_text(F.col("text")), 1, _BP_PREFIX).alias("prefix"),
        "source",
    )
    g = p.groupBy("prefix").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        dq.scalar_join(g, total)
        .select(
            "prefix",
            "n_docs",
            "n_sources",
            F.expr("CAST(n_docs * 1000000 DIV n_total AS BIGINT)").alias(
                "corpus_share_ppm"
            ),
        )
        .orderBy(F.col("n_docs").desc(), "prefix")
        .limit(_BP_TOPK)
    )


# ---------------------------------------------------------------------------
# Growth accounting (new / retained / resurrected / churned) per week
# ---------------------------------------------------------------------------


@register(
    "growth_accounting_weekly",
    "Growth accounting — the canonical active-user decomposition: "
    "per epoch-week, active users split into NEW (first week ever), "
    "RETAINED (active previous week), and RESURRECTED (returning "
    "after a gap), plus CHURNED-into-this-week (active last week, "
    "silent now), satisfying the exact identity active(w) = "
    "active(w-1) + new + resurrected - churned. Weeks are integer "
    "epoch-days DIV 7 (rule 11 — no ISO-week dialect drift); all "
    "windows partition by user (bounded per-user activity), then "
    "one bounded week rollup. The decomposition behind every "
    "'why did MAU move' review; complements weekly_churn_rates "
    "(rates) with the full additive ledger.",
    """
    WITH act AS (
      SELECT DISTINCT user_id,
             (epoch_us(ts) // 86400000000) // 7 AS wk
      FROM events
    ),
    seq AS (
      SELECT user_id, wk,
             LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
             LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
      FROM act
    ),
    states AS (
      SELECT wk,
             CAST(SUM(CASE WHEN prev_wk IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_new,
             CAST(SUM(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_retained,
             CAST(SUM(CASE WHEN prev_wk IS NOT NULL AND prev_wk < wk - 1
               THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
             CAST(COUNT(*) AS BIGINT) AS n_active
      FROM seq GROUP BY wk
    ),
    churn AS (
      SELECT wk + 1 AS wk, CAST(COUNT(*) AS BIGINT) AS n_churned
      FROM seq, (SELECT MAX(wk) AS maxwk FROM act) mx
      WHERE (next_wk IS NULL AND wk < mx.maxwk) OR next_wk > wk + 1
      GROUP BY wk + 1
    )
    SELECT s.wk, s.n_new, s.n_retained, s.n_resurrected, s.n_active,
           COALESCE(c.n_churned, 0) AS n_churned_into_week
    FROM states s LEFT JOIN churn c ON c.wk = s.wk
    """,
)
def q_growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.expr("(unix_micros(ts) DIV 86400000000) DIV 7").alias("wk")
    ).distinct()
    wu = Window.partitionBy("user_id").orderBy("wk")
    seq = act.select(
        "user_id",
        "wk",
        F.lag("wk").over(wu).alias("prev_wk"),
        F.lead("wk").over(wu).alias("next_wk"),
    )
    states = seq.groupBy("wk").agg(
        F.sum(F.when(F.col("prev_wk").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("prev_wk") == F.col("wk") - 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_wk").isNotNull()
                & (F.col("prev_wk") < F.col("wk") - 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
    )
    mx = act.agg(F.max("wk").alias("maxwk"))
    churn = (
        dq.scalar_join(seq, mx)
        .filter(
            (F.col("next_wk").isNull() & (F.col("wk") < F.col("maxwk")))
            | (F.col("next_wk") > F.col("wk") + 1)
        )
        .groupBy((F.col("wk") + 1).alias("wk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    return states.join(churn, "wk", "left").select(
        "wk",
        "n_new",
        "n_retained",
        "n_resurrected",
        "n_active",
        F.coalesce(F.col("n_churned"), F.lit(0)).cast("bigint").alias(
            "n_churned_into_week"
        ),
    )


# ---------------------------------------------------------------------------
# Delta-method CI for a ratio metric (spend per order) per segment
# ---------------------------------------------------------------------------


@register(
    "ratio_metric_delta_ci",
    "Delta-method confidence interval for a RATIO metric — spend "
    "per order by market segment, the canonical hard case in "
    "experiment readouts (both numerator and denominator are "
    "per-customer random variables; naive per-row averaging is "
    "biased). R = sum(x)/sum(y) over per-customer (spend cents, "
    "order count); since dbar = xbar - R*ybar = 0 by construction, "
    "Var(R) = (sxx - 2R sxy + R^2 syy)/((n-1) n ybar^2) and the "
    "95% CI is R +/- 1.96 se. All five moments are ONE exact "
    "integer aggregate pass (quotient+remainder split past 2^63), "
    "and R/se/CI are a single shared IEEE tree (rules 1-2, 8). "
    "Map-side-combinable; one customer-grain shuffle + segment "
    "rollup.",
    f"""
    WITH cust AS (
      SELECT c.c_mktsegment AS segment,
             SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment, o.o_custkey
    ),
    s AS (
      SELECT segment,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             SUM(x) AS sx_i, SUM(y) AS sy_i,
             SUM(x * x) AS sxx_i, SUM(x * y) AS sxy_i, SUM(y * y) AS syy_i
      FROM cust GROUP BY segment
    ),
    d AS (
      SELECT segment, n_customers,
             CAST(n_customers AS DOUBLE) AS nn,
             {_split_double('sx_i').format(**_SPLIT_DUCK)} AS sx,
             {_split_double('sy_i').format(**_SPLIT_DUCK)} AS sy,
             {_split_double('sxx_i').format(**_SPLIT_DUCK)} AS sxx,
             {_split_double('sxy_i').format(**_SPLIT_DUCK)} AS sxy,
             {_split_double('syy_i').format(**_SPLIT_DUCK)} AS syy
      FROM s
    )
    SELECT segment, n_customers,
           (sx / sy) / 100.0 AS spend_per_order,
           sqrt((sxx - 2.0 * (sx / sy) * sxy
                 + (sx / sy) * (sx / sy) * syy)
                / NULLIF((nn - 1.0) * nn, 0) / ((sy / nn) * (sy / nn))) / (nn * 100.0)
             * nn AS se_dollars,
           (sx / sy) / 100.0
             - 1.96 * (sqrt((sxx - 2.0 * (sx / sy) * sxy
                 + (sx / sy) * (sx / sy) * syy)
                / NULLIF((nn - 1.0) * nn, 0) / ((sy / nn) * (sy / nn))) / (nn * 100.0)
             * nn) AS ci_lo,
           (sx / sy) / 100.0
             + 1.96 * (sqrt((sxx - 2.0 * (sx / sy) * sxy
                 + (sx / sy) * (sx / sy) * syy)
                / NULLIF((nn - 1.0) * nn, 0) / ((sy / nn) * (sy / nn))) / (nn * 100.0)
             * nn) AS ci_hi
    FROM d
    """,
)
def q_ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("y"),
        )
    )
    s = cust.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx_i"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy_i"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx_i"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy_i"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy_i"),
    )
    d = s.select(
        "segment",
        "n_customers",
        F.col("n_customers").cast("double").alias("nn"),
        *[
            F.expr(_split_double(f"{c_}_i").format(**_SPLIT_SPARK)).alias(c_)
            for c_ in ("sx", "sy", "sxx", "sxy", "syy")
        ],
    )
    # NULLIF guard (rule 40): a 1-customer segment zeroes (nn-1)*nn
    se = (
        "sqrt((sxx - 2.0 * (sx / sy) * sxy"
        " + (sx / sy) * (sx / sy) * syy)"
        " / NULLIF((nn - 1.0) * nn, 0) / ((sy / nn) * (sy / nn))) / (nn * 100.0)"
        " * nn"
    )
    return d.select(
        "segment",
        "n_customers",
        F.expr("(sx / sy) / 100.0").alias("spend_per_order"),
        F.expr(se).alias("se_dollars"),
        F.expr(f"(sx / sy) / 100.0 - 1.96 * ({se})").alias("ci_lo"),
        F.expr(f"(sx / sy) / 100.0 + 1.96 * ({se})").alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Wasserstein-1 (earth mover's) distance between source length profiles
# ---------------------------------------------------------------------------

_W1_BUCKET_WIDTH = 4
_W1_BUCKETS = 256
_W1_SRC_A = "src0"
_W1_SRC_B = "src1"


@register(
    "source_divergence_wasserstein",
    "Wasserstein-1 (earth mover's) distance between two sources' "
    "document-length distributions on the equi-width 256-bucket "
    "grid: W1 = sum over buckets of |CDF_a - CDF_b| * width — the "
    "L1 drift metric that completes the divergence family (KS = "
    "sup-norm, CvM = L2, chi2 = pointwise): unlike KS it feels HOW "
    "FAR mass moved, not just the worst gap. Exact integers "
    "throughout: both CDFs cross-multiplied (|cum_a*n_b - "
    "cum_b*n_a|) so no per-bucket division, ONE final fixed-point "
    "division to micro-bucket-widths (rule 4). Both populations "
    "bucket in one conditional-aggregate scan; the cumsum runs over "
    "the bounded 256-row bucket table (same posture as "
    "source_divergence_ks).",
    f"""
    WITH d AS (
      SELECT LEAST(n_chars // {_W1_BUCKET_WIDTH}, {_W1_BUCKETS - 1}) AS b,
             CASE WHEN source = '{_W1_SRC_A}' THEN 1 ELSE 0 END AS ina,
             CASE WHEN source = '{_W1_SRC_B}' THEN 1 ELSE 0 END AS inb
      FROM documents
      WHERE source IN ('{_W1_SRC_A}', '{_W1_SRC_B}')
    ),
    g AS (
      SELECT b, SUM(ina) AS ca, SUM(inb) AS cb
      FROM d GROUP BY b
    ),
    cum AS (
      SELECT b,
             SUM(ca) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
             SUM(cb) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb,
             SUM(ca) OVER () AS na,
             SUM(cb) OVER () AS nb
      FROM g
    )
    SELECT CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST(COUNT(*) AS BIGINT) AS n_occupied_buckets,
           CAST(SUM(abs(fa * nb - fb * na)) * 1000000
                // (MAX(na) * MAX(nb)) AS BIGINT)
             AS w1_microbuckets
    FROM cum
    """,
)
def q_source_divergence_wasserstein(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin(_W1_SRC_A, _W1_SRC_B)
    )
    d = docs.select(
        F.least(
            F.expr(f"n_chars DIV {_W1_BUCKET_WIDTH}"), F.lit(_W1_BUCKETS - 1)
        ).alias("b"),
        F.when(F.col("source") == _W1_SRC_A, 1).otherwise(0).alias("ina"),
        F.when(F.col("source") == _W1_SRC_B, 1).otherwise(0).alias("inb"),
    )
    g = d.groupBy("b").agg(F.sum("ina").alias("ca"), F.sum("inb").alias("cb"))
    # bounded 256-row bucket table: single-partition windows by design
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = g.select(
        "b",
        F.sum("ca").over(wcum).alias("fa"),
        F.sum("cb").over(wcum).alias("fb"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    return cum.agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_occupied_buckets"),
        F.expr(
            "CAST(SUM(abs(fa * nb - fb * na)) * 1000000"
            " DIV (MAX(na) * MAX(nb)) AS BIGINT)"
        ).alias("w1_microbuckets"),
    )
