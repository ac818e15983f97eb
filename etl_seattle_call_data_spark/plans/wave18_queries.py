"""Eighteenth-wave coverage: Kendall tau-b, multivariate ridge
regression closed form, Wald-Wolfowitz runs test, key-sequence gap
audit, watermark lateness census (two-phase running max), and the
autocorrelation function of daily revenue.

docs/CROSS_ENGINE.md rules throughout: exact integer/DECIMAL moments
with one shared IEEE double tree at the end (rules 1-2), sqrt as the
only transcendental (rule 8), truncating DIV fixed point (rule 4),
discrete percentiles where a quantile re-enters arithmetic (rule 7),
rule-11 epoch-microsecond time math, rule-20 total orders on top-k.
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
from etl_seattle_call_data_spark.sources.registry import load_table


_DAILY_SQL = """
      SELECT date_trunc('day', o_orderdate) AS day,
             epoch_us(date_trunc('day', o_orderdate)) // 86400000000 AS dayno,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY date_trunc('day', o_orderdate)
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    day = F.date_trunc("day", "o_orderdate")
    return o.groupBy(day.alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    ).withColumn("dayno", F.expr("unix_micros(day) DIV 86400000000"))


# ---------------------------------------------------------------------------
# Kendall tau-b between daily revenue and daily order count
# ---------------------------------------------------------------------------


@register(
    "kendall_tau_daily",
    "Kendall tau-b rank association between daily revenue and daily "
    "order count: concordant/discordant/tied pair counts from the "
    "day-pair join (d1 < d2), tau-b = (C-D)/(sqrt(n0-Tx)*sqrt(n0-Ty)) "
    "— exact BIGINT counts into one shared IEEE tree (rules 1-2, 8). "
    "The pair join is over the CALENDAR-bounded daily aggregate "
    "(~2.4k rows at any SF, ~2.9M pairs — horizon^2, SF-invariant), "
    "so the quadratic lives on a fixed-size series, never on the "
    "fact table; the fact table contributes one shuffle into the "
    "daily rollup.",
    f"""
    WITH daily AS ({_DAILY_SQL}
    ),
    pr AS (
      SELECT CASE WHEN (a.rev - b.rev) * (a.n_orders - b.n_orders) > 0
                  THEN 1 ELSE 0 END AS con,
             CASE WHEN (a.rev - b.rev) * (a.n_orders - b.n_orders) < 0
                  THEN 1 ELSE 0 END AS dis,
             CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.n_orders = b.n_orders THEN 1 ELSE 0 END AS ty
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(con) AS BIGINT) AS c,
             CAST(SUM(dis) AS BIGINT) AS d,
             CAST(SUM(tx) AS BIGINT) AS tx,
             CAST(SUM(ty) AS BIGINT) AS ty
      FROM pr
    )
    SELECT n0 AS n_pairs, c AS concordant, d AS discordant,
           tx AS tied_revenue, ty AS tied_orders,
           CAST(c - d AS DOUBLE)
             / (sqrt(CAST(n0 - tx AS DOUBLE)) * sqrt(CAST(n0 - ty AS DOUBLE)))
             AS tau_b
    FROM s
    """,
)
def q_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    a = daily.select(
        F.col("day").alias("da"), F.col("rev").alias("ra"), F.col("n_orders").alias("na")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("rev").alias("rb"), F.col("n_orders").alias("nb")
    )
    pr = a.join(b, F.col("db") > F.col("da")).select(
        F.when((F.col("ra") - F.col("rb")) * (F.col("na") - F.col("nb")) > 0, 1)
        .otherwise(0)
        .alias("con"),
        F.when((F.col("ra") - F.col("rb")) * (F.col("na") - F.col("nb")) < 0, 1)
        .otherwise(0)
        .alias("dis"),
        F.when(F.col("ra") == F.col("rb"), 1).otherwise(0).alias("tx"),
        F.when(F.col("na") == F.col("nb"), 1).otherwise(0).alias("ty"),
    )
    s = pr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum("con").cast("bigint").alias("c"),
        F.sum("dis").cast("bigint").alias("d"),
        F.sum("tx").cast("bigint").alias("tx"),
        F.sum("ty").cast("bigint").alias("ty"),
    )
    return s.select(
        F.col("n0").alias("n_pairs"),
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.col("tx").alias("tied_revenue"),
        F.col("ty").alias("tied_orders"),
        F.expr(
            "CAST(c - d AS DOUBLE)"
            " / (sqrt(CAST(n0 - tx AS DOUBLE)) * sqrt(CAST(n0 - ty AS DOUBLE)))"
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Ridge regression (2 regressors + intercept) via closed-form normal equations
# ---------------------------------------------------------------------------

_RIDGE_LAMBDA = 1000000.0

# Shared 3x3 Cramer solve on the 9 exact moment columns (n, s1, s2, sy,
# s11, s12, s22, s1y, s2y are bit-identical doubles cast from DECIMAL
# sums on both engines, lam is a literal): determinants are a fixed
# expression tree, so both engines round identically (rules 1-2).
_RIDGE_DET = (
    "(nn * ((s11 + lam) * (s22 + lam) - s12 * s12)"
    " - s1 * (s1 * (s22 + lam) - s12 * s2)"
    " + s2 * (s1 * s12 - (s11 + lam) * s2))"
)
_RIDGE_B0 = (
    "(sy * ((s11 + lam) * (s22 + lam) - s12 * s12)"
    " - s1 * (s1y * (s22 + lam) - s12 * s2y)"
    " + s2 * (s1y * s12 - (s11 + lam) * s2y))"
)
_RIDGE_B1 = (
    "(nn * (s1y * (s22 + lam) - s12 * s2y)"
    " - sy * (s1 * (s22 + lam) - s12 * s2)"
    " + s2 * (s1 * s2y - s1y * s2))"
)
_RIDGE_B2 = (
    "(nn * ((s11 + lam) * s2y - s1y * s12)"
    " - s1 * (s1 * s2y - s1y * s2)"
    " + sy * (s1 * s12 - (s11 + lam) * s2))"
)


@register(
    "ridge_normal_equations",
    "Closed-form ridge regression per return flag: quantity ~ "
    "price_cents + discount_bp with L2 penalty lambda=1e6 on the two "
    "slopes (intercept unpenalized — the standard convention), "
    "solved by Cramer's rule on the 3x3 normal equations. The nine "
    "sufficient statistics are ONE exact DECIMAL(38,0) aggregate "
    "pass over the fact table (price^2 sums pass 2^53 long before "
    "sf1 — rule 1), cast to double once; the three determinants are "
    "a single shared IEEE expression tree (rule 2), so both engines "
    "produce bit-identical coefficients. The multivariate sibling "
    "of the wave-13 per-nation simple OLS: map-side-combinable "
    "moments, zero extra shuffles beyond the group-by. Moment sums "
    "pass 2^63 at sf1, so every sum reaches DOUBLE via the "
    "quotient+remainder split (wave10_queries._split_double) — "
    "plain decimal/hugeint->double casts round differently per "
    "engine above 2^63.",
    f"""
    WITH li AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS BIGINT) AS y,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS x1,
             CAST(round(l_discount * 10000) AS BIGINT) AS x2
      FROM lineitem
    ),
    s AS (
      SELECT flag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             SUM(x1) AS s1_i, SUM(x2) AS s2_i, SUM(y) AS sy_i,
             SUM(x1 * x1) AS s11_i, SUM(x1 * x2) AS s12_i,
             SUM(x2 * x2) AS s22_i,
             SUM(x1 * y) AS s1y_i, SUM(x2 * y) AS s2y_i
      FROM li GROUP BY flag
    ),
    d AS (
      SELECT flag, n_rows,
             CAST(n_rows AS DOUBLE) AS nn,
             {_split_double('s1_i').format(**_SPLIT_DUCK)} AS s1,
             {_split_double('s2_i').format(**_SPLIT_DUCK)} AS s2,
             {_split_double('sy_i').format(**_SPLIT_DUCK)} AS sy,
             {_split_double('s11_i').format(**_SPLIT_DUCK)} AS s11,
             {_split_double('s12_i').format(**_SPLIT_DUCK)} AS s12,
             {_split_double('s22_i').format(**_SPLIT_DUCK)} AS s22,
             {_split_double('s1y_i').format(**_SPLIT_DUCK)} AS s1y,
             {_split_double('s2y_i').format(**_SPLIT_DUCK)} AS s2y,
             CAST({_RIDGE_LAMBDA} AS DOUBLE) AS lam
      FROM s
    )
    SELECT flag, n_rows,
           {_RIDGE_B0} / {_RIDGE_DET} AS beta0,
           {_RIDGE_B1} / {_RIDGE_DET} AS beta1,
           {_RIDGE_B2} / {_RIDGE_DET} AS beta2
    FROM d
    """,
)
def q_ridge_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("y"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 10000).cast("bigint").alias("x2"),
    )

    def isum(expr: str, alias: str):
        return F.sum(F.expr(expr).cast("decimal(38,0)")).alias(alias)

    def split(name: str, alias: str):
        return F.expr(_split_double(name).format(**_SPLIT_SPARK)).alias(alias)

    s = li.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        isum("x1", "s1_i"),
        isum("x2", "s2_i"),
        isum("y", "sy_i"),
        isum("x1 * x1", "s11_i"),
        isum("x1 * x2", "s12_i"),
        isum("x2 * x2", "s22_i"),
        isum("x1 * y", "s1y_i"),
        isum("x2 * y", "s2y_i"),
    )
    d = s.select(
        "flag",
        "n_rows",
        F.col("n_rows").cast("double").alias("nn"),
        split("s1_i", "s1"),
        split("s2_i", "s2"),
        split("sy_i", "sy"),
        split("s11_i", "s11"),
        split("s12_i", "s12"),
        split("s22_i", "s22"),
        split("s1y_i", "s1y"),
        split("s2y_i", "s2y"),
        F.lit(_RIDGE_LAMBDA).cast("double").alias("lam"),
    )
    return d.select(
        "flag",
        "n_rows",
        F.expr(f"{_RIDGE_B0} / {_RIDGE_DET}").alias("beta0"),
        F.expr(f"{_RIDGE_B1} / {_RIDGE_DET}").alias("beta1"),
        F.expr(f"{_RIDGE_B2} / {_RIDGE_DET}").alias("beta2"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily revenue
# ---------------------------------------------------------------------------


@register(
    "runs_test_daily",
    "Wald-Wolfowitz runs test for serial randomness of daily revenue "
    "around its median: days strictly above/below the DISCRETE "
    "median (quantile_disc — rule 7; equal-to-median days drop, the "
    "standard convention), R = number of sign runs in day order, "
    "z = (R - (1 + 2*n1*n2/n)) / sqrt(2*n1*n2*(2*n1*n2 - n) / "
    "(n^2*(n-1))) — exact BIGINT counts into one shared IEEE tree. "
    "Complements Pettitt/CUSUM (level shifts) by testing serial "
    "DEPENDENCE. Runs counted by a lag comparison over the "
    "calendar-bounded day table (~2.4k rows at any SF).",
    f"""
    WITH daily AS ({_DAILY_SQL}
    ),
    med AS (SELECT quantile_disc(rev, 0.5) AS m FROM daily),
    sgn AS (
      SELECT day, CASE WHEN rev > m THEN 1 ELSE 0 END AS above
      FROM daily, med WHERE rev <> m
    ),
    runs AS (
      SELECT above,
             CASE WHEN LAG(above) OVER (ORDER BY day) IS NULL
                  OR LAG(above) OVER (ORDER BY day) <> above
                  THEN 1 ELSE 0 END AS brk
      FROM sgn
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(above) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(above) AS BIGINT) AS n2,
             CAST(SUM(brk) AS BIGINT) AS r
      FROM runs
    )
    SELECT n AS n_days_used, n1 AS n_above, n2 AS n_below, r AS n_runs,
           (CAST(r AS DOUBLE)
             - (1.0 + CAST(2 * n1 * n2 AS DOUBLE) / CAST(n AS DOUBLE)))
             / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - n) AS DOUBLE)
                    / CAST(n * n * (n - 1) AS DOUBLE)) AS z_stat
    FROM s
    """,
)
def q_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    med = daily.agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY rev)").alias("m"))
    sgn = (
        dq.scalar_join(daily, med)
        .filter(F.col("rev") != F.col("m"))
        .select("day", F.when(F.col("rev") > F.col("m"), 1).otherwise(0).alias("above"))
    )
    # calendar-bounded single-partition lag (docstring bound)
    lag = F.lag("above").over(Window.orderBy("day"))
    runs = sgn.select(
        "above",
        F.when(lag.isNull() | (lag != F.col("above")), 1).otherwise(0).alias("brk"),
    )
    s = runs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("above").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("above")).cast("bigint").alias("n2"),
        F.sum("brk").cast("bigint").alias("r"),
    )
    return s.select(
        F.col("n").alias("n_days_used"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.expr(
            "(CAST(r AS DOUBLE)"
            " - (1.0 + CAST(2 * n1 * n2 AS DOUBLE) / CAST(n AS DOUBLE)))"
            " / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - n) AS DOUBLE)"
            " / CAST(n * n * (n - 1) AS DOUBLE))"
        ).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Key-sequence gap audit over o_orderkey
# ---------------------------------------------------------------------------

_GAP_TOPK = 20


@register(
    "sequence_gap_audit",
    "Sharded-feed completeness audit: the largest event-id holes "
    "WITHIN each event type's id subsequence — when a producer "
    "shards one global id sequence across topics, a bigger-than-"
    "usual per-shard gap is the dropped-record signal every ingest "
    "pipeline monitors. Successor pairs come from the grouped "
    "two-phase rank (operators/ranking.py — no per-group single "
    "reducer) followed by an equi-join of rank r with rank r+1 on "
    "(type, rank): the 'next key' is a shuffle join, not a global "
    "window. Top-20 under the total order (missing DESC, type, "
    "gap_start) (rule 20). The oracle uses the plain LEAD form — "
    "same semantics, engine-local sort.",
    f"""
    WITH k AS (SELECT DISTINCT event_type, event_id AS k FROM events),
    nx AS (
      SELECT event_type, k,
             LEAD(k) OVER (PARTITION BY event_type ORDER BY k) AS nk
      FROM k
    )
    SELECT event_type, k + 1 AS gap_start, nk - 1 AS gap_end,
           CAST(nk - k - 1 AS BIGINT) AS n_missing
    FROM nx WHERE nk IS NOT NULL AND nk - k > 1
    ORDER BY n_missing DESC, event_type, gap_start LIMIT {_GAP_TOPK}
    """,
)
def q_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.operators.ranking import (
        two_phase_rank_in_groups,
    )

    keys = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.col("event_id").alias("k"))
        .distinct()
    )
    ranked = two_phase_rank_in_groups(
        keys,
        group_cols=["event_type"],
        order_by=["k"],
        coarse=F.expr("k DIV 4096"),
        rank_name="r",
    )
    cur = ranked.select("event_type", "k", "r")
    nxt = ranked.select(
        "event_type", F.col("k").alias("nk"), (F.col("r") - 1).alias("r")
    )
    gaps = (
        cur.join(nxt, ["event_type", "r"])
        .filter(F.col("nk") - F.col("k") > 1)
        .select(
            "event_type",
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nk") - 1).alias("gap_end"),
            (F.col("nk") - F.col("k") - 1).cast("bigint").alias("n_missing"),
        )
    )
    return gaps.orderBy(
        F.col("n_missing").desc(), "event_type", "gap_start"
    ).limit(_GAP_TOPK)


# ---------------------------------------------------------------------------
# Watermark lateness census over the event stream (two-phase running max)
# ---------------------------------------------------------------------------

_WM_JITTER_MOD = 97
_WM_JITTER_MULT = 2654435761
_WM_ID_MOD = 1000003
_WM_LATE_US = 6 * 3600 * 1000000  # 6h watermark


@register(
    "late_event_watermark_census",
    "Watermark lateness census: how late does each event type arrive "
    "relative to the stream's high-water mark, and what would a 6h "
    "watermark drop? Arrival order is a DOCUMENTED deterministic "
    "jitter of the event id (arrival = event_id + (event_id mod "
    "1000003) * 2654435761 mod 97 — pure integer arithmetic, "
    "identical on both engines; the raw feed is perfectly ordered, "
    "so the jitter stands in for network reordering the same way the "
    "multimodal stub stands in for codecs). The exclusive running "
    "max of event-time over arrival order is the two-phase running "
    "max (operators/ranking.py two_phase_running_max — per-bucket "
    "maxima + driver-folded prefix, NO single-partition window); "
    "lateness = highwater - ts in exact microseconds (rule 11). "
    "Per-type output: events, late count vs the 6h watermark, "
    "max lateness seconds, late ppm — the batch twin of the "
    "streaming withWatermark/dropped-rows accounting.",
    f"""
    WITH e AS (
      SELECT event_id, event_type, epoch_us(ts) AS us,
             event_id
               + (event_id % {_WM_ID_MOD}) * {_WM_JITTER_MULT}
                 % {_WM_JITTER_MOD} AS arrival
      FROM events
    ),
    hw AS (
      SELECT event_type, us,
             MAX(us) OVER (ORDER BY arrival, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM e
    ),
    lat AS (
      SELECT event_type,
             CASE WHEN pm IS NULL OR pm <= us THEN 0 ELSE pm - us END AS late_us
      FROM hw
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_us > {_WM_LATE_US} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late,
           CAST(MAX(late_us) // 1000000 AS BIGINT) AS max_lateness_s,
           CAST(SUM(CASE WHEN late_us > {_WM_LATE_US} THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS late_ppm
    FROM lat GROUP BY event_type
    """,
)
def q_late_event_watermark_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.operators.ranking import two_phase_running_max

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        F.expr(
            f"event_id"
            f" + (event_id % {_WM_ID_MOD}) * {_WM_JITTER_MULT}"
            f" % {_WM_JITTER_MOD}"
        ).alias("arrival"),
    )
    hw = two_phase_running_max(
        ev,
        order_by=["arrival", "event_id"],
        coarse=F.expr("arrival DIV 1000000"),
        value=F.col("us"),
        out_name="pm",
        exclusive=True,
    )
    lat = hw.select(
        "event_type",
        F.when(
            F.col("pm").isNull() | (F.col("pm") <= F.col("us")), F.lit(0)
        )
        .otherwise(F.col("pm") - F.col("us"))
        .alias("late_us"),
    )
    late_flag = F.when(F.col("late_us") > _WM_LATE_US, 1).otherwise(0)
    return lat.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(late_flag).cast("bigint").alias("n_late"),
        F.expr("CAST(MAX(late_us) DIV 1000000 AS BIGINT)").alias("max_lateness_s"),
        F.expr(
            f"CAST(SUM(CASE WHEN late_us > {_WM_LATE_US} THEN 1 ELSE 0 END)"
            " * 1000000 DIV COUNT(*) AS BIGINT)"
        ).alias("late_ppm"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation function of daily revenue (lags 1..10)
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 10


@register(
    "acf_daily_revenue",
    "Autocorrelation function of the daily revenue series at lags "
    "1..10: per lag, Pearson correlation of (x_t, x_{t+lag}) over "
    "the lag-joined day pairs — the seasonality/memory diagnostic "
    "behind every forecasting model choice. The lag join is an "
    "equi-join on integer epoch-day + lag against the 10-row "
    "broadcast lag table (fan-out 10x over the calendar-bounded "
    "daily aggregate); moment sums are exact integers (daily cents^2 "
    "passes 2^63 even at sf0.01, so they reach DOUBLE via the "
    "quotient+remainder split — plain decimal/hugeint->double casts "
    "diverge by 1 ulp above 2^63), and each lag's rho is the shared "
    "IEEE tree (rules 2, 8). Fully incremental pattern: the same "
    "moments are map-side combinable at 100x.",
    f"""
    WITH daily AS ({_DAILY_SQL}
    ),
    lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS lag),
    pr AS (
      SELECT l.lag, a.rev AS x, b.rev AS y
      FROM daily a
      JOIN lags l ON TRUE
      JOIN daily b ON b.dayno = a.dayno + l.lag
    ),
    s AS (
      SELECT lag,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             SUM(x) AS sx_i, SUM(y) AS sy_i, SUM(x * y) AS sxy_i,
             SUM(x * x) AS sxx_i, SUM(y * y) AS syy_i
      FROM pr GROUP BY lag
    ),
    d AS (
      SELECT lag, n_pairs,
             {_split_double('sx_i').format(**_SPLIT_DUCK)} AS sx,
             {_split_double('sy_i').format(**_SPLIT_DUCK)} AS sy,
             {_split_double('sxy_i').format(**_SPLIT_DUCK)} AS sxy,
             {_split_double('sxx_i').format(**_SPLIT_DUCK)} AS sxx,
             {_split_double('syy_i').format(**_SPLIT_DUCK)} AS syy
      FROM s
    )
    SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
           (CAST(n_pairs AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n_pairs AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n_pairs AS DOUBLE) * syy - sy * sy)) AS acf
    FROM d
    """,
)
def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    lags = daily.sparkSession.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").alias("lag")
    )
    a = daily.select(F.col("dayno").alias("da"), F.col("rev").alias("x"))
    b = daily.select(F.col("dayno").alias("db"), F.col("rev").alias("y"))
    pr = (
        a.join(F.broadcast(lags), F.lit(True))
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
        .select("lag", "x", "y")
    )
    s = pr.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx_i"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy_i"),
        # cast BEFORE multiplying: daily-cents x*y passes 2^63 by sf1,
        # so a BIGINT product overflows ahead of the DECIMAL cast
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy_i"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx_i"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy_i"),
    ).select(
        "lag",
        "n_pairs",
        *[
            F.expr(_split_double(f"{c}_i").format(**_SPLIT_SPARK)).alias(c)
            for c in ("sx", "sy", "sxy", "sxx", "syy")
        ],
    )
    return s.select(
        F.col("lag").cast("bigint").alias("lag"),
        "n_pairs",
        F.expr(
            "(CAST(n_pairs AS DOUBLE) * sxy - sx * sy)"
            " / (sqrt(CAST(n_pairs AS DOUBLE) * sxx - sx * sx)"
            " * sqrt(CAST(n_pairs AS DOUBLE) * syy - sy * sy))"
        ).alias("acf"),
    )
