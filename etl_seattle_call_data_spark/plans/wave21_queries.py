"""Twenty-first-wave coverage: one-way ANOVA, weekday-uniformity
chi-square, pocket-price waterfall, keyset pagination, lag-feature
matrices, and process-capability indices.

docs/CROSS_ENGINE.md rules throughout: exact integer/DECIMAL moment
sums with truncating DIV where a ratio must stay integral (rule 4 —
the truncation is defined into the statistic so both engines agree),
quotient+remainder splits past 2^63, one shared IEEE tree per float
(rules 1-2, 8), sentinel -1 for structural NULLs in integer feature
columns (rule 16's integer twin), rule-20 total orders.
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


# ---------------------------------------------------------------------------
# One-way ANOVA F statistic across order priorities
# ---------------------------------------------------------------------------


@register(
    "anova_oneway_fstat",
    "One-way ANOVA across the five order priorities on order value "
    "(whole dollars): F = (SSB/(k-1)) / (SSW/(N-k)) with "
    "SSB = sum_g S_g^2/n_g - S^2/N and SSW = sum x^2 - sum_g "
    "S_g^2/n_g, every term an EXACT integer — the per-group "
    "S_g^2 DIV n_g truncation (at most k dollars^2, defined into "
    "the statistic) keeps the cross-group sum order-free where "
    "floating addition would diverge per engine; dollars (not "
    "cents) keep S_g^2 DIV n_g inside BIGINT through sf100. F and "
    "eta^2 are one shared IEEE tree over the split-converted exact "
    "integers (rules 1-2). The parametric completion of the "
    "rank-based family (Mann-Whitney, Kruskal-style QQ). One "
    "grouped aggregate + a 5-row rollup.",
    f"""
    WITH o AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice) AS BIGINT) AS x
      FROM orders
    ),
    g AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_g, SUM(x) AS s_g,
             SUM(x * x) AS ss_g
      FROM o GROUP BY grp
    ),
    t AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(s_g) AS s,
             SUM(ss_g) AS ss,
             SUM(s_g * s_g // n_g) AS a
      FROM g
    ),
    e AS (
      SELECT n, k,
             {_split_double('(a - (s * s // n))').format(**_SPLIT_DUCK)} AS ssb,
             {_split_double('(ss - a)').format(**_SPLIT_DUCK)} AS ssw
      FROM t
    )
    SELECT n AS n_orders, k AS n_groups,
           ssb AS ss_between, ssw AS ss_within,
           (ssb / NULLIF(CAST(k - 1 AS DOUBLE), 0))
             / NULLIF(ssw / NULLIF(CAST(n - k AS DOUBLE), 0), 0)
             AS f_stat,
           ssb / NULLIF(ssb + ssw, 0) AS eta_squared
    FROM e
    """,
)
def q_anova_oneway_fstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice")).cast("bigint").alias("x"),
    )
    g = o.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("x").alias("s_g"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("ss_g"),
    )
    t = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(F.expr("CAST(s_g AS DECIMAL(38,0)) * s_g DIV n_g")).alias("a"),
    )
    e = t.select(
        "n",
        "k",
        F.expr(
            _split_double("(a - (CAST(s AS DECIMAL(38,0)) * s DIV n))").format(
                **_SPLIT_SPARK
            )
        ).alias("ssb"),
        F.expr(_split_double("(ss - a)").format(**_SPLIT_SPARK)).alias("ssw"),
    )
    return e.select(
        F.col("n").alias("n_orders"),
        F.col("k").alias("n_groups"),
        F.col("ssb").alias("ss_between"),
        F.col("ssw").alias("ss_within"),
        # NULLIF guards (CROSS_ENGINE rule 40): a 1-group / 1-row input
        # zeroes k-1, n-k, and ssb+ssw — Spark ANSI throws on ANY /0
        # (double included) where DuckDB yields NULL, so the guard makes
        # both engines emit NULL; populated SFs never hit it
        F.expr(
            "(ssb / NULLIF(CAST(k - 1 AS DOUBLE), 0))"
            " / NULLIF(ssw / NULLIF(CAST(n - k AS DOUBLE), 0), 0)"
        ).alias("f_stat"),
        F.expr("ssb / NULLIF(ssb + ssw, 0)").alias("eta_squared"),
    )


# ---------------------------------------------------------------------------
# Weekday-uniformity chi-square per year
# ---------------------------------------------------------------------------


@register(
    "weekday_uniformity_chi2",
    "Order-volume weekday-uniformity chi-square per calendar year: "
    "chi2 = sum_d (O_d - n/7)^2 / (n/7) computed EXACTLY as "
    "sum(7*O_d - n)^2 / (7n) — the numerator is a pure BIGINT sum "
    "(no per-cell division, rule 4), the statistic is ONE IEEE "
    "division, and the 95% verdict compares against the literal "
    "chi2(6) critical value 12.592. The operational-cadence twin of "
    "the distribution-drift chi2 (different null: uniform across "
    "weekdays vs a reference corpus). Spark dayofweek == DuckDB "
    "isodow after the +/-1 alignment both engines document; we use "
    "(epoch-day + 4) % 7 instead — pure integer arithmetic, "
    "identical by construction (1970-01-01 was a Thursday). One "
    "scan, 7 x years cells.",
    """
    WITH o AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
             (epoch_us(o_orderdate) // 86400000000 + 4) % 7 AS dow
      FROM orders
    ),
    cells AS (
      SELECT yr, dow, CAST(COUNT(*) AS BIGINT) AS o_d
      FROM o GROUP BY yr, dow
    ),
    y0 AS (
      SELECT yr, o_d, SUM(o_d) OVER (PARTITION BY yr) AS n
      FROM cells
    ),
    y AS (
      -- weekdays with zero orders contribute (7*0 - n)^2 = n^2 each
      SELECT yr, CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM((7 * o_d - n) * (7 * o_d - n))
                  + (7 - COUNT(*)) * MAX(n) * MAX(n) AS BIGINT) AS num
      FROM y0 GROUP BY yr
    )
    SELECT yr, n AS n_orders,
           CAST(num AS DOUBLE) / CAST(7 * n AS DOUBLE) AS chi2_stat,
           CAST(num AS DOUBLE) / CAST(7 * n AS DOUBLE) > 12.592
             AS nonuniform_95
    FROM y
    """,
)
def q_weekday_uniformity_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.expr("(unix_micros(o_orderdate) DIV 86400000000 + 4) % 7").alias(
            "dow"
        ),
    )
    cells = o.groupBy("yr", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("o_d")
    )
    wyr = Window.partitionBy("yr")
    y0 = cells.select("yr", "o_d", F.sum("o_d").over(wyr).alias("n"))
    dev = 7 * F.col("o_d") - F.col("n")
    # weekdays with zero orders contribute (7*0 - n)^2 = n^2 each
    y = y0.groupBy("yr").agg(
        F.max("n").cast("bigint").alias("n"),
        (
            F.sum(dev * dev)
            + (7 - F.count(F.lit(1))) * F.max("n") * F.max("n")
        )
        .cast("bigint")
        .alias("num"),
    )
    chi2 = F.expr("CAST(num AS DOUBLE) / CAST(7 * n AS DOUBLE)")
    return y.select(
        "yr",
        F.col("n").alias("n_orders"),
        chi2.alias("chi2_stat"),
        (chi2 > 12.592).alias("nonuniform_95"),
    )


# ---------------------------------------------------------------------------
# Pocket-price waterfall per brand
# ---------------------------------------------------------------------------


@register(
    "pocket_price_waterfall",
    "Pocket-price waterfall per brand — the commercial-pricing "
    "decomposition gross -> discount leakage -> tax -> pocket "
    "revenue: per line, discount and tax amounts are exact "
    "fixed-point products (cents x basis points, truncating DIV "
    "defined into the ledger so both engines carry identical "
    "pennies), summed in DECIMAL(38,0) (micro-cent products pass "
    "2^63 well before sf1) and split-converted once. Pocket share "
    "in ppm via integral division of the exact decimal sums. One "
    "fact-dim join (part broadcast-eligible), one 25-row brand "
    "rollup.",
    f"""
    WITH l AS (
      SELECT p.p_brand AS brand,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(round(l.l_discount * 10000) AS BIGINT) AS dbp,
             CAST(round(l.l_tax * 10000) AS BIGINT) AS tbp
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    amounts AS (
      SELECT brand, cents,
             cents * dbp // 10000 AS disc_cents,
             (cents - cents * dbp // 10000) * tbp // 10000 AS tax_cents
      FROM l
    ),
    s AS (
      SELECT brand,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             SUM(cents) AS gross_i,
             SUM(disc_cents) AS disc_i,
             SUM(tax_cents) AS tax_i,
             SUM(cents - disc_cents + tax_cents) AS pocket_i
      FROM amounts GROUP BY brand
    )
    SELECT brand, n_lines,
           {_split_double('gross_i').format(**_SPLIT_DUCK)} / 100.0 AS gross,
           {_split_double('disc_i').format(**_SPLIT_DUCK)} / 100.0
             AS discount_leakage,
           {_split_double('tax_i').format(**_SPLIT_DUCK)} / 100.0 AS tax_added,
           {_split_double('pocket_i').format(**_SPLIT_DUCK)} / 100.0
             AS pocket_revenue,
           CAST(pocket_i * 1000000 // gross_i AS BIGINT) AS pocket_ppm
    FROM s
    """,
)
def q_pocket_price_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    l = li.join(p, li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.round(F.col("l_discount") * 10000).cast("bigint").alias("dbp"),
        F.round(F.col("l_tax") * 10000).cast("bigint").alias("tbp"),
    )
    amounts = l.select(
        "brand",
        "cents",
        F.expr("cents * dbp DIV 10000").alias("disc_cents"),
        F.expr("(cents - cents * dbp DIV 10000) * tbp DIV 10000").alias(
            "tax_cents"
        ),
    )
    s = amounts.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("gross_i"),
        F.sum(F.col("disc_cents").cast("decimal(38,0)")).alias("disc_i"),
        F.sum(F.col("tax_cents").cast("decimal(38,0)")).alias("tax_i"),
        F.sum(
            (F.col("cents") - F.col("disc_cents") + F.col("tax_cents")).cast(
                "decimal(38,0)"
            )
        ).alias("pocket_i"),
    )

    def split(name: str):
        return F.expr(_split_double(name).format(**_SPLIT_SPARK))

    return s.select(
        "brand",
        "n_lines",
        (split("gross_i") / 100.0).alias("gross"),
        (split("disc_i") / 100.0).alias("discount_leakage"),
        (split("tax_i") / 100.0).alias("tax_added"),
        (split("pocket_i") / 100.0).alias("pocket_revenue"),
        F.expr("CAST(pocket_i * 1000000 DIV gross_i AS BIGINT)").alias(
            "pocket_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Keyset pagination (page 3 of the order ledger)
# ---------------------------------------------------------------------------

_KP_PAGE_SIZE = 10


@register(
    "keyset_pagination_page3",
    "Keyset (seek) pagination — page 3 of orders sorted by "
    "(totalprice DESC, orderkey): the Spark plan finds the page-2 "
    "boundary row WITHOUT a global skip (TakeOrdered 20 -> "
    "row_number over that bounded frame -> 1-row boundary broadcast) "
    "and then fetches WHERE (price < bp) OR (price = bp AND key > "
    "bk) ORDER BY ... LIMIT 10 — the predicate pushes into the "
    "scan, so page N costs the same as page 1 where OFFSET N*k "
    "re-sorts and discards N*k rows (the oracle uses the OFFSET "
    "form deliberately: same rows, engine-local sort, contrasting "
    "plans). Unique orderkey tie-break makes every page a total "
    "order (rule 20).",
    f"""
    SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
    ORDER BY round(o_totalprice * 100) DESC, o_orderkey
    LIMIT {_KP_PAGE_SIZE} OFFSET {2 * _KP_PAGE_SIZE}
    """,
)
def q_keyset_pagination_page3(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    order = [F.col("cents").desc(), F.col("o_orderkey")]
    top2pages = o.orderBy(*order).limit(2 * _KP_PAGE_SIZE)
    boundary = (
        top2pages.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        )
        .filter(F.col("rn") == 2 * _KP_PAGE_SIZE)
        .select(F.col("cents").alias("bp"), F.col("o_orderkey").alias("bk"))
    )
    page = (
        dq.scalar_join(o, boundary)
        .filter(
            (F.col("cents") < F.col("bp"))
            | ((F.col("cents") == F.col("bp")) & (F.col("o_orderkey") > F.col("bk")))
        )
        .orderBy(*order)
        .limit(_KP_PAGE_SIZE)
    )
    return page.select("o_orderkey", "cents")


# ---------------------------------------------------------------------------
# Lag-feature matrix for supervised training on the weekly user series
# ---------------------------------------------------------------------------


@register(
    "timeseries_lag_feature_matrix",
    "Supervised feature matrix from the weekly user value series — "
    "the canonical build-training-rows op: per (user, epoch-week), "
    "current value plus lag-1/lag-2 features, trailing-3-week sum "
    "and observation count, and the NEXT week's value as the label "
    "— every column exact BIGINT cents with -1 sentinels for "
    "structural absence at series edges (integer twin of rule 16: "
    "nullable ints reach pandas as floats and diverge). All windows "
    "partition by user (per-user history bounded); one shuffle on "
    "user_id. Rows = observed (user, week) pairs, each emitted "
    "exactly once — leakage-free by construction (features strictly "
    "precede the label).",
    """
    WITH uw AS (
      SELECT user_id, (epoch_us(ts) // 86400000000) // 7 AS wk,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY user_id, (epoch_us(ts) // 86400000000) // 7
    )
    SELECT user_id, wk, v,
           CAST(COALESCE(LAG(v) OVER w, -1) AS BIGINT) AS lag1,
           CAST(COALESCE(LAG(v, 2) OVER w, -1) AS BIGINT) AS lag2,
           CAST(COALESCE(SUM(v) OVER (PARTITION BY user_id ORDER BY wk
             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), -1) AS BIGINT)
             AS trail3_sum,
           CAST(COUNT(v) OVER (PARTITION BY user_id ORDER BY wk
             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT) AS trail3_n,
           CAST(COALESCE(LEAD(v) OVER w, -1) AS BIGINT) AS label_next_week
    FROM uw
    WINDOW w AS (PARTITION BY user_id ORDER BY wk)
    """,
)
def q_timeseries_lag_feature_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uw = ev.groupBy(
        "user_id",
        F.expr("(unix_micros(ts) DIV 86400000000) DIV 7").alias("wk"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("v"))
    w = Window.partitionBy("user_id").orderBy("wk")
    wt = w.rowsBetween(-3, -1)
    return uw.select(
        "user_id",
        "wk",
        "v",
        F.coalesce(F.lag("v").over(w), F.lit(-1)).alias("lag1"),
        F.coalesce(F.lag("v", 2).over(w), F.lit(-1)).alias("lag2"),
        F.coalesce(F.sum("v").over(wt), F.lit(-1)).alias("trail3_sum"),
        F.count("v").over(wt).cast("bigint").alias("trail3_n"),
        F.coalesce(F.lead("v").over(w), F.lit(-1)).alias("label_next_week"),
    )


# ---------------------------------------------------------------------------
# Process capability (Cp / Cpk) of fulfillment lead time
# ---------------------------------------------------------------------------

_PC_LSL = 0
_PC_USL = 120
_PC_MAX_PLAUSIBLE = 365


@register(
    "process_capability_leadtime",
    "Process-capability indices for fulfillment lead time per line "
    "status: Cp = (USL-LSL)/6s and Cpk = min(USL-mean, mean-LSL)/3s "
    "against the [0, 120]-day spec window — the six-sigma SLA lens "
    "that reports not just whether the process meets spec but how "
    "much margin it has. Lead days are exact integer epoch-day "
    "differences (rule 11), restricted to the documented plausible "
    "window [0, 365] (this corpus ships synthetic dates in both "
    "directions); mean/sd come from exact split-converted integer "
    "moments with the sample-variance shared tree (rules 1-2, 8). "
    "One join-filter-aggregate pass; moments are map-side "
    "combinable.",
    f"""
    WITH d AS (
      SELECT l.l_linestatus AS status,
             (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
               // 86400000000 AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    f AS (
      SELECT status, days FROM d
      WHERE days >= 0 AND days <= {_PC_MAX_PLAUSIBLE}
    ),
    s AS (
      SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(days) AS sx_i, SUM(days * days) AS sxx_i
      FROM f GROUP BY status
    ),
    e AS (
      SELECT status, n,
             CAST(n AS DOUBLE) AS nn,
             {_split_double('sx_i').format(**_SPLIT_DUCK)} AS sx,
             {_split_double('sxx_i').format(**_SPLIT_DUCK)} AS sxx
      FROM s
    )
    SELECT status, n AS n_lines,
           sx / nn AS mean_days,
           sqrt((sxx - sx * sx / nn) / NULLIF(nn - 1.0, 0)) AS sd_days,
           CAST({_PC_USL - _PC_LSL} AS DOUBLE)
             / NULLIF(6.0 * sqrt((sxx - sx * sx / nn)
                                 / NULLIF(nn - 1.0, 0)), 0) AS cp,
           LEAST({_PC_USL}.0 - sx / nn, sx / nn - {_PC_LSL}.0)
             / NULLIF(3.0 * sqrt((sxx - sx * sx / nn)
                                 / NULLIF(nn - 1.0, 0)), 0) AS cpk
    FROM e
    """,
)
def q_process_capability_leadtime(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_linestatus").alias("status"),
        F.expr(
            "(unix_micros(l_shipdate) - unix_micros(o_orderdate))"
            " DIV 86400000000"
        ).alias("days"),
    )
    f = d.filter((F.col("days") >= 0) & (F.col("days") <= _PC_MAX_PLAUSIBLE))
    s = f.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("days").alias("sx_i"),
        F.sum((F.col("days") * F.col("days")).cast("decimal(38,0)")).alias(
            "sxx_i"
        ),
    )
    e = s.select(
        "status",
        "n",
        F.col("n").cast("double").alias("nn"),
        F.expr(_split_double("sx_i").format(**_SPLIT_SPARK)).alias("sx"),
        F.expr(_split_double("sxx_i").format(**_SPLIT_SPARK)).alias("sxx"),
    )
    # NULLIF guards (rule 40): a 1-line or constant-leadtime status
    # zeroes nn - 1 / sigma
    sd = "sqrt((sxx - sx * sx / nn) / NULLIF(nn - 1.0, 0))"
    return e.select(
        "status",
        F.col("n").alias("n_lines"),
        F.expr("sx / nn").alias("mean_days"),
        F.expr(sd).alias("sd_days"),
        F.expr(
            f"CAST({_PC_USL - _PC_LSL} AS DOUBLE) / NULLIF(6.0 * {sd}, 0)"
        ).alias("cp"),
        F.expr(
            f"LEAST({_PC_USL}.0 - sx / nn, sx / nn - {_PC_LSL}.0)"
            f" / NULLIF(3.0 * {sd}, 0)"
        ).alias("cpk"),
    )
