"""Tenth-wave coverage: experimentation & causal analytics, search
ranking metrics, incremental join-view maintenance, leakage-safe
dataset splits, negative sampling, and the remaining web/behavioral
analytics gaps (Pareto concentration, lagged cross-correlation,
position-based attribution, candidate-key profiling, session
entry/exit rates).

Cross-engine rules from docs/CROSS_ENGINE.md apply throughout: exact
integer/DECIMAL accumulation with stated magnitude bounds, the
quotient+remainder split when an exact integer > 2^53 must become a
DOUBLE (rule of wave-6 feature scaling), truncating `DIV`/`//`
equivalence incl. negatives (rule 25), portable md5 bucket hashing,
and identical IEEE expression trees for every emitted double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table


def _hash_mod(col: Column, buckets: int) -> Column:
    """Portable md5-prefix hash bucket (operators/sampling.hash_bucket
    semantics, inlined so the modulus can vary per call)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return h % buckets


def _split_double(col_name: str) -> str:
    """SQL fragment turning an exact integral column (DECIMAL/HUGEINT,
    possibly > 2^53) into the correctly-rounded DOUBLE via the
    quotient+remainder split: both parts are < 2^53 so their casts are
    exact, the 2^26 rescale is a power of two (exact), and the single
    final addition rounds once — identically on both engines. Uses the
    engine-portable truncating division (Spark `DIV` ≡ DuckDB `//`,
    rule 25), consistent with `%` for negative inputs."""
    return (
        f"(CAST({col_name} {{div}} 67108864 AS DOUBLE) * 67108864.0"
        f" + CAST({col_name} % 67108864 AS DOUBLE))"
    )


_SPLIT_SPARK = {"div": "DIV"}
_SPLIT_DUCK = {"div": "//"}


# ---------------------------------------------------------------------------
# CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

_CUPED_DOC = (
    "CUPED variance-reduced A/B readout (Deng et al. 2013): users are "
    "deterministically hash-assigned to two arms, the experiment metric "
    "Y is each user's post-period event value (integer cents) and the "
    "covariate X is the same user's PRE-period value; "
    "theta = cov(X,Y)/var(X) over all users, and each arm reports its "
    "naive mean alongside the CUPED-adjusted mean "
    "mean(Y_a) - theta*(mean(X_a) - mean(X)). Everything up to the "
    "final doubles is exact: per-user sums are BIGINT cents, the "
    "moment products accumulate in DECIMAL(38,0)/HUGEINT (x,y < 2^23 "
    "cents per user so x*y < 2^46 per row; the n*Sxy - Sx*Sy "
    "combination is bounded by n^2 * max(xy) — exact integers), and "
    "integers > 2^53 reach DOUBLE via the quotient+remainder split. "
    "ONE fact pass: user sums -> 2-row arm partials; the global "
    "moments are window-TOTALS of the arm partials (the mergeability "
    "of moment sketches doing real work — no second scan). The "
    "variance-reduction column is 1 - corr(X,Y)^2, the theoretical "
    "CUPED gain, as one fixed IEEE tree. Scale: the only shuffles are "
    "the per-user groupBy and a 2-row aggregate; at 100 TB the user "
    "aggregate is the same single map-side-combined pass."
)

_CUPED_ORACLE = f"""
    WITH u AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
               AS arm,
             COALESCE(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                     THEN CAST(round(value * 100) AS BIGINT) END), 0) AS x,
             COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                     THEN CAST(round(value * 100) AS BIGINT) END), 0) AS y
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT arm,
             COUNT(*) AS n_a,
             SUM(x) AS sx_a, SUM(y) AS sy_a,
             SUM(x * y) AS sxy_a, SUM(x * x) AS sxx_a, SUM(y * y) AS syy_a
      FROM u GROUP BY arm
    ),
    g AS (
      SELECT arm, n_a, sx_a, sy_a,
             SUM(n_a) OVER () AS n, SUM(sx_a) OVER () AS sx,
             SUM(sy_a) OVER () AS sy, SUM(sxy_a) OVER () AS sxy,
             SUM(sxx_a) OVER () AS sxx, SUM(syy_a) OVER () AS syy
      FROM a
    ),
    m AS (
      SELECT arm, n_a, sx_a, sy_a, n, sx, sy,
             n * sxy - sx * sy AS covnum,
             n * sxx - sx * sx AS varxnum,
             n * syy - sy * sy AS varynum
      FROM g
    ),
    d AS (
      SELECT arm, n_a, sx_a, sy_a, n, sx, sy,
             {_split_double('covnum').format(**_SPLIT_DUCK)} AS covd,
             {_split_double('varxnum').format(**_SPLIT_DUCK)} AS vxd,
             {_split_double('varynum').format(**_SPLIT_DUCK)} AS vyd
      FROM m
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(n_a AS BIGINT) AS n_users,
           CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS mean_y,
           CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS mean_x,
           (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - (CASE WHEN vxd = 0.0 THEN 0.0 ELSE covd / vxd END)
              * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 100.0
             AS adj_mean_y,
           CASE WHEN vxd = 0.0 THEN 0.0 ELSE covd / vxd END AS theta,
           CASE WHEN vxd = 0.0 OR vyd = 0.0 THEN 0.0
                ELSE covd * covd / (vxd * vyd) END AS var_reduction
    FROM d
"""


@register("cuped_adjusted_estimate", _CUPED_DOC, _CUPED_ORACLE)
def q_cuped_adjusted_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("bigint")
    u = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("ts") < cut, cents)), F.lit(0)).alias("x"),
        F.coalesce(F.sum(F.when(F.col("ts") >= cut, cents)), F.lit(0)).alias("y"),
    ).select(
        _hash_mod(F.col("user_id"), 2).alias("arm"), "x", "y"
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_a"),
        F.sum("x").alias("sx_a"),
        F.sum("y").alias("sy_a"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy_a"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx_a"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy_a"),
    )
    w = Window.partitionBy()
    g = a.select(
        "arm", "n_a", "sx_a", "sy_a",
        F.sum("n_a").over(w).alias("n"),
        F.sum("sx_a").over(w).alias("sx"),
        F.sum("sy_a").over(w).alias("sy"),
        F.sum("sxy_a").over(w).alias("sxy"),
        F.sum("sxx_a").over(w).alias("sxx"),
        F.sum("syy_a").over(w).alias("syy"),
    )
    m = g.select(
        "arm", "n_a", "sx_a", "sy_a", "n", "sx", "sy",
        (dec(F.col("n")) * F.col("sxy") - dec(F.col("sx")) * dec(F.col("sy"))).alias("covnum"),
        (dec(F.col("n")) * F.col("sxx") - dec(F.col("sx")) * dec(F.col("sx"))).alias("varxnum"),
        (dec(F.col("n")) * F.col("syy") - dec(F.col("sy")) * dec(F.col("sy"))).alias("varynum"),
    )
    d = m.select(
        "arm", "n_a", "sx_a", "sy_a", "n", "sx", "sy",
        F.expr(_split_double("covnum").format(**_SPLIT_SPARK)).alias("covd"),
        F.expr(_split_double("varxnum").format(**_SPLIT_SPARK)).alias("vxd"),
        F.expr(_split_double("varynum").format(**_SPLIT_SPARK)).alias("vyd"),
    )
    theta = F.when(F.col("vxd") == 0.0, F.lit(0.0)).otherwise(F.col("covd") / F.col("vxd"))
    return d.select(
        F.col("arm").cast("bigint").alias("arm"),
        F.col("n_a").cast("bigint").alias("n_users"),
        (F.col("sy_a").cast("double") / F.col("n_a").cast("double") / 100.0).alias("mean_y"),
        (F.col("sx_a").cast("double") / F.col("n_a").cast("double") / 100.0).alias("mean_x"),
        (
            (
                F.col("sy_a").cast("double") / F.col("n_a").cast("double")
                - theta
                * (
                    F.col("sx_a").cast("double") / F.col("n_a").cast("double")
                    - F.col("sx").cast("double") / F.col("n").cast("double")
                )
            )
            / 100.0
        ).alias("adj_mean_y"),
        theta.alias("theta"),
        F.when((F.col("vxd") == 0.0) | (F.col("vyd") == 0.0), F.lit(0.0))
        .otherwise(F.col("covd") * F.col("covd") / (F.col("vxd") * F.col("vyd")))
        .alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch (SRM) check
# ---------------------------------------------------------------------------


@register(
    "experiment_srm_check",
    "Sample-ratio-mismatch guardrail for the hash-assigned experiment: "
    "a 2-cell chi-square of the observed arm counts against the "
    "designed 50/50 split — chi2 = (nA-nB)^2 / (nA+nB), carried in "
    "micro fixed point with the squared difference accumulated in "
    "DECIMAL(38,0)/HUGEINT so the *1e6 rescale cannot overflow BIGINT "
    "at any user count. The flag trips above the 3.841 critical value "
    "(alpha=0.05, df=1). The canonical pre-analysis gate every "
    "experimentation platform runs before reading means: a broken "
    "randomizer invalidates CUPED and naive readouts alike. One "
    "distinct-user aggregate, 2-row state.",
    """
    WITH u AS (
      SELECT DISTINCT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
               AS arm
      FROM events
    ),
    c AS (
      SELECT
        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
        SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb
      FROM u
    )
    SELECT CAST(na AS BIGINT) AS n_arm_a,
           CAST(nb AS BIGINT) AS n_arm_b,
           CAST((1000000::HUGEINT * (na - nb) * (na - nb)) // (na + nb)
                AS BIGINT) AS chi2_micro,
           (1000000::HUGEINT * (na - nb) * (na - nb)) // (na + nb) > 3841000
             AS srm_detected
    FROM c
    """,
)
def q_experiment_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct().select(_hash_mod(F.col("user_id"), 2).alias("arm"))
    c = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nb"),
    )
    chi2 = F.expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * (na - nb) * (na - nb))"
        " DIV (na + nb) AS BIGINT)"
    )
    return c.select(
        F.col("na").cast("bigint").alias("n_arm_a"),
        F.col("nb").cast("bigint").alias("n_arm_b"),
        chi2.alias("chi2_micro"),
        (chi2 > 3841000).alias("srm_detected"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences
# ---------------------------------------------------------------------------


@register(
    "did_revenue_impact",
    "Difference-in-differences estimator: treatment group = customers "
    "in region ASIA, pre/post split at o_orderdate 1998-01-01; the "
    "estimand is the change in mean order value for treated customers "
    "minus the same change for controls — the canonical two-period "
    "two-group causal panel readout. The four cell means come from ONE "
    "fact pass of conditional aggregates (cents in BIGINT, exact), and "
    "the DiD is a fixed IEEE tree over the four identically-computed "
    "doubles. Joins: orders->customer shuffles on custkey (AQE-sized); "
    "nation/region are broadcast fixed-size dims. Scale: a 4-cell "
    "aggregate regardless of fact size.",
    """
    WITH o AS (
      SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
             (r.r_name = 'ASIA') AS treat,
             (o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00') AS post
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    cells AS (
      SELECT
        SUM(CASE WHEN treat AND NOT post THEN cents ELSE 0 END) AS s_tp,
        SUM(CASE WHEN treat AND NOT post THEN 1 ELSE 0 END) AS n_tp,
        SUM(CASE WHEN treat AND post THEN cents ELSE 0 END) AS s_ta,
        SUM(CASE WHEN treat AND post THEN 1 ELSE 0 END) AS n_ta,
        SUM(CASE WHEN NOT treat AND NOT post THEN cents ELSE 0 END) AS s_cp,
        SUM(CASE WHEN NOT treat AND NOT post THEN 1 ELSE 0 END) AS n_cp,
        SUM(CASE WHEN NOT treat AND post THEN cents ELSE 0 END) AS s_ca,
        SUM(CASE WHEN NOT treat AND post THEN 1 ELSE 0 END) AS n_ca
      FROM o
    )
    SELECT CAST(n_tp AS BIGINT) AS n_treat_pre,
           CAST(n_ta AS BIGINT) AS n_treat_post,
           CAST(n_cp AS BIGINT) AS n_ctrl_pre,
           CAST(n_ca AS BIGINT) AS n_ctrl_post,
           CAST(s_tp AS DOUBLE) / CAST(n_tp AS DOUBLE) / 100.0 AS mean_treat_pre,
           CAST(s_ta AS DOUBLE) / CAST(n_ta AS DOUBLE) / 100.0 AS mean_treat_post,
           CAST(s_cp AS DOUBLE) / CAST(n_cp AS DOUBLE) / 100.0 AS mean_ctrl_pre,
           CAST(s_ca AS DOUBLE) / CAST(n_ca AS DOUBLE) / 100.0 AS mean_ctrl_post,
           (CAST(s_ta AS DOUBLE) / CAST(n_ta AS DOUBLE)
            - CAST(s_tp AS DOUBLE) / CAST(n_tp AS DOUBLE))
           - (CAST(s_ca AS DOUBLE) / CAST(n_ca AS DOUBLE)
              - CAST(s_cp AS DOUBLE) / CAST(n_cp AS DOUBLE)) AS did_cents
    FROM cells
    """,
)
def q_did_revenue_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            (F.col("r_name") == "ASIA").alias("treat"),
            (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")).alias(
                "post"
            ),
        )
    )

    def cell(pred: Column, val: Column, name: str) -> Column:
        return F.sum(F.when(pred, val).otherwise(F.lit(0))).alias(name)

    t, p = F.col("treat"), F.col("post")
    cells = base.agg(
        cell(t & ~p, F.col("cents"), "s_tp"),
        cell(t & ~p, F.lit(1), "n_tp"),
        cell(t & p, F.col("cents"), "s_ta"),
        cell(t & p, F.lit(1), "n_ta"),
        cell(~t & ~p, F.col("cents"), "s_cp"),
        cell(~t & ~p, F.lit(1), "n_cp"),
        cell(~t & p, F.col("cents"), "s_ca"),
        cell(~t & p, F.lit(1), "n_ca"),
    )
    mean = lambda s, n_: F.col(s).cast("double") / F.col(n_).cast("double")  # noqa: E731
    return cells.select(
        F.col("n_tp").cast("bigint").alias("n_treat_pre"),
        F.col("n_ta").cast("bigint").alias("n_treat_post"),
        F.col("n_cp").cast("bigint").alias("n_ctrl_pre"),
        F.col("n_ca").cast("bigint").alias("n_ctrl_post"),
        (mean("s_tp", "n_tp") / 100.0).alias("mean_treat_pre"),
        (mean("s_ta", "n_ta") / 100.0).alias("mean_treat_post"),
        (mean("s_cp", "n_cp") / 100.0).alias("mean_ctrl_pre"),
        (mean("s_ca", "n_ca") / 100.0).alias("mean_ctrl_post"),
        (
            (mean("s_ta", "n_ta") - mean("s_tp", "n_tp"))
            - (mean("s_ca", "n_ca") - mean("s_cp", "n_cp"))
        ).alias("did_cents"),
    )
