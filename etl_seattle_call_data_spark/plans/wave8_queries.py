"""Eighth-wave coverage: classic marketing/analytics composites (RFM
quintile segmentation, cohort LTV curves, time-decay attribution),
second-order Markov behavior, Cramér–von Mises distribution drift, the
t-closeness privacy audit (completing the k-anonymity / l-diversity
triad), nearest-centroid classification accuracy over quantized
embeddings, and systematic (every-k-th) sampling on the exact global
rank.

Cross-engine rules from docs/CROSS_ENGINE.md apply throughout; the
heavy machinery is reused, not re-invented: exact global ranks come
from operators/ranking.two_phase_rank (+ NTILE-identical
equidepth_bucket), ordered-EMD and CvM statistics stay in integer
fixed point (DIV truncation is engine-identical even for negatives,
rule 25), and every windowed table is BOUNDED (priority axis, value
grid, cohort x age, bin histograms) — never row-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.operators.ranking import (
    equidepth_bucket,
    two_phase_multi_rank,
    two_phase_rank,
)
from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table


# ---------------------------------------------------------------------------
# Cramér–von Mises two-sample drift statistic
# ---------------------------------------------------------------------------


@register(
    "source_divergence_cvm",
    "Two-sample Cramér–von Mises statistic between click and view "
    "event values — the integral companion to the KS max-gap test "
    "(source_divergence_ks): T = (n1*n2/N^2) * sum over the pooled "
    "sample of (F1-F2)^2. Values land on a deci-grid "
    "(floor(value*10), bounded by the fixed value RANGE, not rows); "
    "ECDF gaps are exact integers d = cum1*n2 - cum2*n1, scaled to "
    "millis by DIV (truncation is engine-identical even for negative "
    "d, rule 25), squared and count-weighted into an exact BIGINT "
    "t_milli2. One grouped agg + one bounded-grid window; the final "
    "double is a fixed expression over exact ints (n1*n2 < 2^53 "
    "through sf1; promote to the quotient+remainder split beyond).",
    """
    WITH s AS (
      SELECT CAST(floor(value * 10) AS BIGINT) AS g,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
      FROM events WHERE event_type IN ('click', 'view')
    ),
    grid AS (
      SELECT g, CAST(SUM(is1) AS BIGINT) AS c1,
             CAST(COUNT(*) - SUM(is1) AS BIGINT) AS c2
      FROM s GROUP BY g
    ),
    cum AS (
      SELECT g, c1, c2,
             CAST(SUM(c1) OVER w AS BIGINT) AS cum1,
             CAST(SUM(c2) OVER w AS BIGINT) AS cum2,
             CAST(SUM(c1) OVER () AS BIGINT) AS n1,
             CAST(SUM(c2) OVER () AS BIGINT) AS n2
      FROM grid
      WINDOW w AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    terms AS (
      SELECT n1, n2,
             (c1 + c2)
               * ((cum1 * n2 - cum2 * n1) * 1000 // (n1 * n2))
               * ((cum1 * n2 - cum2 * n1) * 1000 // (n1 * n2)) AS t
      FROM cum
    )
    SELECT n1, n2, CAST(SUM(t) AS BIGINT) AS t_milli2,
           CAST(n1 * n2 AS DOUBLE) * CAST(SUM(t) AS DOUBLE)
             / CAST((n1 + n2) * (n1 + n2) AS DOUBLE) / 1000000.0
             AS cvm_stat
    FROM terms GROUP BY n1, n2
    """,
)
def q_source_divergence_cvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.expr("CAST(floor(value * 10) AS BIGINT)").alias("g"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is1"),
    )
    grid = s.groupBy("g").agg(
        F.sum("is1").cast("bigint").alias("c1"),
        (F.count(F.lit(1)) - F.sum("is1")).cast("bigint").alias("c2"),
    )
    # the grid is bounded by the fixed value range (~5k rows at any SF):
    # the documented bounded-window class
    w = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = grid.select(
        "c1",
        "c2",
        F.sum("c1").over(w).cast("bigint").alias("cum1"),
        F.sum("c2").over(w).cast("bigint").alias("cum2"),
        F.sum("c1").over(wall).cast("bigint").alias("n1"),
        F.sum("c2").over(wall).cast("bigint").alias("n2"),
    )
    terms = cum.selectExpr(
        "n1",
        "n2",
        "(c1 + c2) * ((cum1 * n2 - cum2 * n1) * 1000 DIV (n1 * n2))"
        " * ((cum1 * n2 - cum2 * n1) * 1000 DIV (n1 * n2)) AS t",
    )
    return terms.groupBy("n1", "n2").agg(
        F.sum("t").cast("bigint").alias("t_milli2"),
        (
            F.col("n1").cast("double")
            * F.col("n2").cast("double")
            * F.sum("t").cast("bigint").cast("double")
            / ((F.col("n1") + F.col("n2")) * (F.col("n1") + F.col("n2"))).cast(
                "double"
            )
            / F.lit(1000000.0)
        ).alias("cvm_stat"),
    ).select("n1", "n2", "t_milli2", "cvm_stat")


# ---------------------------------------------------------------------------
# Second-order Markov transitions (P^2 in fixed point)
# ---------------------------------------------------------------------------


@register(
    "markov_2step_transitions",
    "Two-step Markov behavior: P^2[i,k] = sum_j P[i,j]*P[j,k] from the "
    "first-order transition counts (lead over (ts, event_id), same "
    "definition as event_transition_matrix), computed per-term in ppm "
    "fixed point: (n_ij * n_jk * 1e6) DIV (r_i * r_j), summed over the "
    "middle state. After the one fact-table window + count shuffle, "
    "the matrix product is a |states|^3 join over a tiny table (5x5 "
    "here; any realistic event taxonomy keeps this driver-free and "
    "bounded). Headroom: n_ij*n_jk*1e6 < 2^63 holds while row sums "
    "stay under ~3e6 (docstring contract).",
    """
    WITH seq AS (
      SELECT event_type AS f,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS t
      FROM events
    ),
    counts AS (
      SELECT f, t, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE t IS NOT NULL GROUP BY f, t
    ),
    rows_ AS (SELECT f, CAST(SUM(n) AS BIGINT) AS r FROM counts GROUP BY f)
    SELECT a.f AS from_type, b.t AS to_type,
           CAST(SUM(a.n * b.n * 1000000 // (ra.r * rb.r)) AS BIGINT)
             AS p2_ppm
    FROM counts a
    JOIN counts b ON b.f = a.t
    JOIN rows_ ra ON ra.f = a.f
    JOIN rows_ rb ON rb.f = b.f
    GROUP BY a.f, b.t
    """,
)
def q_markov_2step_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("f"), F.lead("event_type").over(w).alias("t")
    ).filter(F.col("t").isNotNull())
    counts = seq.groupBy("f", "t").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rows_ = counts.groupBy("f").agg(F.sum("n").cast("bigint").alias("r"))
    a = counts.alias("a")
    b = counts.alias("b")
    ra = rows_.alias("ra")
    rb = rows_.alias("rb")
    return (
        a.join(b, F.col("b.f") == F.col("a.t"))
        .join(F.broadcast(ra), F.col("ra.f") == F.col("a.f"))
        .join(F.broadcast(rb), F.col("rb.f") == F.col("b.f"))
        .groupBy(F.col("a.f").alias("from_type"), F.col("b.t").alias("to_type"))
        .agg(
            F.expr(
                "CAST(SUM(a.n * b.n * 1000000 DIV (ra.r * rb.r)) AS BIGINT)"
            ).alias("p2_ppm")
        )
    )


# ---------------------------------------------------------------------------
# t-closeness privacy audit (ordered EMD)
# ---------------------------------------------------------------------------


@register(
    "t_closeness_audit",
    "t-closeness audit completing the k-anonymity / l-diversity triad: "
    "per quasi-identifier group (mktsegment x nation), the Earth "
    "Mover's Distance between the group's ordered sensitive-attribute "
    "distribution (order priority, 5 ordinal levels) and the global "
    "one — EMD over an ordered axis is the mean absolute ECDF gap, "
    "exact in integers via the common denominator n_g*N: t_ppm = "
    "sum_i |cum_g_i*N - cum_i*n_g| * 1e6 DIV ((levels-1)*n_g*N). One "
    "fact join + one (group, level) agg; the cumulative window runs "
    "over the BOUNDED (groups x 5) table and the 5-row global "
    "distribution broadcasts. Groups with t > 0.2 are flagged "
    "(skewness attack risk).",
    """
    WITH fact AS (
      SELECT c_mktsegment AS seg, CAST(c_nationkey AS INTEGER) AS nat,
             o_orderpriority AS pr
      FROM customer JOIN orders ON o_custkey = c_custkey
    ),
    gl AS (
      SELECT pr, CAST(COUNT(*) AS BIGINT) AS n FROM fact GROUP BY pr
    ),
    glc AS (
      SELECT pr,
             CAST(SUM(n) OVER (ORDER BY pr ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS BIGINT) AS cumg,
             CAST(SUM(n) OVER () AS BIGINT) AS ntot
      FROM gl
    ),
    grp AS (
      SELECT seg, nat, pr, CAST(COUNT(*) AS BIGINT) AS n
      FROM fact GROUP BY seg, nat, pr
    ),
    grpc AS (
      SELECT seg, nat, pr,
             CAST(SUM(n) OVER (PARTITION BY seg, nat ORDER BY pr
                               ROWS BETWEEN UNBOUNDED PRECEDING AND
                               CURRENT ROW) AS BIGINT) AS cum,
             CAST(SUM(n) OVER (PARTITION BY seg, nat) AS BIGINT) AS ng
      FROM grp
    )
    SELECT g.seg AS c_mktsegment, g.nat AS c_nationkey,
           CAST(MAX(g.ng) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN g.pr < '5' THEN
                    abs(g.cum * c.ntot - c.cumg * g.ng) ELSE 0 END)
                * 1000000 // (4 * MAX(g.ng) * MAX(c.ntot)) AS BIGINT)
             AS t_ppm,
           SUM(CASE WHEN g.pr < '5' THEN
               abs(g.cum * c.ntot - c.cumg * g.ng) ELSE 0 END)
             * 1000000 // (4 * MAX(g.ng) * MAX(c.ntot)) > 200000 AS at_risk
    FROM grpc g JOIN glc c ON c.pr = g.pr
    GROUP BY g.seg, g.nat
    """,
)
def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    fact = c.join(o, c.c_custkey == o.o_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").cast("int").alias("nat"),
        F.col("o_orderpriority").alias("pr"),
    )
    gl = fact.groupBy("pr").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wg = Window.orderBy("pr").rowsBetween(Window.unboundedPreceding, 0)
    glc = gl.select(
        "pr",
        F.sum("n").over(wg).cast("bigint").alias("cumg"),
        F.sum("n").over(Window.partitionBy()).cast("bigint").alias("ntot"),
    )
    grp = fact.groupBy("seg", "nat", "pr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wgrp = (
        Window.partitionBy("seg", "nat")
        .orderBy("pr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grpc = grp.select(
        "seg",
        "nat",
        "pr",
        F.sum("n").over(wgrp).cast("bigint").alias("cum"),
        F.sum("n").over(Window.partitionBy("seg", "nat")).cast("bigint").alias("ng"),
    )
    joined = grpc.join(F.broadcast(glc), "pr")
    gap = F.when(
        F.col("pr") < "5", F.abs(F.col("cum") * F.col("ntot") - F.col("cumg") * F.col("ng"))
    ).otherwise(F.lit(0))
    agg = joined.groupBy(
        F.col("seg").alias("c_mktsegment"), F.col("nat").alias("c_nationkey")
    ).agg(
        F.max("ng").cast("bigint").alias("n_rows"),
        F.sum(gap).alias("gapsum"),
        F.max("ntot").alias("ntot"),
    )
    return agg.selectExpr(
        "c_mktsegment",
        "c_nationkey",
        "n_rows",
        "CAST(gapsum * 1000000 DIV (4 * n_rows * ntot) AS BIGINT) AS t_ppm",
        "gapsum * 1000000 DIV (4 * n_rows * ntot) > 200000 AS at_risk",
    )


# ---------------------------------------------------------------------------
# RFM quintile segmentation (exact NTILE via two-phase rank)
# ---------------------------------------------------------------------------


@register(
    "rfm_segments",
    "RFM customer segmentation: recency (days since last order, vs the "
    "global max order day), frequency (order count), monetary (decimal "
    "revenue sum) — each cut into exact NTILE(5) quintiles WITHOUT a "
    "single-partition global sort: three two_phase_rank passes "
    "(operators/ranking.py; coarse buckets on day/count/price bands, "
    "custkey tiebreak) + the NTILE-identical equidepth_bucket. Output "
    "is the bounded 5x5x5 segment-size table with per-segment revenue. "
    "The global max-day scalar is a broadcast one-row frame.",
    """
    WITH cust AS (
      SELECT o_custkey AS ck,
             CAST(max(epoch_us(date_trunc('day', o_orderdate)))
                  // 86400000000 AS BIGINT) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS money
      FROM orders GROUP BY o_custkey
    ),
    mx AS (SELECT CAST(MAX(last_day) AS BIGINT) AS max_day FROM cust),
    rfm AS (
      SELECT ck, CAST(max_day - last_day AS BIGINT) AS rec, freq, money,
             NTILE(5) OVER (ORDER BY max_day - last_day, ck) AS r_q,
             NTILE(5) OVER (ORDER BY freq, ck) AS f_q,
             NTILE(5) OVER (ORDER BY money, ck) AS m_q
      FROM cust CROSS JOIN mx
    )
    SELECT r_q, f_q, m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(money AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue
    FROM rfm GROUP BY r_q, f_q, m_q
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.expr(
            "CAST(max(unix_micros(date_trunc('day', o_orderdate)))"
            " DIV 86400000000 AS BIGINT)"
        ).alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
            "money"
        ),
    )
    mx = cust.agg(F.max("last_day").cast("bigint").alias("max_day"))
    base = cust.crossJoin(F.broadcast(mx)).withColumn(
        "rec", (F.col("max_day") - F.col("last_day")).cast("bigint")
    )
    # r11: the three ranks are independent columns over the SAME frame —
    # two_phase_multi_rank attaches all three coarse buckets up front and
    # checkpoints ONCE (three chained two_phase_rank calls serialized
    # three materialization jobs + three collects; same offsets, same
    # ranks, one barrier).
    ranked, n = two_phase_multi_rank(
        base,
        [
            (["rec", "ck"], F.expr("rec DIV 30"), "r_rank"),
            (["freq", "ck"], F.expr("freq DIV 4"), "f_rank"),
            (
                ["money", "ck"],
                F.expr("CAST(floor(money) AS BIGINT) DIV 100000"),
                "m_rank",
            ),
        ],
    )
    seg = ranked.select(
        equidepth_bucket(F.col("r_rank"), n, 5).alias("r_q"),
        equidepth_bucket(F.col("f_rank"), n, 5).alias("f_q"),
        equidepth_bucket(F.col("m_rank"), n, 5).alias("m_q"),
        "money",
    )
    return seg.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.col("money").cast("decimal(18,2)")).cast("double").alias(
            "segment_revenue"
        ),
    )


# ---------------------------------------------------------------------------
# Cohort LTV curves
# ---------------------------------------------------------------------------


@register(
    "cohort_ltv_curve",
    "Cumulative lifetime-value curve per monthly acquisition cohort: "
    "cohort = month of first order, age = months since cohort, LTV = "
    "running per-customer cumulative revenue. Two fact shuffles "
    "(first-order per customer, then (cohort, age) revenue) and one "
    "window over the BOUNDED cohort x age table; revenue accumulates "
    "in DECIMAL with ONE cast to double per output cell (rule 1), and "
    "ltv_per_customer is one IEEE division. The retention companion "
    "is cohort_retention_weekly.",
    """
    WITH firsts AS (
      SELECT o_custkey AS ck,
             CAST(MIN(year(o_orderdate) * 12 + month(o_orderdate))
                  AS BIGINT) AS cohort_ym
      FROM orders GROUP BY o_custkey
    ),
    facts AS (
      SELECT f.cohort_ym,
             CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                  - f.cohort_ym AS BIGINT) AS age,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
      FROM orders o JOIN firsts f ON f.ck = o.o_custkey
    ),
    sizes AS (
      SELECT cohort_ym, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY cohort_ym
    ),
    curve AS (
      SELECT cohort_ym, age, SUM(rev) AS rev_m
      FROM facts GROUP BY cohort_ym, age
    )
    SELECT c.cohort_ym, c.age, s.cohort_size,
           CAST(c.rev_m AS DOUBLE) AS month_revenue,
           CAST(SUM(c.rev_m) OVER (PARTITION BY c.cohort_ym ORDER BY c.age
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_revenue,
           CAST(SUM(c.rev_m) OVER (PARTITION BY c.cohort_ym ORDER BY c.age
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
             AS ltv_per_customer
    FROM curve c JOIN sizes s ON s.cohort_ym = c.cohort_ym
    """,
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    firsts = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.min(ym).cast("bigint").alias("cohort_ym")
    )
    facts = o.join(firsts, o.o_custkey == firsts.ck).select(
        "cohort_ym",
        (ym.cast("bigint") - F.col("cohort_ym")).alias("age"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    sizes = firsts.groupBy("cohort_ym").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    curve = facts.groupBy("cohort_ym", "age").agg(F.sum("rev").alias("rev_m"))
    # cohort x age table is bounded by the calendar span squared, not rows
    w = (
        Window.partitionBy("cohort_ym")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        curve.join(F.broadcast(sizes), "cohort_ym")
        .select(
            "cohort_ym",
            "age",
            "cohort_size",
            F.col("rev_m").cast("double").alias("month_revenue"),
            F.sum("rev_m").over(w).cast("double").alias("cum_revenue"),
            (
                F.sum("rev_m").over(w).cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("ltv_per_customer"),
        )
    )


# ---------------------------------------------------------------------------
# Time-decay multi-touch attribution
# ---------------------------------------------------------------------------


@register(
    "attribution_time_decay",
    "Time-decay multi-touch attribution, libm-free: every touch within "
    "30 minutes before the user's NEXT purchase earns credit "
    "1e6 DIV (1 + minutes_before) — reciprocal decay instead of the "
    "classic exponential half-life (no exp; same monotone shape, "
    "exact integers). The next-purchase timestamp comes from ONE "
    "forward-looking min window over (user, ts) — no purchase-to-"
    "touch range join, no fan-out; then one bounded per-type rollup. "
    "Companion to attribution_linear_session (equal-credit variant).",
    """
    WITH seq AS (
      SELECT event_type, user_id,
             epoch_us(ts) AS ts_us,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_p_us
      FROM events
    ),
    touches AS (
      SELECT event_type,
             CAST((next_p_us - ts_us) // 60000000 AS BIGINT) AS mins
      FROM seq
      WHERE event_type <> 'purchase' AND next_p_us IS NOT NULL
        AND (next_p_us - ts_us) // 60000000 <= 30
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(1000000 // (1 + mins)) AS BIGINT) AS credit_ppm
    FROM touches
    GROUP BY event_type
    """,
)
def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    seq = ev.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).over(w).alias("next_p_us"),
    )
    touches = seq.filter(
        (F.col("event_type") != "purchase") & F.col("next_p_us").isNotNull()
    ).select(
        "event_type",
        F.expr("CAST((next_p_us - ts_us) DIV 60000000 AS BIGINT)").alias("mins"),
    ).filter(F.col("mins") <= 30)
    return touches.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.expr("CAST(SUM(1000000 DIV (1 + mins)) AS BIGINT)").alias("credit_ppm"),
    )


# ---------------------------------------------------------------------------
# Nearest-centroid classification accuracy (quantized, exact)
# ---------------------------------------------------------------------------


@register(
    "nearest_centroid_accuracy",
    "Nearest-centroid classification accuracy over the embedding "
    "corpus: per-label centroids in twice-quantized integer space "
    "(coordinate sums exact; centroid component = (sum*1000) DIV n), "
    "every vector scored against every centroid by exact integer "
    "squared distance, argmin via the collision-free encode "
    "score*100 + label (score < 4e15, labels < 100 — rule 23's "
    "composite-argmax workaround). Scoring explodes (row, dim, label): "
    "fan-out is dims x |labels| per row — bounded by the model size, "
    "the same budget a real nearest-centroid scorer spends; the "
    "centroid table broadcasts. Output: per-true-label accuracy.",
    """
    WITH q AS (
      SELECT vec_id, label, d,
             CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS qx
      FROM (SELECT vec_id, label, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS d
            FROM embeddings)
    ),
    cent AS (
      SELECT label AS clabel, d,
             CAST(SUM(qx) * 1000 // COUNT(*) AS BIGINT) AS cq
      FROM q GROUP BY label, d
    ),
    scores AS (
      SELECT q.vec_id, q.label, c.clabel,
             CAST(SUM((q.qx * 1000 - c.cq) * (q.qx * 1000 - c.cq))
                  AS BIGINT) AS dist2
      FROM q JOIN cent c ON c.d = q.d
      GROUP BY q.vec_id, q.label, c.clabel
    ),
    preds AS (
      SELECT vec_id, label,
             CAST(MIN(dist2 * 100 + clabel) % 100 AS BIGINT) AS pred
      FROM scores GROUP BY vec_id, label
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS acc_ppm
    FROM preds GROUP BY label
    """,
)
def q_nearest_centroid_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale caveat (round-10 sf100 audit): the docstring's "bounded by
    the model size" holds only while the model IS bounded. Under the
    synthetic scale-up the label count grows with the corpus (by
    design — a 10x corpus has more clusters), so scoring work is
    n_vecs x n_labels x dims = 1.28e8 / 1.28e10 / 1.28e12 rows at
    sf1/10/100: inherently QUADRATIC across decades for any exact
    plan. The measured 0.96x/R over decade 2 was an illusion —
    sf1 ran overhead-dominated (~1e8 rows/s) while sf10 ran at
    throughput (~1e9 rows/s), masking the x100 work growth; at sf100
    the x100 bites for real and the exploded aggregate's shuffle
    (~6e8 partial groups/task) also exceeds single-box disk. The
    production posture at 100 TB is a CAPPED/compressed model (fixed
    label set -> work linear in n_vecs again) or an exact-pruned
    scorer (Elkan bounds); the registry keeps the all-pairs semantics
    because that is what the oracle specifies. See docs/SCALING.md
    round-10 third-decade table."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("d0", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("d0") + 1).alias("d"),
        # float->double before scaling (similarity.quantize's rule)
        F.round(F.col("x").cast("double") * 1000).cast("bigint").alias("qx"),
    )
    cent = q.groupBy(F.col("label").alias("clabel"), "d").agg(
        F.expr("CAST(SUM(qx) * 1000 DIV COUNT(*) AS BIGINT)").alias("cq")
    )
    scores = (
        q.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(
                (F.col("qx") * 1000 - F.col("cq"))
                * (F.col("qx") * 1000 - F.col("cq"))
            )
            .cast("bigint")
            .alias("dist2")
        )
    )
    preds = scores.groupBy("vec_id", "label").agg(
        (F.min(F.col("dist2") * 100 + F.col("clabel")) % 100)
        .cast("bigint")
        .alias("pred")
    )
    return preds.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(F.when(F.col("pred") == F.col("label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.expr(
            "CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("acc_ppm"),
    )


# ---------------------------------------------------------------------------
# Systematic every-k-th sampling on the exact global rank
# ---------------------------------------------------------------------------


@register(
    "systematic_sample_every_k",
    "Systematic (every-97th) sample of orders in (orderdate, orderkey) "
    "order — the stratified-in-time design survey methodology wants, "
    "exact at any scale because the global rank comes from "
    "two_phase_rank (day-band coarse buckets, no single-partition "
    "sort, bounded driver offsets). Report: kept count, kept vs total "
    "revenue (decimal sums, one double cast each) and the sampling "
    "fraction as one IEEE division. A deterministic complement to the "
    "hash (Bernoulli) and stratified samplers in operators/sampling.",
    """
    WITH ranked AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rk
      FROM orders
    )
    SELECT CAST(COUNT(CASE WHEN rk % 97 = 1 THEN 1 END) AS BIGINT)
             AS n_kept,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN rk % 97 = 1
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
             AS revenue_kept,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue_total,
           CAST(COUNT(CASE WHEN rk % 97 = 1 THEN 1 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS kept_fraction
    FROM ranked
    """,
)
def q_systematic_sample_every_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ranked, _n = two_phase_rank(
        o.select("o_orderdate", "o_orderkey", "o_totalprice"),
        order_by=["o_orderdate", "o_orderkey"],
        coarse=F.expr(
            "CAST(unix_micros(date_trunc('day', o_orderdate))"
            " DIV 86400000000 AS BIGINT) DIV 30"
        ),
        rank_name="rk",
    )
    kept = F.when(F.col("rk") % 97 == 1, 1)
    return ranked.agg(
        F.count(kept).cast("bigint").alias("n_kept"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(
            F.when(F.col("rk") % 97 == 1, F.col("o_totalprice").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue_kept"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue_total"),
        (
            F.count(kept).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("kept_fraction"),
    )
