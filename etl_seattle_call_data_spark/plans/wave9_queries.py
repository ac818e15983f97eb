"""Ninth-wave coverage: estimator-quality and robustness evidence —
winsorized robust means, inverse-propensity-weighted sample estimates
with measured error, per-node local clustering coefficients, a
partial-aggregation mergeability proof (the map-side-combine
correctness argument as a query), and inter-arrival burstiness.

Cross-engine rules from docs/CROSS_ENGINE.md apply: exact interpolated
percentiles (rule 7) for winsorization bounds, integer/DECIMAL
accumulation with bounded magnitudes stated per query, `DIV` fixed
point for ratios, deterministic tie-breaks on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.operators.sampling import hash_bucket
from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table


# ---------------------------------------------------------------------------
# Winsorized robust means
# ---------------------------------------------------------------------------


@register(
    "winsorized_value_stats",
    "Winsorized mean per event type: values clamped to the exact "
    "[p5, p95] DISCRETE percentiles (order statistics, not "
    "interpolation — rule 7's caveat: the interpolated form diverges "
    "1 ulp at scale when the quantile lands between two EQUAL "
    "neighbors, because DuckDB evaluates a*(1-f)+b*f where Spark "
    "evaluates a+(b-a)*f; quantile_disc returns an actual data value "
    "on both engines), then quantized to integer micros (round-half-"
    "away is engine-identical for positive doubles, rule 5 note) and "
    "averaged exactly — the robust-mean companion to the MAD anomaly "
    "screen. Two fact passes (percentile agg, clamp+sum) with the "
    "5-row bounds table broadcast between them; SUM(micros) < 2^53 "
    "through ~1e7 rows/type (docstring contract), so the final mean "
    "is one exact division.",
    """
    WITH bounds AS (
      SELECT event_type,
             quantile_disc(value, 0.05) AS p5,
             quantile_disc(value, 0.95) AS p95
      FROM events GROUP BY event_type
    ),
    clamped AS (
      SELECT e.event_type, e.value, b.p5, b.p95,
             CAST(round(LEAST(GREATEST(e.value, b.p5), b.p95) * 1000000)
                  AS BIGINT) AS qv
      FROM events e JOIN bounds b ON b.event_type = e.event_type
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(p5) AS DOUBLE) AS p5,
           CAST(MAX(p95) AS DOUBLE) AS p95,
           CAST(SUM(qv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0
             AS winsorized_mean,
           CAST(SUM(CASE WHEN value < p5 OR value > p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped
    FROM clamped
    GROUP BY event_type
    """,
)
def q_winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").alias("p5"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
    )
    clamped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        "p5",
        "p95",
        F.round(F.least(F.greatest(F.col("value"), F.col("p5")), F.col("p95")) * 1000000)
        .cast("bigint")
        .alias("qv"),
    )
    return clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("p5").cast("double").alias("p5"),
        F.max("p95").cast("double").alias("p95"),
        (
            F.sum("qv").cast("double") / F.count(F.lit(1)).cast("double") / F.lit(1000000.0)
        ).alias("winsorized_mean"),
        F.sum(
            F.when((F.col("value") < F.col("p5")) | (F.col("value") > F.col("p95")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_clamped"),
    )


# ---------------------------------------------------------------------------
# Inverse-propensity-weighted sample estimate, error measured
# ---------------------------------------------------------------------------


@register(
    "ipw_sample_eval",
    "Inverse-propensity-weighted estimation from a stratified "
    "deterministic sample: each priority stratum keeps a different "
    "hash fraction (50%% urgent, 20%% high, 10%% rest — divisor-exact "
    "rates so the IPW multiplier 100/pct is an INTEGER), the revenue "
    "total is re-estimated as sum(price * mult) in exact DECIMAL, and "
    "the relative error vs the exact total is REPORTED per stratum — "
    "the survey-sampling eval-harness pattern (measured loss, not "
    "assumed). One fact scan computes kept and exact sums together "
    "(conditional aggregates); no second pass, no shuffle beyond the "
    "5-row stratum agg.",
    """
    WITH s AS (
      SELECT o_orderpriority,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             CASE o_orderpriority WHEN '1-URGENT' THEN 50
                  WHEN '2-HIGH' THEN 20 ELSE 10 END AS pct,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
               % 100 AS hb
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN hb < pct THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(price) AS DOUBLE) AS exact_revenue,
           CAST(SUM(CASE WHEN hb < pct THEN price * (100 // pct)
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             AS ipw_estimate,
           abs(CAST(SUM(CASE WHEN hb < pct THEN price * (100 // pct)
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               - CAST(SUM(price) AS DOUBLE))
             / CAST(SUM(price) AS DOUBLE) AS rel_error
    FROM s
    GROUP BY o_orderpriority
    """,
)
def q_ipw_sample_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    s = o.select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 50)
        .when(F.col("o_orderpriority") == "2-HIGH", 20)
        .otherwise(10)
        .alias("pct"),
        hash_bucket(F.col("o_orderkey"), 100).alias("hb"),
    )
    kept_price = F.when(
        F.col("hb") < F.col("pct"),
        F.col("price") * F.expr("CAST(100 DIV pct AS BIGINT)"),
    ).otherwise(F.lit(0).cast("decimal(18,2)"))
    agg = s.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("hb") < F.col("pct"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum("price").cast("double").alias("exact_revenue"),
        F.sum(kept_price).cast("double").alias("ipw_estimate"),
    )
    return agg.withColumn(
        "rel_error",
        F.abs(F.col("ipw_estimate") - F.col("exact_revenue"))
        / F.col("exact_revenue"),
    )


# ---------------------------------------------------------------------------
# Local clustering coefficients for the highest-degree nodes
# ---------------------------------------------------------------------------


@register(
    "local_clustering_top_degree",
    "Per-node local clustering coefficient for the 20 highest-degree "
    "parts of the co-purchase graph (global triangle count + average "
    "coefficient live in triangle_count_copurchase; this is the "
    "node-level diagnostic). Adjacency-array form: neighbor lists "
    "build with one groupBy; for each probe node, triangles(v) = "
    "sum over neighbors u of |N(v) ∩ N(u)| / 2 via array_intersect on "
    "the exploded 20-node probe set — work is bounded by "
    "20 x max_degree array intersections, never all-pairs. cc_ppm = "
    "sum_inter * 1e6 DIV (d*(d-1)) stays exact integer. Tie-break on "
    "part key.",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    edges AS (
      SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs
    ),
    adj AS (
      SELECT u AS node, list(v ORDER BY v) AS nbrs,
             CAST(COUNT(*) AS BIGINT) AS deg
      FROM edges GROUP BY u
    ),
    probes AS (
      SELECT node, nbrs, deg FROM adj
      ORDER BY deg DESC, node LIMIT 20
    ),
    inter AS (
      SELECT p.node, p.deg,
             CAST(SUM(len(list_intersect(p.nbrs, a.nbrs))) AS BIGINT)
               AS sum_inter
      FROM (SELECT node, deg, nbrs, unnest(nbrs) AS nb FROM probes) p
      JOIN adj a ON a.node = p.nb
      GROUP BY p.node, p.deg
    )
    SELECT node AS part_key, deg AS degree,
           CAST(sum_inter // 2 AS BIGINT) AS n_triangles,
           CAST(sum_inter * 1000000 // NULLIF(deg * (deg - 1), 0) AS BIGINT)
             AS clustering_ppm
    FROM inter
    ORDER BY degree DESC, part_key
    """,
)
def q_local_clustering_top_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.plans.shared import memo_copurchase_edges

    # mirrored adjacency straight off the session-shared src-partitioned
    # edge cache: both consumers below (top-degree probes + neighbor
    # probe table) re-derive from it, and the collect_list groupBy needs
    # no Exchange because the cache is already hash-partitioned on src
    edges = memo_copurchase_edges(spark, sf_dir).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    adj = edges.groupBy(F.col("u").alias("node")).agg(
        F.sort_array(F.collect_list("v")).alias("nbrs"),
        F.count(F.lit(1)).cast("bigint").alias("deg"),
    )
    probes = adj.orderBy(F.desc("deg"), "node").limit(20)
    probe_nbrs = probes.select(
        "node", "deg", "nbrs", F.explode("nbrs").alias("nb")
    )
    a2 = adj.select(F.col("node").alias("nb"), F.col("nbrs").alias("nbrs2"))
    inter = (
        probe_nbrs.join(a2, "nb")
        .groupBy("node", "deg")
        .agg(
            F.sum(F.size(F.array_intersect(F.col("nbrs"), F.col("nbrs2"))))
            .cast("bigint")
            .alias("sum_inter")
        )
    )
    return inter.selectExpr(
        "node AS part_key",
        "deg AS degree",
        "CAST(sum_inter DIV 2 AS BIGINT) AS n_triangles",
        # NULLIF guard (rule 40): a degree-1 probe zeroes deg*(deg-1)
        "CAST(sum_inter * 1000000 DIV NULLIF(deg * (deg - 1), 0) AS BIGINT)"
        " AS clustering_ppm",
    ).orderBy(F.desc("degree"), "part_key")


# ---------------------------------------------------------------------------
# Partial-aggregation mergeability proof
# ---------------------------------------------------------------------------


@register(
    "mergeable_moments_proof",
    "Map-side-combine correctness as a query: lineitem splits into two "
    "hash halves, each half computes the exact moment state "
    "(n, sum_cents, sum_cents^2 in DECIMAL(38,0)), the states MERGE by "
    "addition, and the merged result is compared cell-for-cell against "
    "the direct whole-table aggregate — the algebraic property that "
    "makes distributed partial aggregation (and every sketch in this "
    "repo) correct, here verified rather than assumed. Variance emits "
    "via the exact quotient+remainder split (num = n*S2 - S^2 ~ 1e27 "
    "at sf1, far past 2^53; den = n^2 < 2^53). One fact scan per leg.",
    """
    WITH q AS (
      SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
               % 2 AS half,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    halves AS (
      SELECT half, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS s2
      FROM q GROUP BY half
    ),
    merged AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s,
             SUM(s2) AS s2
      FROM halves
    ),
    direct AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS s2
      FROM q
    )
    SELECT m.n AS n_rows, m.s AS sum_cents,
           m.n = d.n AND m.s = d.s AND m.s2 = d.s2 AS merge_matches_direct,
           (CAST(CAST((m.n * m.s2 - CAST(m.s AS HUGEINT) * m.s)
                      // (m.n * m.n) AS BIGINT) AS DOUBLE)
            + CAST(CAST((m.n * m.s2 - CAST(m.s AS HUGEINT) * m.s)
                        % (m.n * m.n) AS BIGINT) AS DOUBLE)
              / CAST(m.n * m.n AS DOUBLE)) / 10000.0 AS variance_dollars2
    FROM merged m CROSS JOIN direct d
    """,
)
def q_mergeable_moments_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        (hash_bucket(F.col("l_orderkey"), 2)).alias("half"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    halves = q.groupBy("half").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)"))
        .alias("s2"),
    )
    merged = halves.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("s"),
        F.sum("s2").alias("s2"),
    )
    direct = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("dn"),
        F.sum("cents").cast("bigint").alias("ds"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)"))
        .alias("ds2"),
    )
    joined = merged.crossJoin(F.broadcast(direct))
    num = "(n * s2 - CAST(s AS DECIMAL(38,0)) * s)"
    return joined.selectExpr(
        "n AS n_rows",
        "s AS sum_cents",
        "n = dn AND s = ds AND s2 = ds2 AS merge_matches_direct",
        f"(CAST(CAST({num} DIV (n * n) AS BIGINT) AS DOUBLE)"
        f" + CAST(CAST({num} % (n * n) AS BIGINT) AS DOUBLE)"
        " / CAST(n * n AS DOUBLE)) / 10000.0 AS variance_dollars2",
    )


# ---------------------------------------------------------------------------
# Inter-arrival burstiness (CV^2 in fixed point)
# ---------------------------------------------------------------------------


@register(
    "event_interarrival_burstiness",
    "Burstiness of event arrivals per type: squared coefficient of "
    "variation of per-user inter-arrival times, CV^2 = n*sum(d^2)/"
    "(sum d)^2 - 1 in ppm — CV^2 of 1e6 is Poisson, above is bursty, "
    "below is regular. Gaps are exact integer millis (rule 11: "
    "epoch-micros difference, floor-divided); squares accumulate in "
    "DECIMAL(38,0)/HUGEINT (d^2 ~ 1e19 overflows int64); the single "
    "ppm ratio is one decimal DIV. Magnitude ceiling stated: "
    "n*sum(d^2)*1e6 < 1e38 holds to ~1e8 gaps. One window pass + one "
    "bounded per-type agg.",
    """
    WITH gaps AS (
      SELECT event_type,
             CAST((epoch_us(ts) - epoch_us(lag(ts) OVER
                   (PARTITION BY user_id, event_type ORDER BY ts, event_id)))
                  // 1000 AS BIGINT) AS d_ms
      FROM events
    ),
    g AS (SELECT event_type, d_ms FROM gaps WHERE d_ms IS NOT NULL),
    agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d_ms) AS BIGINT) AS sd,
             SUM(CAST(d_ms AS HUGEINT) * CAST(d_ms AS HUGEINT)) AS sd2
      FROM g GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(sd // n AS BIGINT) AS mean_gap_ms,
           CAST(CAST(n AS HUGEINT) * sd2 * 1000000
                // (CAST(sd AS HUGEINT) * sd) AS BIGINT) - 1000000
             AS cv2_minus1_ppm
    FROM agg
    """,
)
def q_event_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        F.expr(
            "CAST((unix_micros(ts) - unix_micros(lag(ts) OVER"
            " (PARTITION BY user_id, event_type ORDER BY ts, event_id)))"
            " DIV 1000 AS BIGINT)"
        ).alias("d_ms"),
    ).filter(F.col("d_ms").isNotNull())
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d_ms").cast("bigint").alias("sd"),
        F.sum(F.col("d_ms").cast("decimal(38,0)") * F.col("d_ms").cast("decimal(38,0)"))
        .alias("sd2"),
    )
    return agg.selectExpr(
        "event_type",
        "n",
        "CAST(sd DIV n AS BIGINT) AS mean_gap_ms",
        "CAST(CAST(n AS DECIMAL(38,0)) * sd2 * 1000000"
        " DIV (CAST(sd AS DECIMAL(38,0)) * sd) AS BIGINT) - 1000000"
        " AS cv2_minus1_ppm",
    )
