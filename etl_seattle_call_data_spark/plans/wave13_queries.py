"""Thirteenth-wave coverage: grouped OLS trend with R², shipping-SLA
quantile report, language-ID confusion matrix (heuristic vs labels),
cosine-vs-dot ranking disagreement, k-threshold suppression release,
and Neyman sampling allocation.

docs/CROSS_ENGINE.md rules apply: discrete percentiles (rule 7
caveat), the quotient+remainder split past 2^53, floor-quantize
before any cross-row double summation, deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.plans.docs_queries import _DUCK_COS, _DUCK_Q
from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.plans.wave10_queries import (
    _SPLIT_DUCK,
    _SPLIT_SPARK,
    _split_double,
)
from etl_seattle_call_data_spark.sources.registry import load_table


# ---------------------------------------------------------------------------
# Grouped OLS trend with R²
# ---------------------------------------------------------------------------


@register(
    "revenue_trend_by_nation",
    "Per-nation OLS revenue trend: slope (dollars/day) and R² of "
    "daily revenue cents against the epoch-day index — the "
    "least-squares companion to the Theil-Sen robust trend, grouped. "
    "Daily rollup first (the only fact shuffle), then 25 groups of "
    "exact BIGINT moments; x*y products accumulate in DECIMAL(38,0)/"
    "HUGEINT (day index ~1.1e4, day cents can reach 1e9+ at scale) "
    "and the n*Sxy - Sx*Sy combinations reach DOUBLE via the "
    "quotient+remainder split before the slope/R² expression trees. "
    "Zero-variance groups emit 0.0.",
    f"""
    WITH daily AS (
      SELECT n.n_name AS nation,
             epoch_us(o.o_orderdate) // 86400000000 AS x,
             SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, epoch_us(o.o_orderdate) // 86400000000
    ),
    mom AS (
      SELECT nation, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM daily GROUP BY nation
    ),
    c AS (
      SELECT nation, n,
             n * sxy - sx * sy AS covnum,
             n * sxx - sx * sx AS vxnum,
             n * syy - sy * sy AS vynum
      FROM mom
    ),
    s AS (
      SELECT nation, n,
             {_split_double('covnum').format(**_SPLIT_DUCK)} AS covd,
             {_split_double('vxnum').format(**_SPLIT_DUCK)} AS vxd,
             {_split_double('vynum').format(**_SPLIT_DUCK)} AS vyd
      FROM c
    )
    SELECT nation,
           CAST(n AS BIGINT) AS n_days,
           CASE WHEN vxd = 0.0 THEN 0.0 ELSE covd / vxd / 100.0 END
             AS slope_dollars_per_day,
           CASE WHEN vxd = 0.0 OR vyd = 0.0 THEN 0.0
                ELSE covd * covd / (vxd * vyd) END AS r2
    FROM s
    """,
)
def q_revenue_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    daily = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.expr("unix_micros(o_orderdate) DIV 86400000000").alias("x"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("y"))
    )
    mom = daily.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum((F.col("y").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)"))).alias(
            "syy"
        ),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    c = mom.select(
        "nation",
        "n",
        (dec(F.col("n")) * dec(F.col("sxy")) - dec(F.col("sx")) * dec(F.col("sy"))).alias(
            "covnum"
        ),
        (dec(F.col("n")) * dec(F.col("sxx")) - dec(F.col("sx")) * dec(F.col("sx"))).alias(
            "vxnum"
        ),
        (dec(F.col("n")) * F.col("syy") - dec(F.col("sy")) * dec(F.col("sy"))).alias(
            "vynum"
        ),
    )
    s = c.select(
        "nation",
        "n",
        F.expr(_split_double("covnum").format(**_SPLIT_SPARK)).alias("covd"),
        F.expr(_split_double("vxnum").format(**_SPLIT_SPARK)).alias("vxd"),
        F.expr(_split_double("vynum").format(**_SPLIT_SPARK)).alias("vyd"),
    )
    return s.select(
        "nation",
        F.col("n").cast("bigint").alias("n_days"),
        F.when(F.col("vxd") == 0.0, F.lit(0.0))
        .otherwise(F.col("covd") / F.col("vxd") / 100.0)
        .alias("slope_dollars_per_day"),
        F.when((F.col("vxd") == 0.0) | (F.col("vyd") == 0.0), F.lit(0.0))
        .otherwise(F.col("covd") * F.col("covd") / (F.col("vxd") * F.col("vyd")))
        .alias("r2"),
    )


# ---------------------------------------------------------------------------
# Shipping-SLA quantile report
# ---------------------------------------------------------------------------


@register(
    "shipping_sla_report",
    "Order-to-ship SLA report per order priority: p50/p90 of the "
    "ship lag in whole days (discrete percentiles — order statistics, "
    "rule 7's interpolation-proof form) plus the count and rate of "
    "90-day violations — the operations dashboard row behind every "
    "fulfillment review. Lag is an exact epoch-day difference "
    "(integer; rule 11 — no fractional-second doubles). One fact-"
    "order join (AQE-sized) and one 5-row aggregate.",
    """
    WITH lag AS (
      SELECT o.o_orderpriority AS priority,
             epoch_us(l.l_shipdate) // 86400000000
               - epoch_us(o.o_orderdate) // 86400000000 AS lag_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(quantile_disc(lag_days, 0.5) AS BIGINT) AS p50_days,
           CAST(quantile_disc(lag_days, 0.9) AS BIGINT) AS p90_days,
           CAST(SUM(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           CAST(SUM(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS violation_ppm
    FROM lag
    GROUP BY priority
    """,
)
def q_shipping_sla_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lag = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        (
            F.expr("unix_micros(l_shipdate) DIV 86400000000")
            - F.expr("unix_micros(o_orderdate) DIV 86400000000")
        ).alias("lag_days"),
    )
    return lag.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_days) AS BIGINT)").alias(
            "p50_days"
        ),
        F.expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lag_days) AS BIGINT)").alias(
            "p90_days"
        ),
        F.sum(F.when(F.col("lag_days") > 90, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violations"),
        F.expr(
            "CAST(SUM(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("violation_ppm"),
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix
# ---------------------------------------------------------------------------


@register(
    "language_id_confusion",
    "Confusion matrix of the heuristic language-ID against the "
    "corpus's labeled lang column — upgrading the classifier from "
    "'here are its predictions' to a measured per-language precision "
    "surface (the eval-harness discipline: approximation loss as "
    "numbers, not vibes). Joins the shared language_id operator "
    "output to the labels it never saw, emits the (true, predicted) "
    "census with per-TRUE-language recall in ppm via a window over "
    "the bounded matrix. One scan + one bounded aggregate.",
    """
    WITH hits AS (
      SELECT doc_id, lang,
             len(list_filter(tk, x -> x IN ('the','a','of','and','is'))) AS c_en,
             len(list_filter(tk, x -> x IN ('le','la','et','les','une'))) AS c_fr,
             len(list_filter(tk, x -> x IN ('el','los','y','que','una'))) AS c_es,
             len(list_filter(tk, x -> x IN ('der','die','und','das','ein'))) AS c_de,
             len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS c_cjk
      FROM (SELECT doc_id, lang, text,
                   list_filter(string_split(text, ' '), x -> x <> '') AS tk
            FROM documents)
    ),
    preds AS (
      SELECT lang AS true_lang,
             CASE
               WHEN c_cjk > 0 THEN 'zh'
               WHEN c_en = greatest(c_en, c_fr, c_es, c_de) AND c_en > 0 THEN 'en'
               WHEN c_fr = greatest(c_en, c_fr, c_es, c_de) AND c_fr > 0 THEN 'fr'
               WHEN c_es = greatest(c_en, c_fr, c_es, c_de) AND c_es > 0 THEN 'es'
               WHEN c_de = greatest(c_en, c_fr, c_es, c_de) AND c_de > 0 THEN 'de'
               ELSE 'unknown' END AS pred_lang
      FROM hits
    ),
    cm AS (
      SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM preds GROUP BY true_lang, pred_lang
    )
    SELECT true_lang, pred_lang, n_docs,
           CAST(n_docs * 1000000
                // SUM(n_docs) OVER (PARTITION BY true_lang) AS BIGINT)
             AS share_of_true_ppm,
           true_lang = pred_lang AS is_correct
    FROM cm
    """,
)
def q_language_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.operators import text

    docs = load_table(spark, sf_dir, "documents")
    preds = text.language_id(docs).select("doc_id", "pred_lang")
    cm = (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(preds, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    return cm.select(
        "true_lang",
        "pred_lang",
        "n_docs",
        F.expr(
            "CAST(n_docs * 1000000 DIV SUM(n_docs)"
            " OVER (PARTITION BY true_lang) AS BIGINT)"
        ).alias("share_of_true_ppm"),
        (F.col("true_lang") == F.col("pred_lang")).alias("is_correct"),
    )


# ---------------------------------------------------------------------------
# Cosine-vs-dot ranking disagreement
# ---------------------------------------------------------------------------


@register(
    "similarity_metric_disagreement",
    "Metric-choice eval for retrieval: per query, how much the top-5 "
    "by COSINE differs from the top-5 by raw (un-normalized) DOT "
    "product over the same quantized vectors — overlap count, "
    "Jaccard of the two sets in ppm, and an identical-sets flag. "
    "Norm variance in the corpus makes the two rankings diverge; "
    "this measures whether normalization actually matters on YOUR "
    "data before you pay for it at serving time. Dot ranks are pure "
    "exact integers; both arms broadcast the 10-query side.",
    f"""
    WITH w AS ({_DUCK_Q}),
    cosr AS (
      SELECT query_id, neighbor_id FROM (
        SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY b.vec_id
                                  ORDER BY {_DUCK_COS} DESC, a.vec_id) AS rank
        FROM w a JOIN w b ON b.vec_id < 10 AND a.vec_id <> b.vec_id
      ) WHERE rank <= 5
    ),
    dotr AS (
      SELECT query_id, neighbor_id FROM (
        SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY list_sum(list_transform(range(1, len(a.qv) + 1),
                                                 i -> a.qv[i] * b.qv[i])) DESC,
                          a.vec_id) AS rank
        FROM w a JOIN w b ON b.vec_id < 10 AND a.vec_id <> b.vec_id
      ) WHERE rank <= 5
    ),
    ov AS (
      SELECT c.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
      FROM cosr c JOIN dotr d
        ON d.query_id = c.query_id AND d.neighbor_id = c.neighbor_id
      GROUP BY c.query_id
    ),
    qids AS (SELECT DISTINCT query_id FROM cosr)
    SELECT q.query_id,
           CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(COALESCE(o.n_overlap, 0) * 1000000
                // (10 - COALESCE(o.n_overlap, 0)) AS BIGINT) AS jaccard_ppm,
           COALESCE(o.n_overlap, 0) = 5 AS identical_sets
    FROM qids q LEFT JOIN ov o ON o.query_id = q.query_id
    """,
)
def q_similarity_metric_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.operators import similarity
    from etl_seattle_call_data_spark.operators.similarity import _dot, with_quantized

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") < 10)
    cosr = similarity.cosine_topk(emb, qset, k=5).select("query_id", "neighbor_id")
    c = with_quantized(emb).select(
        F.col("vec_id").alias("neighbor_id"), F.col("qvec").alias("vc")
    )
    qq = with_quantized(qset).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("vq")
    )
    scored = (
        c.crossJoin(F.broadcast(qq))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _dot(F.col("vq"), F.col("vc"), None).alias("dot"))
    )
    wd = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    dotr = (
        scored.withColumn("rank", F.row_number().over(wd))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id")
    )
    ov = (
        cosr.join(dotr, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    qids = cosr.select("query_id").distinct()
    return qids.join(ov, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias("n_overlap"),
        F.expr(
            "CAST(COALESCE(n_overlap, 0) * 1000000"
            " DIV (10 - COALESCE(n_overlap, 0)) AS BIGINT)"
        ).alias("jaccard_ppm"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) == 5).alias("identical_sets"),
    )


# ---------------------------------------------------------------------------
# k-threshold suppression release
# ---------------------------------------------------------------------------


@register(
    "k_threshold_suppression_release",
    "Privacy-preserving release with k-threshold suppression: the "
    "(market segment, nation) customer census is published only for "
    "cells of size >= 20; smaller cells collapse into one OTHER row "
    "(count preserved, identity suppressed) — the enforcement "
    "mechanism the k-anonymity AUDIT family measures, completing "
    "audit -> release. The OTHER row is always emitted (zero when "
    "nothing suppresses) so the release schema is stable across "
    "scale factors — the emptiness-at-small-SF trap made structural. "
    "One groupBy + a bounded conditional aggregate.",
    """
    WITH cells AS (
      SELECT c.c_mktsegment AS seg, n.n_name AS nation,
             CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY c.c_mktsegment, n.n_name
    ),
    released AS (
      SELECT seg, nation, n_customers FROM cells WHERE n_customers >= 20
    ),
    suppressed AS (
      SELECT 'OTHER' AS seg, 'OTHER' AS nation,
             CAST(COALESCE(SUM(CASE WHEN n_customers < 20
                                    THEN n_customers END), 0) AS BIGINT)
               AS n_customers
      FROM cells
    )
    SELECT seg, nation, n_customers FROM released
    UNION ALL
    SELECT seg, nation, n_customers FROM suppressed
    """,
)
def q_k_threshold_suppression_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cells = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )
    released = cells.filter(F.col("n_customers") >= 20)
    suppressed = cells.agg(
        F.coalesce(
            F.sum(F.when(F.col("n_customers") < 20, F.col("n_customers"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_customers")
    ).select(F.lit("OTHER").alias("seg"), F.lit("OTHER").alias("nation"), "n_customers")
    return released.unionByName(suppressed)


# ---------------------------------------------------------------------------
# Neyman sampling allocation
# ---------------------------------------------------------------------------


@register(
    "neyman_allocation_plan",
    "Neyman-optimal stratified sampling allocation: each event-type "
    "stratum's share of a 10k-row sample budget proportional to "
    "N_h * sd_h — the survey-design step BEFORE the stratified "
    "samplers this engine already ships. Stratum sd comes from exact "
    "integer cent moments (one fixed IEEE tree incl. the exact "
    "sqrt); the weight is then floor-quantized to an integer "
    "(rule 5) BEFORE summing across strata, so no cross-row double "
    "summation ever happens (rule 1) and shares/allocations are pure "
    "integer DIV. One fact scan, 5-row state.",
    """
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(round(value * 100) AS BIGINT)) AS sx,
             SUM(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT)) AS sxx
      FROM events GROUP BY event_type
    ),
    v AS (
      SELECT event_type, n, n * sxx - sx * sx AS varnum FROM s
    ),
    w AS (
      SELECT event_type, n,
             CAST(floor(CAST(n AS DOUBLE)
                        * sqrt((CAST(varnum // 67108864 AS DOUBLE) * 67108864.0 + CAST(varnum % 67108864 AS DOUBLE))
                               / NULLIF(CAST(n AS DOUBLE)
                                        * CAST(n - 1 AS DOUBLE), 0)))
                  AS BIGINT) AS weight
      FROM v
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_rows,
           weight,
           CAST(weight * 1000000 // NULLIF(SUM(weight) OVER (), 0) AS BIGINT)
             AS share_ppm,
           CAST(weight * 10000 // NULLIF(SUM(weight) OVER (), 0) AS BIGINT)
             AS alloc_10k
    FROM w
    """,
)
def q_neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("sx"),
        F.sum((cents * cents).cast("decimal(38,0)")).alias("sxx"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    v = s.select(
        "event_type",
        "n",
        (dec(F.col("n")) * dec(F.col("sxx")) - dec(F.col("sx")) * dec(F.col("sx"))).alias(
            "varnum"
        ),
    )
    w = v.select(
        "event_type",
        "n",
        F.floor(
            F.col("n").cast("double")
            # NULLIF guard (rule 40): a 1-row stratum zeroes n*(n-1)
            * F.sqrt(
                F.expr(_split_double("varnum").format(**_SPLIT_SPARK))
                / F.nullif(
                    F.col("n").cast("double") * (F.col("n") - 1).cast("double"),
                    F.lit(0.0),
                )
            )
        )
        .cast("bigint")
        .alias("weight"),
    )
    return w.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_rows"),
        "weight",
        F.expr(
            "CAST(weight * 1000000 DIV NULLIF(SUM(weight) OVER (), 0)"
            " AS BIGINT)"
        ).alias("share_ppm"),
        F.expr(
            "CAST(weight * 10000 DIV NULLIF(SUM(weight) OVER (), 0) AS BIGINT)"
        ).alias("alloc_10k"),
    )
